from dqc_tpu.models.vqe_ising import VQEIsing

__all__ = ["VQEIsing"]
