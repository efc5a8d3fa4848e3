from dqc_tpu.ops import gates, statevector

__all__ = ["gates", "statevector"]
