from dqc_tpu.utils import boundary

__all__ = ["boundary"]
