from dqc_tpu.models.vqe_ising import VQEIsing
from dqc_tpu.models.hardware_efficient import HardwareEfficientAnsatz
from dqc_tpu.models.qaoa import QAOAMaxCut
from dqc_tpu.models.ghz import GHZ
from dqc_tpu.models.qft import QFT

__all__ = ["VQEIsing", "HardwareEfficientAnsatz", "QAOAMaxCut", "GHZ", "QFT"]
