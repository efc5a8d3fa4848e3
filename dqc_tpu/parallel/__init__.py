from dqc_tpu.parallel.mesh import make_mesh, AXIS
from dqc_tpu.parallel.layout import plan_distribution, DistProgram
from dqc_tpu.parallel.dcircuit import DistributedCircuit

__all__ = [
    "make_mesh",
    "AXIS",
    "plan_distribution",
    "DistProgram",
    "DistributedCircuit",
]
