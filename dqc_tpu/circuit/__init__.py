from dqc_tpu.circuit.ir import Tape, Instruction, InstrKind
from dqc_tpu.circuit.builder import AutoGradCircuit
from dqc_tpu.circuit.autograd import run_tape, tape_forward

__all__ = [
    "Tape",
    "Instruction",
    "InstrKind",
    "AutoGradCircuit",
    "run_tape",
    "tape_forward",
]
