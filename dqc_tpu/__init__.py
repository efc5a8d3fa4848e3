"""dqc_tpu — a TPU-native differentiable statevector quantum-circuit simulator.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``LuchnikovI/Differentiable-quantum-circuit-cuda`` (reference mounted at
/root/reference), designed TPU-first:

* the state is an immutable ``2^n`` complex array (optionally sharded over a
  ``jax.sharding.Mesh`` with the top-k qubits mapped to devices),
* gates are applied with MXU-friendly batched contractions / Pallas kernels
  with consecutive-gate fusion,
* gradients use the reference's O(1)-memory unitarity-based adjoint
  (uncompute instead of checkpointing), packaged as a ``jax.custom_vjp`` so
  the whole simulator is ``jit``/``grad``/``vmap``-composable — removing the
  reference's no-jit restriction (reference README.md:15).

Public API (superset of the reference's ``qdc`` package):

    >>> from dqc_tpu import AutoGradCircuit
    >>> c = AutoGradCircuit(qubits_number=4)
    >>> c.add_q1_const_gate(0)
    >>> c.get_q1_dens_op_with_grad(0)
    >>> simple_run, autodiff_run = c.build()
"""

from dqc_tpu.circuit.builder import AutoGradCircuit
from dqc_tpu.circuit.ir import Tape, Instruction, InstrKind
from dqc_tpu.ops import gates
from dqc_tpu.ops import statevector
from dqc_tpu import config

__version__ = "0.1.0"

__all__ = [
    "AutoGradCircuit",
    "Tape",
    "Instruction",
    "InstrKind",
    "gates",
    "statevector",
    "config",
]
