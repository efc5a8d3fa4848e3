"""Drop-in compatibility shim for the reference's ``qdc`` package.

Code written against ``LuchnikovI/Differentiable-quantum-circuit-cuda``
(``from qdc import AutoGradCircuit``) runs unchanged on TPU via dqc_tpu.
"""

from dqc_tpu import AutoGradCircuit

__all__ = ["AutoGradCircuit"]
