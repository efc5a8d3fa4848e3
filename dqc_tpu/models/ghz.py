"""GHZ state preparation (the reference's functional test workload,
reference src/test_ghz.py): Hadamard on qubit 0 + a CNOT chain."""

from __future__ import annotations

import jax
import numpy as np

from dqc_tpu import config
from dqc_tpu.circuit.builder import AutoGradCircuit


class GHZ:
    def __init__(self, qubits_number: int, dtype=None, densities: bool = True):
        self.n = int(qubits_number)
        self.dtype = config.canonicalize_complex(dtype)

        h2 = (np.asarray([[1, 1], [1, -1]]) / np.sqrt(2)).astype(self.dtype)
        cx = np.asarray(
            [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], self.dtype
        )
        self._gates = [h2.reshape(-1)] + (self.n - 1) * [cx.reshape(-1)]

        c = AutoGradCircuit(self.n, dtype=self.dtype)
        c.add_q1_const_gate(0)
        for i in range(self.n - 1):
            c.add_q2_const_gate(i, i + 1)
        if densities:
            for i in range(self.n):
                c.get_q1_dens_op_with_grad(i)
        else:
            c.get_q1_dens_op_with_grad(0)
        self.circuit = c
        self._state_fn = c.build_state_fn()
        _, self._run = c.build()

    def state(self) -> jax.Array:
        """The prepared GHZ statevector."""
        return self._state_fn([], self._gates)

    def densities(self):
        """All requested density matrices (each I/2 for a perfect GHZ)."""
        return self._run([], self._gates)

    def fidelity(self) -> float:
        """|<GHZ|psi>|^2 against the exact GHZ state."""
        psi = np.asarray(self.state())
        amp = (psi[0] + psi[-1]) / np.sqrt(2)
        return float(abs(amp) ** 2)
