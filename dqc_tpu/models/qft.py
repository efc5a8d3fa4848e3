"""Quantum Fourier transform circuit family.

A classic all-to-all-connected workload the reference's gate set expresses
naturally: per target qubit one Hadamard plus a ladder of controlled-phase
gates (all *diagonal*, so arbitrarily long-range CPhases never force dense
cross-group work in the fused engine), then a qubit-reversal SWAP network.
Stress-tests cross-group diagonal tables and the fusion planner at every
distance.
"""

from __future__ import annotations

import jax
import numpy as np

from dqc_tpu import config
from dqc_tpu.circuit.builder import AutoGradCircuit


class QFT:
    def __init__(self, qubits_number: int, dtype=None, swap_network: bool = True):
        self.n = int(qubits_number)
        self.dtype = config.canonicalize_complex(dtype)

        h2 = (np.asarray([[1, 1], [1, -1]]) / np.sqrt(2)).astype(self.dtype)
        swap = np.asarray(
            [[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], self.dtype
        )

        c = AutoGradCircuit(self.n, dtype=self.dtype)
        gates = []
        # standard QFT ladder, msb-down (qubit n-1 treated as the top bit)
        for j in range(self.n - 1, -1, -1):
            c.add_q1_const_gate(j)
            gates.append(h2.reshape(-1))
            for m, k in enumerate(range(j - 1, -1, -1), start=2):
                c.add_q2_const_gate_diag(j, k)   # control order irrelevant: diagonal
                phase = np.exp(2j * np.pi / (1 << m)).astype(self.dtype)
                gates.append(np.asarray([1, 1, 1, phase], self.dtype))
        if swap_network:
            for i in range(self.n // 2):
                c.add_q2_const_gate(i, self.n - 1 - i)
                gates.append(swap.reshape(-1))
        c.get_q1_dens_op_with_grad(0)  # keep the tape non-empty of outputs
        self.circuit = c
        self._gates = gates
        self._state_fn = c.build_state_fn()

    def num_gates(self) -> int:
        return len(self._gates)

    def apply_to_basis_state(self, x: int) -> jax.Array:
        """QFT|x> as a statevector (closed form: amplitudes
        ``exp(2 pi i x y / 2^n) / sqrt(2^n)``)."""
        c2 = AutoGradCircuit(self.n, dtype=self.dtype)
        v = np.zeros(1 << self.n, dtype=self.dtype)
        v[x] = 1.0
        c2.set_state_from_vector(v)
        c2.tape = self.circuit.tape
        return c2.build_state_fn()([], self._gates)

    def exact(self, x: int) -> np.ndarray:
        n = self.n
        y = np.arange(1 << n)
        return (np.exp(2j * np.pi * x * y / (1 << n)) / np.sqrt(1 << n)).astype(
            self.dtype
        )
