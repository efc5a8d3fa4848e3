"""VQE for the transverse-field Ising model (ring topology).

The model family behind the reference's headline example
(reference example_vqse_ising.py): ``layers`` alternating layers of diagonal
ZZ-interaction gates on every ring edge and X-rotations on every qubit
(example_vqse_ising.py:68-75), with all nearest-neighbour 2-qubit density
matrices as observables (example_vqse_ising.py:77-79) and the TFIM energy
``sum tr(rho h)`` as the loss (example_vqse_ising.py:31-39, 87-93).

Everything — params -> gates -> circuit -> densities -> energy — is one pure
jittable, differentiable function.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from dqc_tpu import config
from dqc_tpu.circuit.builder import AutoGradCircuit
from dqc_tpu.ops import gates as G


class VQEIsing:
    """Variational ground-state search for H = -sum ZZ - h/2 * sum X pairs."""

    def __init__(
        self,
        qubits_number: int,
        layers_number: int,
        magnetic_field: float = 1.0,
        dtype=None,
    ):
        self.n = int(qubits_number)
        self.layers = int(layers_number)
        self.field = float(magnetic_field)
        self.dtype = config.canonicalize_complex(dtype)

        c = AutoGradCircuit(self.n, dtype=self.dtype)
        # initial state: uniform superposition (all Bloch vectors along +X,
        # reference example_vqse_ising.py:58-59) — prepared as a layer of
        # constant Hadamards on |0...0> rather than a 2^n host vector, so the
        # same tape runs sharded at any n without materializing the state.
        for i in range(self.n):
            c.add_q1_const_gate(i)
        h2 = np.asarray([[1, 1], [1, -1]], dtype=self.dtype) / np.sqrt(2)
        self._const_gates = self.n * [h2.reshape(-1)]
        for _ in range(self.layers):
            for i in range(self.n - 1):
                c.add_q2_var_gate_diag(i, i + 1)
            c.add_q2_var_gate_diag(0, self.n - 1)  # ring closure
            for i in range(self.n):
                c.add_q1_var_gate(i)
        for i in range(self.n - 1):
            c.get_q2_dens_op_with_grad(i, i + 1)
        c.get_q2_dens_op_with_grad(0, self.n - 1)
        self.circuit = c
        _, self._autodiff_run = c.build()

        # two-site TFIM Hamiltonian term, (q2 q1) index order
        sz = np.array([[1, 0], [0, -1]], dtype=complex)
        sx = np.array([[0, 1], [1, 0]], dtype=complex)
        eye = np.eye(2, dtype=complex)
        h = (
            -np.kron(sz, sz)
            - 0.5 * self.field * (np.kron(sx, eye) + np.kron(eye, sx))
        )
        # kept host-side; embeds as a constant wherever it is traced
        self.h = h.astype(self.dtype)

    # -- parameterization ----------------------------------------------------

    def params2gates(self, params: jax.Array) -> List[jax.Array]:
        """2L scalars -> gate list: per layer, n copies of zz(gamma) then n
        copies of x(beta) (reference example_vqse_ising.py:42-49)."""
        gates: List[jax.Array] = []
        for layer in range(self.layers):
            gamma = params[2 * layer]
            beta = params[2 * layer + 1]
            zz = G.zz(gamma, self.dtype)
            x = G.x_rotation(beta, self.dtype).reshape(-1)
            gates += self.n * [zz]
            gates += self.n * [x]
        return gates

    def init_params(self, key) -> jax.Array:
        real_dtype = config.real_of(self.dtype)
        return jax.random.normal(key, (2 * self.layers,), dtype=real_dtype)

    # -- loss ------------------------------------------------------------------

    def energy(self, params: jax.Array) -> jax.Array:
        """TFIM energy estimate (real scalar), fully differentiable."""
        gates = self.params2gates(params)
        densities = self._autodiff_run(gates, self._const_gates)
        e = sum(jnp.einsum("ij,ji->", dm, self.h) for dm in densities)
        return e.real

    def build_distributed_energy(self, mesh, axis=None):
        """Energy over a sharded statevector: same tape compiled for a
        device mesh (parallel/dcircuit.py). Returns a jit/grad-able
        ``energy(params) -> real scalar``."""
        from dqc_tpu.parallel import AXIS, DistributedCircuit

        dc = DistributedCircuit(self.circuit, mesh, axis=axis or AXIS, dtype=self.dtype)
        _, run = dc.build()

        def energy(params):
            gates = self.params2gates(params)
            densities = run(gates, self._const_gates)
            e = sum(jnp.einsum("ij,ji->", dm, self.h) for dm in densities)
            return e.real

        return energy

    def exact_ground_energy(self) -> float:
        """Exact TFIM ground energy at the phase-transition point h=1
        (reference example_vqse_ising.py:127)."""
        return float(-2.0 / np.sin(np.pi / (2 * self.n)))
