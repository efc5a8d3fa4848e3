"""QAOA for weighted MaxCut on an arbitrary graph.

Same circuit family as the reference's VQE example (alternating diagonal
ZZ-cost and X-mixer layers, reference example_vqse_ising.py:68-75) but over
an arbitrary weighted edge list with per-layer (gamma, beta) parameters —
the standard QAOA schedule. Cut value is read from the edge 2-qubit density
matrices: ``cut = sum_e w_e (1 - <Z Z>_e) / 2``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dqc_tpu import config
from dqc_tpu.circuit.builder import AutoGradCircuit
from dqc_tpu.ops.observables import expval_from_density


class QAOAMaxCut:
    def __init__(
        self,
        qubits_number: int,
        edges: Sequence[Tuple[int, int]],
        weights: Optional[Sequence[float]] = None,
        layers_number: int = 2,
        dtype=None,
        scan: Optional[bool] = None,
    ):
        self.n = int(qubits_number)
        self.edges = [(int(a), int(b)) for a, b in edges]
        self.weights = (
            np.ones(len(self.edges)) if weights is None else np.asarray(weights, float)
        )
        if len(self.weights) != len(self.edges):
            raise ValueError("one weight per edge required")
        self.layers = int(layers_number)
        self.dtype = config.canonicalize_complex(dtype)
        self.scan = (self.layers >= 3) if scan is None else bool(scan)

        h2 = np.asarray([[1, 1], [1, -1]], dtype=self.dtype) / np.sqrt(2)
        self._hadamard = h2.reshape(-1)
        self._const_gates = self.n * [self._hadamard]

        c = AutoGradCircuit(self.n, dtype=self.dtype)
        for i in range(self.n):
            c.add_q1_const_gate(i)  # |+>^n start
        for _ in range(self.layers):
            self._add_layer(c)
        for (a, b) in self.edges:
            c.get_q2_dens_op_with_grad(a, b)
        self.circuit = c
        _, self._autodiff_run = c.build()

        if self.scan:
            from dqc_tpu.circuit.fusion import fuse_tape
            from dqc_tpu.circuit.scan import fuse_layer

            layer = AutoGradCircuit(self.n, dtype=self.dtype)
            self._add_layer(layer)
            epi = AutoGradCircuit(self.n, dtype=self.dtype)
            for (a, b) in self.edges:
                epi.get_q2_dens_op_with_grad(a, b)
            self._layer_ftape = fuse_layer(layer.tape)
            self._epi_ftape = fuse_tape(epi.tape)

        zz = np.kron(np.diag([1.0, -1.0]), np.diag([1.0, -1.0]))
        self._zz = zz.astype(self.dtype)

    def _add_layer(self, c: AutoGradCircuit) -> None:
        for (a, b) in self.edges:
            c.add_q2_var_gate_diag(a, b)
        for i in range(self.n):
            c.add_q1_var_gate(i)

    # -- parameterization ----------------------------------------------------

    def init_params(self, key) -> jax.Array:
        return 0.1 * jax.random.normal(
            key, (2 * self.layers,), dtype=config.real_of(self.dtype)
        )

    def _edge_diag(self, gamma, w):
        """exp(-i gamma w Z(x)Z) diagonal entries, (q2 q1) order."""
        phase = (gamma * w)
        e_m = jnp.exp(-1j * phase).astype(self.dtype)
        e_p = jnp.exp(1j * phase).astype(self.dtype)
        return jnp.stack([e_m, e_p, e_p, e_m], axis=-1)

    def params2gates(self, params: jax.Array) -> List[jax.Array]:
        gates: List[jax.Array] = []
        for l in range(self.layers):
            gamma, beta = params[2 * l], params[2 * l + 1]
            for w in self.weights:
                gates.append(self._edge_diag(gamma, float(w)))
            cb = jnp.cos(beta).astype(self.dtype)
            sb = (-1j * jnp.sin(beta)).astype(self.dtype)
            x = jnp.stack([cb, sb, sb, cb])
            gates += self.n * [x]
        return gates

    def _stacked_gates(self, params: jax.Array):
        gammas = params[0::2]
        betas = params[1::2]
        slots = [self._edge_diag(gammas, float(w)) for w in self.weights]  # (L,4) each
        cb = jnp.cos(betas).astype(self.dtype)
        sb = (-1j * jnp.sin(betas)).astype(self.dtype)
        x_stack = jnp.stack([cb, sb, sb, cb], axis=-1)
        return tuple(slots + self.n * [x_stack])

    # -- loss ------------------------------------------------------------------

    def _densities(self, params: jax.Array):
        if self.scan:
            from dqc_tpu.circuit.plane_scan import std_scan_with_epilogue
            from dqc_tpu.circuit.fusion import fuse_tape

            if not hasattr(self, "_pro_ftape"):
                pro = AutoGradCircuit(self.n, dtype=self.dtype)
                for i in range(self.n):
                    pro.add_q1_const_gate(i)
                self._pro_ftape = fuse_tape(pro.tape)
            return std_scan_with_epilogue(
                self._pro_ftape, self._layer_ftape, self._epi_ftape,
                tuple(self._const_gates), self._stacked_gates(params), (),
                dtype=self.dtype,
            )
        return self._autodiff_run(self.params2gates(params), self._const_gates)

    def expected_cut(self, params: jax.Array) -> jax.Array:
        """Expected cut value (to be maximized)."""
        dens = self._densities(params)
        cut = 0.0
        for dm, w in zip(dens, self.weights):
            zz = expval_from_density(dm, self._zz)
            cut = cut + float(w) * (1.0 - zz) / 2.0
        return cut

    def loss(self, params: jax.Array) -> jax.Array:
        """Negative expected cut (minimize)."""
        return -self.expected_cut(params)

    def exact_maxcut(self) -> float:
        """Brute-force optimum (small n only)."""
        if self.n > 20:
            raise ValueError("brute force limited to 20 qubits")
        best = 0.0
        for mask in range(1 << self.n):
            cut = 0.0
            for (a, b), w in zip(self.edges, self.weights):
                if ((mask >> a) & 1) != ((mask >> b) & 1):
                    cut += w
            best = max(best, cut)
        return float(best)
