"""Hardware-efficient ansatz: parameterized 1q rotations + entangling rings.

The deep-circuit benchmark family from BASELINE.md ("deep hardware-efficient
ansatz, 28-30 qubits, depth 100+, O(1)-memory adjoint"): per layer, one
variable dense 1-qubit gate on every qubit followed by a ring of constant
entanglers (CNOT or CZ); observables are the 1-qubit densities of every
qubit, with a transverse-magnetization loss.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from dqc_tpu import config
from dqc_tpu.circuit.builder import AutoGradCircuit
from dqc_tpu.ops.observables import expval_from_density


class HardwareEfficientAnsatz:
    def __init__(self, qubits_number: int, layers_number: int,
                 entangler: str = "cnot", dtype=None, scan=None):
        self.n = int(qubits_number)
        self.layers = int(layers_number)
        self.dtype = config.canonicalize_complex(dtype)
        self.scan = (self.layers >= 3) if scan is None else bool(scan)

        if entangler == "cnot":
            ent = np.array(
                [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]],
                dtype=self.dtype,
            ).reshape(-1)
            self._ent_diag = False
        elif entangler == "cz":
            ent = np.array([1, 1, 1, -1], dtype=self.dtype)  # diagonal entries
            self._ent_diag = True
        else:
            raise ValueError(f"unknown entangler {entangler!r}")

        c = AutoGradCircuit(self.n, dtype=self.dtype)
        for _ in range(self.layers):
            for i in range(self.n):
                c.add_q1_var_gate(i)
            for i in range(self.n - 1):
                if self._ent_diag:
                    c.add_q2_const_gate_diag(i, i + 1)
                else:
                    c.add_q2_const_gate(i, i + 1)
            if self._ent_diag:
                c.add_q2_const_gate_diag(0, self.n - 1)
            else:
                c.add_q2_const_gate(0, self.n - 1)
        for i in range(self.n):
            c.get_q1_dens_op_with_grad(i)
        self.circuit = c
        _, self._autodiff_run = c.build()
        self._const_gates = self.layers * (self.n * [ent])
        self._z = np.array([[1, 0], [0, -1]], dtype=self.dtype)

        if self.scan:
            from dqc_tpu.circuit.fusion import fuse_tape
            from dqc_tpu.circuit.scan import fuse_layer

            layer = AutoGradCircuit(self.n, dtype=self.dtype)
            for i in range(self.n):
                layer.add_q1_var_gate(i)
            for i in range(self.n - 1):
                if self._ent_diag:
                    layer.add_q2_const_gate_diag(i, i + 1)
                else:
                    layer.add_q2_const_gate(i, i + 1)
            if self._ent_diag:
                layer.add_q2_const_gate_diag(0, self.n - 1)
            else:
                layer.add_q2_const_gate(0, self.n - 1)
            epi = AutoGradCircuit(self.n, dtype=self.dtype)
            for i in range(self.n):
                epi.get_q1_dens_op_with_grad(i)
            self._layer_ftape = fuse_layer(layer.tape)
            self._epi_ftape = fuse_tape(epi.tape)
            self._layer_consts = tuple(self.n * [ent])

    @property
    def num_var_gates(self) -> int:
        return self.n * self.layers

    @property
    def num_gates(self) -> int:
        """Total gate applications per forward pass."""
        return 2 * self.n * self.layers

    def params2gates(self, params: jax.Array) -> List[jax.Array]:
        """(layers, n, 3) Euler angles -> SU(2) gates, traced."""
        a, b, g = params[..., 0], params[..., 1], params[..., 2]
        ca, sa = jnp.cos(a / 2), jnp.sin(a / 2)
        dt = self.dtype
        eb = jnp.exp(1j * b.astype(dt))
        eg = jnp.exp(1j * g.astype(dt))
        u00 = ca.astype(dt)
        u01 = -sa.astype(dt) * eg
        u10 = sa.astype(dt) * eb
        u11 = ca.astype(dt) * eb * eg
        mats = jnp.stack(
            [jnp.stack([u00, u01], -1), jnp.stack([u10, u11], -1)], -2
        )  # (layers, n, 2, 2)
        return [mats[l, q].reshape(-1) for l in range(self.layers) for q in range(self.n)]

    def init_params(self, key) -> jax.Array:
        return 0.1 * jax.random.normal(
            key, (self.layers, self.n, 3), dtype=config.real_of(self.dtype)
        )

    def _stacked_gates(self, params: jax.Array):
        """(layers, n, 3) params -> n per-qubit stacked slots of (L, 4)."""
        a, b, g = params[..., 0], params[..., 1], params[..., 2]
        dt = self.dtype
        ca, sa = jnp.cos(a / 2).astype(dt), jnp.sin(a / 2).astype(dt)
        eb = jnp.exp(1j * b.astype(dt))
        eg = jnp.exp(1j * g.astype(dt))
        mats = jnp.stack([ca, -sa * eg, sa * eb, ca * eb * eg], axis=-1)  # (L, n, 4)
        return tuple(mats[:, q, :] for q in range(self.n))

    def magnetization(self, params: jax.Array) -> jax.Array:
        """Sum of <Z_i> — a simple fully-differentiable loss."""
        if self.scan:
            from dqc_tpu.circuit.plane_scan import std_scan_with_epilogue

            densities = std_scan_with_epilogue(
                None, self._layer_ftape, self._epi_ftape, (),
                self._stacked_gates(params), self._layer_consts,
                dtype=self.dtype,
            )
        else:
            gates = self.params2gates(params)
            densities = self._autodiff_run(gates, self._const_gates)
        return sum(expval_from_density(dm, self._z) for dm in densities)

    def magnetization_value_and_grad_segmented(self, params: jax.Array, *,
                                               max_chunk: int = 32):
        """``jax.value_and_grad(self.magnetization)(params)`` executed as a
        host-driven sequence of bounded device calls of at most
        ``max_chunk`` layers each (circuit/segmented.py) — for backends
        that kill long single executions (the measured ~60-80 s axon
        watchdog: a 30q depth-100 step is ~80 s as ONE call and can only
        run segmented). Requires scan mode and plane-engine eligibility;
        gradients match the single-call engine (tests/test_segmented.py).
        """
        from dqc_tpu.circuit import plane_scan, segmented

        if not self.scan:
            raise ValueError("segmented execution requires scan mode")
        if not plane_scan.use_plane_engine(self._layer_ftape, self.dtype):
            raise ValueError(
                "segmented execution runs on the plane engine; not eligible "
                "here (needs >=14 qubits, complex64, TPU backend or "
                "config.set_plane_engine(True))")

        # every complex-touching stage runs JITTED: an eager vjp of the
        # complex gate parameterization (or an eager loss with the complex
        # observable constant) is a complex64 host->device transfer, which
        # serving TPU backends reject AND which poisons the PJRT client
        # (circuit/segmented.py marshalling notes)
        stacked = self._stacked_gates_jit(params)
        value, stacked_cts = segmented.segmented_scan_value_and_grad(
            self._layer_ftape, self._epi_ftape, stacked, self._layer_consts,
            self._density_loss, max_chunk=max_chunk)
        params_ct = self._stacked_pullback_jit(params, stacked_cts)
        return value, params_ct

    @functools.cached_property
    def _stacked_gates_jit(self):
        return jax.jit(self._stacked_gates)

    @functools.cached_property
    def _stacked_pullback_jit(self):
        def pull(p, cts):
            return jax.vjp(self._stacked_gates, p)[1](tuple(cts))[0]

        return jax.jit(pull)

    @functools.cached_property
    def _density_loss(self):
        """Stable per-instance loss closure: segmented._loss_cts_fn caches
        its jitted wrapper on this object's identity."""

        def loss_fn(densities):
            return sum(expval_from_density(dm, self._z) for dm in densities)

        return loss_fn

    def loss_from_gates(self, var_gates) -> jax.Array:
        """Same loss taking explicit var gates (for kernel benchmarking)."""
        densities = self._autodiff_run(list(var_gates), self._const_gates)
        return sum(expval_from_density(dm, self._z) for dm in densities)
