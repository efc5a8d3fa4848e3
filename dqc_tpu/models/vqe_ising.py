"""VQE for the transverse-field Ising model (ring topology).

The model family behind the reference's headline example
(reference example_vqse_ising.py): ``layers`` alternating layers of diagonal
ZZ-interaction gates on every ring edge and X-rotations on every qubit
(example_vqse_ising.py:68-75), with all nearest-neighbour 2-qubit density
matrices as observables (example_vqse_ising.py:77-79) and the TFIM energy
``sum tr(rho h)`` as the loss (example_vqse_ising.py:31-39, 87-93).

Everything — params -> gates -> circuit -> densities -> energy — is one pure
jittable, differentiable function. Deep circuits (``scan=True``, the default
for >= 3 layers) run the repeated layer as ONE ``lax.scan`` body with a
reverse-scanned O(1)-memory adjoint (circuit/scan.py), so compile time and
program size are independent of depth.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dqc_tpu import config
from dqc_tpu.circuit.builder import AutoGradCircuit
from dqc_tpu.ops import gates as G
from dqc_tpu.ops.observables import expval_from_density


class VQEIsing:
    """Variational ground-state search for H = -sum ZZ - h/2 * sum X pairs."""

    def __init__(
        self,
        qubits_number: int,
        layers_number: int,
        magnetic_field: float = 1.0,
        dtype=None,
        scan: Optional[bool] = None,
    ):
        self.n = int(qubits_number)
        self.layers = int(layers_number)
        self.field = float(magnetic_field)
        self.dtype = config.canonicalize_complex(dtype)
        self.scan = (self.layers >= 3) if scan is None else bool(scan)

        h2 = np.asarray([[1, 1], [1, -1]], dtype=self.dtype) / np.sqrt(2)
        self._hadamard = h2.reshape(-1)

        # full unrolled tape (reference-compatible; used by the distributed
        # path and for simple_run-style inspection)
        c = AutoGradCircuit(self.n, dtype=self.dtype)
        # initial state: uniform superposition (all Bloch vectors along +X,
        # reference example_vqse_ising.py:58-59) prepared as a layer of
        # constant Hadamards on |0...0> — no 2^n host vector at any n.
        for i in range(self.n):
            c.add_q1_const_gate(i)
        self._const_gates = self.n * [self._hadamard]
        for _ in range(self.layers):
            self._add_layer_gates(c)
        for i in range(self.n - 1):
            c.get_q2_dens_op_with_grad(i, i + 1)
        c.get_q2_dens_op_with_grad(0, self.n - 1)
        self.circuit = c
        _, self._autodiff_run = c.build()

        if self.scan:
            from dqc_tpu.circuit.fusion import fuse_tape
            from dqc_tpu.circuit.scan import fuse_layer

            pro = AutoGradCircuit(self.n, dtype=self.dtype)
            for i in range(self.n):
                pro.add_q1_const_gate(i)
            layer = AutoGradCircuit(self.n, dtype=self.dtype)
            self._add_layer_gates(layer)
            epi = AutoGradCircuit(self.n, dtype=self.dtype)
            for i in range(self.n - 1):
                epi.get_q2_dens_op_with_grad(i, i + 1)
            epi.get_q2_dens_op_with_grad(0, self.n - 1)
            self._pro_ftape = fuse_tape(pro.tape)
            self._layer_ftape = fuse_layer(layer.tape)
            self._epi_ftape = fuse_tape(epi.tape)

        # two-site TFIM Hamiltonian term, (q2 q1) index order; host-side
        sz = np.array([[1, 0], [0, -1]], dtype=complex)
        sx = np.array([[0, 1], [1, 0]], dtype=complex)
        eye = np.eye(2, dtype=complex)
        self.h = (
            -np.kron(sz, sz)
            - 0.5 * self.field * (np.kron(sx, eye) + np.kron(eye, sx))
        ).astype(self.dtype)

    def _add_layer_gates(self, c: AutoGradCircuit) -> None:
        """One ansatz layer (reference example_vqse_ising.py:68-75)."""
        for i in range(self.n - 1):
            c.add_q2_var_gate_diag(i, i + 1)
        c.add_q2_var_gate_diag(0, self.n - 1)  # ring closure
        for i in range(self.n):
            c.add_q1_var_gate(i)

    # -- parameterization ----------------------------------------------------

    def params2gates(self, params: jax.Array) -> List[jax.Array]:
        """2L scalars -> gate list: per layer, n copies of zz(gamma) then n
        copies of x(beta) (reference example_vqse_ising.py:42-49)."""
        gates: List[jax.Array] = []
        for layer in range(self.layers):
            zz = G.zz(params[2 * layer], self.dtype)
            x = G.x_rotation(params[2 * layer + 1], self.dtype).reshape(-1)
            gates += self.n * [zz]
            gates += self.n * [x]
        return gates

    def _stacked_gates(self, params: jax.Array):
        """(L,) gammas/betas -> per-layer stacked gate slots for the scan."""
        gammas = params[0::2].astype(self.dtype)
        betas = params[1::2]
        e_m = jnp.exp(-1j * gammas)
        e_p = jnp.exp(1j * gammas)
        zz_stack = jnp.stack([e_m, e_p, e_p, e_m], axis=-1)          # (L, 4)
        cb = jnp.cos(betas).astype(self.dtype)
        sb = (-1j * jnp.sin(betas)).astype(self.dtype)
        x_stack = jnp.stack([cb, sb, sb, cb], axis=-1)               # (L, 4)
        return tuple([zz_stack] * self.n + [x_stack] * self.n)

    def init_params(self, key) -> jax.Array:
        real_dtype = config.real_of(self.dtype)
        return jax.random.normal(key, (2 * self.layers,), dtype=real_dtype)

    # -- loss ------------------------------------------------------------------

    def energy(self, params: jax.Array) -> jax.Array:
        """TFIM energy estimate (real scalar), fully differentiable."""
        if self.scan:
            from dqc_tpu.circuit.plane_scan import std_scan_with_epilogue

            densities = std_scan_with_epilogue(
                self._pro_ftape, self._layer_ftape, self._epi_ftape,
                tuple(self._const_gates), self._stacked_gates(params), (),
                dtype=self.dtype,
            )
        else:
            densities = self._autodiff_run(
                self.params2gates(params), self._const_gates
            )
        return sum(expval_from_density(dm, self.h) for dm in densities)

    def build_distributed_energy(self, mesh, axis=None, scan: Optional[bool] = None):
        """Energy over a sharded statevector (parallel/). Returns a
        jit/grad-able ``energy(params) -> real scalar``.

        ``scan=True`` (default when the model is in scan mode) runs the
        repeated layer as one layout-periodic lax.scan body inside the
        shard_map region — deep circuits on a mesh with depth-independent
        program size."""
        from dqc_tpu.parallel import AXIS, DistributedCircuit
        from dqc_tpu.parallel.mesh import mesh_bits

        axis = axis or AXIS
        scan = self.scan if scan is None else bool(scan)
        if not scan:
            dc = DistributedCircuit(self.circuit, mesh, axis=axis, dtype=self.dtype)
            _, run = dc.build()

            def energy(params):
                gates = self.params2gates(params)
                densities = run(gates, self._const_gates)
                return sum(expval_from_density(dm, self.h)
                           for dm in densities)

            return energy

        from jax.sharding import PartitionSpec as P

        from dqc_tpu.circuit.builder import AutoGradCircuit
        from dqc_tpu.parallel import dist as pdist
        from dqc_tpu.parallel.fused_executor import (
            dist_fused_forward, dist_fused_run, fuse_distributed,
        )
        from dqc_tpu.parallel.layout import plan_distribution
        from dqc_tpu.parallel.scan import dist_scanned_layers, plan_layer_roundtrip

        n, dtype = self.n, self.dtype
        k = mesh_bits(mesh, axis)

        pro = AutoGradCircuit(n, dtype=dtype)
        for i in range(n):
            pro.add_q1_const_gate(i)
        layer = AutoGradCircuit(n, dtype=dtype)
        self._add_layer_gates(layer)
        epi = AutoGradCircuit(n, dtype=dtype)
        for i in range(n - 1):
            epi.get_q2_dens_op_with_grad(i, i + 1)
        epi.get_q2_dens_op_with_grad(0, n - 1)

        from dqc_tpu.parallel.scan import roundtrip_program
        pro_prog = roundtrip_program(plan_distribution(pro.tape, k))
        layer_prog = plan_layer_roundtrip(layer.tape, k)
        epi_prog = fuse_distributed(plan_distribution(epi.tape, k))
        const_gates = tuple(self._const_gates)
        h = self.h

        from dqc_tpu.parallel.plane_scan import (
            dist_plane_scanned_layers,
            dist_plane_std_scan_densities,
            use_dist_plane_engine,
            use_dist_plane_std,
        )

        plane_layers = use_dist_plane_engine(layer_prog, dtype)
        plane_std = plane_layers and use_dist_plane_std(
            pro_prog, layer_prog, epi_prog, dtype)
        scan_layers = (dist_plane_scanned_layers if plane_layers
                       else dist_scanned_layers)

        def body(stacked):
            if plane_std:
                # fully plane-resident: |0..0> as local planes, prologue +
                # scan + psum'd density epilogue with no 2^m complex buffer
                densities = dist_plane_std_scan_densities(
                    pro_prog, layer_prog, epi_prog, axis, const_gates,
                    stacked, ())
            else:
                local = pdist.local_standard_state(n, k, axis, dtype)
                _, local = dist_fused_run(pro_prog, axis, local, (), const_gates)
                local = scan_layers(layer_prog, axis, local, stacked, ())
                densities = dist_fused_forward(epi_prog, axis, local, (), ())
            return sum(expval_from_density(dm, h) for dm in densities)

        mapped = jax.shard_map(body, mesh=mesh, in_specs=(P(),), out_specs=P(),
                               check_vma=False)

        def energy(params):
            return mapped(self._stacked_gates(params))

        return energy

    def exact_ground_energy(self) -> float:
        """Exact TFIM ground energy at the phase-transition point h=1
        (reference example_vqse_ising.py:127)."""
        return float(-2.0 / np.sin(np.pi / (2 * self.n)))
