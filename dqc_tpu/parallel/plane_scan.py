"""Distributed plane-layout layer scan: Pallas kernels on local shards.

The distributed engine (parallel/scan.py) runs each fused segment on the
local ``m = n-k`` qubit shard; when the shard itself is plane-eligible
(m >= 14, complex64, no dense cross-group segments) the segment executors of
the single-chip plane engine (circuit/plane_scan.py) run unchanged on the
local planes — same per-shard kernel throughput as single-chip — and the
qubit-permutation all-to-all rides ICI as two f32 exchanges (identical total
bytes to one complex exchange).

This is the pod-slice story for the BASELINE 34-qubit target: 34 qubits over
2^7 devices = 27 local qubits/shard, where the dual/high kernels were
measured 1.5-1.9x the XLA complex path.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from dqc_tpu.circuit import plane_scan as ps
from dqc_tpu.ops import planes as pl
from dqc_tpu.parallel import dist
from dqc_tpu.parallel.fused_executor import DFusedProgram, FSeg, _seg_gates
from dqc_tpu.parallel.layout import DSwap

C64 = jnp.complex64


def dist_plane_eligible(dprog: DFusedProgram, dtype) -> bool:
    if jnp.dtype(dtype) != jnp.dtype(C64):
        return False
    for di in dprog.instructions:
        if isinstance(di, FSeg) and not ps.plane_tape_eligible(di.ftape, dtype):
            return False
    return dprog.m >= 14


def use_dist_plane_engine(dprog: DFusedProgram, dtype) -> bool:
    from dqc_tpu import config

    mode = config.plane_engine()
    if mode is False or not dist_plane_eligible(dprog, dtype):
        return False
    if mode is True:
        return True
    return jax.default_backend() == "tpu"


def _swap_planes(xr, xi, positions, axis):
    shape = xr.shape
    xr = dist.swap_global_block(xr.reshape(-1), positions, axis).reshape(shape)
    xi = dist.swap_global_block(xi.reshape(-1), positions, axis).reshape(shape)
    return xr, xi


def _forward_layer(dprog: DFusedProgram, axis: str, xr, xi, var_gates, const_gates):
    for di in dprog.instructions:
        if isinstance(di, DSwap):
            xr, xi = _swap_planes(xr, xi, di.local_positions, axis)
            continue
        assert isinstance(di, FSeg), di
        vg, cg = _seg_gates(di, var_gates, const_gates)
        program = ps.plane_program(di.ftape)
        xr, xi = ps._apply_forward(xr, xi, program, di.ftape, vg, cg)
    return xr, xi


def _backward_layer(dprog: DFusedProgram, axis: str, fxr, fxi, bxr, bxi,
                    var_gates, const_gates):
    var_cts: Dict[int, jax.Array] = {}
    for di in reversed(dprog.instructions):
        if isinstance(di, DSwap):
            fxr, fxi = _swap_planes(fxr, fxi, di.local_positions, axis)
            bxr, bxi = _swap_planes(bxr, bxi, di.local_positions, axis)
            continue
        assert isinstance(di, FSeg), di
        vg, cg = _seg_gates(di, var_gates, const_gates)
        seg_cts: Dict[int, jax.Array] = {}
        program = ps.plane_program(di.ftape)
        fxr, fxi, bxr, bxi = ps._backward_program(
            fxr, fxi, bxr, bxi, program, di.ftape, vg, cg, seg_cts)
        for local_q, ct in seg_cts.items():
            var_cts[di.var_base + local_q] = ct
    cts = tuple(var_cts[q] for q in range(dprog.num_var_gates))
    return fxr, fxi, bxr, bxi, cts


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def dist_plane_scanned_layers(dprog: DFusedProgram, axis: str, local_state,
                              stacked_var_gates, const_gates):
    """Plane-engine counterpart of dist_scanned_layers: same contract
    (layout-periodic gate-only layer program applied L times on the local
    shard; returns the final local shard, flat complex)."""
    m = dprog.m

    def body(carry, layer_gates):
        xr, xi = carry
        xr, xi = _forward_layer(dprog, axis, xr, xi, layer_gates, const_gates)
        return (xr, xi), None

    xr, xi = pl.to_planes(jnp.asarray(local_state).astype(C64), m)
    (xr, xi), _ = jax.lax.scan(body, (xr, xi), stacked_var_gates)
    return pl.from_planes(xr, xi, m)


def _fwd(dprog, axis, local_state, stacked_var_gates, const_gates):
    final = dist_plane_scanned_layers(dprog, axis, local_state,
                                      stacked_var_gates, const_gates)
    return final, (final, local_state, stacked_var_gates, const_gates)


def _bwd(dprog, axis, residuals, ct):
    final, local_state, stacked_var_gates, const_gates = residuals
    m = dprog.m

    def body(carry, layer_gates):
        fxr, fxi, bxr, bxi = carry
        fxr, fxi, bxr, bxi, cts = _backward_layer(
            dprog, axis, fxr, fxi, bxr, bxi, layer_gates, const_gates)
        cts = tuple(_match(c, ref) for c, ref in zip(cts, layer_gates))
        return (fxr, fxi, bxr, bxi), cts

    fxr, fxi = pl.to_planes(jnp.asarray(final), m)
    bxr, bxi = pl.to_planes(jnp.asarray(ct).astype(C64), m)
    (fxr, fxi, bxr, bxi), stacked_cts = jax.lax.scan(
        body, (fxr, fxi, bxr, bxi), stacked_var_gates, reverse=True,
    )
    # per-layer cts are per-shard partials; one psum over the stacked result
    stacked_cts = jax.tree_util.tree_map(
        lambda x: jax.lax.psum(x, axis), stacked_cts
    )
    init_ref = jnp.asarray(local_state)
    state_ct = pl.from_planes(bxr, bxi, m).astype(init_ref.dtype)
    const_cts = tuple(jnp.zeros_like(jnp.asarray(g)) for g in const_gates)
    return state_ct, stacked_cts, const_cts


def _match(ct, ref):
    ref = jnp.asarray(ref)
    ct = ct.reshape(ref.shape)
    if jnp.issubdtype(ref.dtype, jnp.complexfloating):
        return ct.astype(ref.dtype)
    return ct.real.astype(ref.dtype)


dist_plane_scanned_layers.defvjp(_fwd, _bwd)
