"""Distributed layer-scanned execution: deep circuits on a sharded state.

Combines circuit/scan.py (O(1) program size over repeated layers) with the
distributed fused executor: the layer's distributed program must end in the
layout it started from to be scannable, which is arranged by appending the
layer's qubit-permutation swaps *in reverse order* at the layer end — every
block swap is an involution, so ``S1..Sp  Sp..S1 = identity`` and the layout
is restored exactly (a few extra all-to-alls per layer, still O(layers)
collectives overall).

The adjoint is a reverse ``lax.scan`` whose body replays the shared
distributed blockwise backward step; gate gradients stack per layer and are
psummed once at the end.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from dqc_tpu.circuit.fused_autograd import _backward_gate_step
from dqc_tpu.circuit.ir import Tape
from dqc_tpu.ops import groups as gr
from dqc_tpu.parallel import dist
from dqc_tpu.parallel.fused_executor import (
    DFusedProgram,
    FSeg,
    _seg_gates,
    dist_fused_run,
    fuse_distributed,
)
from dqc_tpu.parallel.layout import (
    DCycle,
    DDensity,
    DistProgram,
    DSwap,
    plan_distribution,
)


def roundtrip_program(prog: DistProgram) -> DFusedProgram:
    """Append the program's swaps in reverse so the final layout equals the
    initial one (block swaps are involutions), then fuse. Gate-only programs
    only. Adjacent restore swaps compose into single-collective DCycles
    (fused_executor.fuse_adjacent_swaps, applied by fuse_distributed)."""
    if any(isinstance(di, DDensity) for di in prog.instructions):
        raise ValueError("round-trip programs must contain gates only")
    swaps = [di for di in prog.instructions if isinstance(di, DSwap)]
    prog = DistProgram(
        n=prog.n, k=prog.k,
        instructions=prog.instructions + tuple(reversed(swaps)),
        num_var_gates=prog.num_var_gates, num_const_gates=prog.num_const_gates,
        num_densities=0, diff_flags=(), final_phys=tuple(range(prog.n)),
    )
    return fuse_distributed(prog)


def plan_layer_roundtrip(layer_tape: Tape, k: int) -> DFusedProgram:
    """Compile a gate-only layer for a 2^k mesh with layout periodicity.
    The tape is first reordered for locality (commutation-legal batching,
    layout.reorder_for_locality) so commuting gates run before the swap
    that would otherwise split them across layouts; the returned program
    carries the var/const permutations and the executors map caller-order
    gates/cotangents transparently."""
    import dataclasses

    from dqc_tpu.parallel.layout import reorder_for_locality

    tape2, var_perm, const_perm = reorder_for_locality(layer_tape, k)
    dprog = roundtrip_program(plan_distribution(tape2, k))
    if var_perm is None and const_perm is None:
        return dprog
    return dataclasses.replace(dprog, var_perm=var_perm,
                               const_perm=const_perm)


def _layer_backward(dprog: DFusedProgram, axis: str, fwd_flat, bwd_flat,
                    var_gates, const_gates):
    """Roll (fwd, bwd) back through one layer; per-gate cts in queue order."""
    from dqc_tpu.parallel.fused_executor import apply_gate_perm, invert_ct_perm

    m = dprog.m
    var_gates = apply_gate_perm(var_gates, dprog.var_perm)
    const_gates = apply_gate_perm(const_gates, dprog.const_perm)
    sizes = gr.group_sizes_low_first(m)
    fwd = gr.to_grouped(fwd_flat, m)
    bwd = gr.to_grouped(bwd_flat, m)
    var_cts: Dict[int, jax.Array] = {}
    for di in reversed(dprog.instructions):
        if isinstance(di, DSwap):
            fwd = gr.to_grouped(
                dist.swap_global_block(gr.from_grouped(fwd), di.local_positions, axis), m
            )
            bwd = gr.to_grouped(
                dist.swap_global_block(gr.from_grouped(bwd), di.local_positions, axis), m
            )
            continue
        if isinstance(di, DCycle):
            # inverse cycle: roles swapped
            fwd = gr.to_grouped(dist.cycle_global_block(
                gr.from_grouped(fwd), di.in_positions, di.out_positions,
                axis), m)
            bwd = gr.to_grouped(dist.cycle_global_block(
                gr.from_grouped(bwd), di.in_positions, di.out_positions,
                axis), m)
            continue
        assert isinstance(di, FSeg), di
        vg, cg = _seg_gates(di, var_gates, const_gates)
        seg_cts: Dict[int, jax.Array] = {}
        for fi in reversed(di.ftape.instructions):
            fwd, bwd = _backward_gate_step(fi, fwd, bwd, vg, cg, sizes, m, seg_cts)
        for local_q, ct in seg_cts.items():
            var_cts[di.var_base + local_q] = ct
    cts = invert_ct_perm(
        tuple(var_cts[q] for q in range(dprog.num_var_gates)),
        dprog.var_perm)
    return gr.from_grouped(fwd), gr.from_grouped(bwd), cts


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def dist_scanned_layers(dprog: DFusedProgram, axis: str, local_state,
                        stacked_var_gates, const_gates):
    """Apply the (layout-periodic) distributed layer L times; leaves of
    ``stacked_var_gates`` carry a leading layer axis (caller/tape order —
    a locality-reordered program's permutation is applied internally).
    Returns the final local shard."""
    def body(state, layer_gates):
        _, state = dist_fused_run(dprog, axis, state, layer_gates,
                                  const_gates)
        return state, None

    final, _ = jax.lax.scan(body, jnp.asarray(local_state),
                            stacked_var_gates)
    return final


def _fwd(dprog, axis, local_state, stacked_var_gates, const_gates):
    final = dist_scanned_layers(dprog, axis, local_state, stacked_var_gates, const_gates)
    return final, (final, local_state, stacked_var_gates, const_gates)


def _bwd(dprog, axis, residuals, ct):
    final, local_state, stacked_var_gates, const_gates = residuals

    def body(carry, layer_gates):
        fwd_flat, bwd_flat = carry
        fwd_flat, bwd_flat, cts = _layer_backward(
            dprog, axis, fwd_flat, bwd_flat, layer_gates, const_gates
        )
        cts = tuple(_match(c, ref) for c, ref in zip(cts, layer_gates))
        return (fwd_flat, bwd_flat), cts

    final = jnp.asarray(final)
    (fwd0, bwd0), stacked_cts = jax.lax.scan(
        body, (final, jnp.asarray(ct).astype(final.dtype)),
        stacked_var_gates, reverse=True,
    )
    # per-layer cts are per-shard partials; one psum over the stacked result
    stacked_cts = jax.tree_util.tree_map(
        lambda x: jax.lax.psum(x, axis), stacked_cts
    )
    init_ref = jnp.asarray(local_state)
    const_cts = tuple(jnp.zeros_like(jnp.asarray(g)) for g in const_gates)
    return bwd0.astype(init_ref.dtype), stacked_cts, const_cts


def _match(ct, ref):
    ref = jnp.asarray(ref)
    ct = ct.reshape(ref.shape)
    if jnp.issubdtype(ref.dtype, jnp.complexfloating):
        return ct.astype(ref.dtype)
    return ct.real.astype(ref.dtype)


dist_scanned_layers.defvjp(_fwd, _bwd)
