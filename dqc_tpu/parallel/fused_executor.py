"""Distributed fused execution: gate-fusion blocks on local shards.

Composes the two compilers: :func:`~dqc_tpu.parallel.layout.plan_distribution`
rewrites the tape onto local physical slots with qubit-permutation
all-to-alls, and each run of gates *between* collectives/densities is then
compiled by the fusion engine (circuit/fusion.py) into full-group blocks over
the **local** qubit groups. The shard therefore sweeps HBM once per fused
block — the same per-shard efficiency as single-chip — with swaps and psums
riding ICI between segments.

The O(1)-memory adjoint walks segments in reverse with the shared blockwise
backward step; block swaps are involutions, so uncompute re-applies them.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from dqc_tpu.circuit.fused_autograd import _backward_gate_step, fused_run
from dqc_tpu.circuit.fusion import FusedTape, fuse_tape
from dqc_tpu.circuit.ir import Instruction, Tape
from dqc_tpu.ops import groups as gr
from dqc_tpu.parallel import dist
from dqc_tpu.parallel.layout import DApply, DCycle, DDensity, DistProgram, DSwap


@dataclass(frozen=True)
class FSeg:
    """A fused run of local gates with its slice of the gate queues."""
    ftape: FusedTape
    var_base: int
    var_count: int
    const_base: int
    const_count: int


@dataclass(frozen=True)
class DFusedProgram:
    n: int
    k: int
    instructions: Tuple[object, ...]
    num_var_gates: int
    num_const_gates: int
    diff_flags: Tuple[bool, ...]
    # set when the tape was reordered for locality (layout.
    # reorder_for_locality): perm[j] = ORIGINAL queue index of this
    # program's j-th var/const gate; executors permute gate tuples in and
    # inverse-permute cotangents out. None = tape order.
    var_perm: Optional[Tuple[int, ...]] = None
    const_perm: Optional[Tuple[int, ...]] = None

    @property
    def m(self) -> int:
        return self.n - self.k

    def last_diff_density_index(self) -> int:
        for i in range(len(self.instructions) - 1, -1, -1):
            di = self.instructions[i]
            if isinstance(di, DDensity) and di.diff:
                return i
        return -1


def apply_gate_perm(gates, perm):
    """Caller-order gate tuple -> program-order (DFusedProgram.var_perm)."""
    if perm is None:
        return tuple(gates)
    return tuple(gates[i] for i in perm)


def invert_ct_perm(cts, perm):
    """Program-order cotangents -> caller order."""
    if perm is None:
        return tuple(cts)
    out = [None] * len(cts)
    for j, i in enumerate(perm):
        out[i] = cts[j]
    return tuple(out)


def fuse_adjacent_swaps(dprog: DFusedProgram) -> DFusedProgram:
    """Peephole: every ADJACENT pair of disjoint DSwaps composes into one
    DCycle — one all-to-all + one relayout pass instead of two of each
    (the layer roundtrip's trailing layout-restore run is the common
    producer). The net qubit permutation is identical, so downstream
    instructions and every gradient are unchanged. Disable with
    DQC_DIST_FUSE_SWAPS=0."""
    import os

    if os.environ.get("DQC_DIST_FUSE_SWAPS", "1") == "0":
        return dprog
    out: List[object] = []
    for di in dprog.instructions:
        if (isinstance(di, DSwap) and out and isinstance(out[-1], DSwap)
                and not set(di.local_positions) & set(out[-1].local_positions)):
            first = out.pop()
            out.append(DCycle(out_positions=di.local_positions,
                              in_positions=first.local_positions))
            continue
        out.append(di)
    if len(out) == len(dprog.instructions):
        return dprog
    return DFusedProgram(
        n=dprog.n, k=dprog.k, instructions=tuple(out),
        num_var_gates=dprog.num_var_gates,
        num_const_gates=dprog.num_const_gates,
        diff_flags=dprog.diff_flags,
        var_perm=dprog.var_perm, const_perm=dprog.const_perm,
    )


def fuse_distributed(prog: DistProgram) -> DFusedProgram:
    """Compile a distributed program's gate runs into fused segments."""
    m = prog.m
    out: List[object] = []
    pending: List[Instruction] = []
    var_base = const_base = 0
    var_used = const_used = 0

    def flush():
        nonlocal var_base, const_base, var_used, const_used
        if not pending:
            return
        seg_tape = Tape(m, tuple(pending))
        out.append(FSeg(
            ftape=fuse_tape(seg_tape),
            var_base=var_base, var_count=var_used - var_base,
            const_base=const_base, const_count=const_used - const_base,
        ))
        pending.clear()
        var_base, const_base = var_used, const_used

    for di in prog.instructions:
        if isinstance(di, DApply):
            pending.append(Instruction(di.kind, di.positions, var=di.var,
                                       unitary=di.unitary))
            if di.var:
                var_used += 1
            else:
                const_used += 1
        elif isinstance(di, DSwap):
            flush()
            out.append(di)
        elif isinstance(di, DDensity):
            flush()
            out.append(di)
        else:
            raise AssertionError(di)
    flush()
    return fuse_adjacent_swaps(DFusedProgram(
        n=prog.n, k=prog.k, instructions=tuple(out),
        num_var_gates=prog.num_var_gates, num_const_gates=prog.num_const_gates,
        diff_flags=prog.diff_flags,
    ))


def _seg_gates(seg: FSeg, var_gates, const_gates):
    vg = tuple(var_gates[seg.var_base:seg.var_base + seg.var_count])
    cg = tuple(const_gates[seg.const_base:seg.const_base + seg.const_count])
    return vg, cg


def dist_fused_run(
    dprog: DFusedProgram,
    axis: str,
    local_state: jax.Array,
    var_gates,
    const_gates,
    *,
    only_diff: bool = False,
    stop_after: Optional[int] = None,
):
    m = dprog.m
    # perm-carrying programs (locality reorder) consume gates in program
    # order; callers always pass tape order — map here so EVERY entry
    # point is safe by construction
    var_gates = apply_gate_perm(var_gates, dprog.var_perm)
    const_gates = apply_gate_perm(const_gates, dprog.const_perm)
    state = jnp.asarray(local_state)
    densities: List[jax.Array] = []
    gram_cache: dict = {}
    for idx, di in enumerate(dprog.instructions):
        if stop_after is not None and idx > stop_after:
            break
        if isinstance(di, FSeg):
            gram_cache.clear()
            vg, cg = _seg_gates(di, var_gates, const_gates)
            _, state = fused_run(di.ftape, state, vg, cg)
        elif isinstance(di, DSwap):
            gram_cache.clear()
            state = dist.swap_global_block(state, di.local_positions, axis)
        elif isinstance(di, DCycle):
            gram_cache.clear()
            state = dist.cycle_global_block(state, di.out_positions,
                                            di.in_positions, axis)
        elif isinstance(di, DDensity):
            if di.diff or not only_diff:
                densities.append(gr.density_cached(
                    gr.to_grouped(state, m), di.positions, m, gram_cache,
                    psum_axis=axis,
                ))
        else:
            raise AssertionError(di)
    return tuple(densities), state


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def dist_fused_forward(dprog: DFusedProgram, axis: str, local_state, var_gates, const_gates):
    densities, _ = dist_fused_run(dprog, axis, local_state, var_gates, const_gates,
                                  only_diff=True)
    return densities


def _fwd(dprog, axis, local_state, var_gates, const_gates):
    last = dprog.last_diff_density_index()
    densities, state = dist_fused_run(
        dprog, axis, local_state, var_gates, const_gates,
        only_diff=True, stop_after=last if last >= 0 else -1,
    )
    if last < 0:
        state = jnp.asarray(local_state)
    return densities, (state, local_state, var_gates, const_gates)


def _bwd(dprog, axis, residuals, density_cts):
    state, local_state, var_gates, const_gates = residuals
    m = dprog.m
    # program-order gates for the segment walks; the assembled var_cts are
    # mapped back to caller order below
    var_gates = apply_gate_perm(var_gates, dprog.var_perm)
    const_gates = apply_gate_perm(const_gates, dprog.const_perm)
    sizes = gr.group_sizes_low_first(m)
    last = dprog.last_diff_density_index()

    diff_indices = [
        i for i, di in enumerate(dprog.instructions)
        if isinstance(di, DDensity) and di.diff
    ]
    ct_of = dict(zip(diff_indices, density_cts))

    fwd = gr.to_grouped(jnp.asarray(state), m)
    bwd = None
    var_cts: Dict[int, jax.Array] = {}
    pending: Dict[int, jax.Array] = {}  # group -> summed seed operator

    def flush_seeds(fwd, bwd):
        if not pending:
            return bwd
        conj = fwd.conj()
        for j, M in pending.items():
            seed = gr.apply_group_matrix(conj, M, j)
            bwd = seed if bwd is None else bwd + seed
        pending.clear()
        return bwd

    for idx in range(last, -1, -1):
        di = dprog.instructions[idx]
        if isinstance(di, DDensity):
            if not di.diff:
                continue
            ct = ct_of[idx]
            d = 1 << len(di.positions)
            ct_m = jnp.asarray(ct).reshape(d, d).astype(fwd.dtype)
            sym = ct_m + ct_m.conj().T
            groups_hit = {gr.group_of_bit(m, p)[0] for p in di.positions}
            if len(groups_hit) == 1:
                j = groups_hit.pop()
                g = sizes[j]
                rels = tuple(p % gr.GROUP_BITS for p in di.positions)
                E = gr.expand_in_group(sym, rels, g)
                pending[j] = E if j not in pending else pending[j] + E
            else:
                seed = gr.apply_dense(fwd.conj(), sym, di.positions, m)
                bwd = seed if bwd is None else bwd + seed
            continue
        bwd = flush_seeds(fwd, bwd)
        if isinstance(di, DSwap):
            fwd = gr.to_grouped(
                dist.swap_global_block(gr.from_grouped(fwd), di.local_positions, axis), m
            )
            if bwd is not None:
                bwd = gr.to_grouped(
                    dist.swap_global_block(gr.from_grouped(bwd), di.local_positions, axis), m
                )
            continue
        if isinstance(di, DCycle):
            # inverse cycle: roles swapped
            fwd = gr.to_grouped(dist.cycle_global_block(
                gr.from_grouped(fwd), di.in_positions, di.out_positions,
                axis), m)
            if bwd is not None:
                bwd = gr.to_grouped(dist.cycle_global_block(
                    gr.from_grouped(bwd), di.in_positions, di.out_positions,
                    axis), m)
            continue
        # FSeg: reverse its fused instructions with segment-local queue cts
        vg, cg = _seg_gates(di, var_gates, const_gates)
        seg_cts: Dict[int, jax.Array] = {}
        for fi in reversed(di.ftape.instructions):
            fwd, bwd = _backward_gate_step(fi, fwd, bwd, vg, cg, sizes, m, seg_cts)
        for local_q, ct in seg_cts.items():
            var_cts[di.var_base + local_q] = ct
    bwd = flush_seeds(fwd, bwd)

    init_ref = jnp.asarray(local_state)
    state_ct = jnp.zeros_like(init_ref) if bwd is None else gr.from_grouped(bwd).astype(init_ref.dtype)

    out_var_cts = []
    for qidx, ref_gate in enumerate(var_gates):
        ref_arr = jnp.asarray(ref_gate)
        ct = var_cts.get(qidx)
        if ct is None:
            out_var_cts.append(jnp.zeros_like(ref_arr))
            continue
        summed = jax.lax.psum(ct, axis)  # grads sum over the sharded batch
        summed = summed.reshape(ref_arr.shape)
        if jnp.issubdtype(ref_arr.dtype, jnp.complexfloating):
            out_var_cts.append(summed.astype(ref_arr.dtype))
        else:
            out_var_cts.append(summed.real.astype(ref_arr.dtype))
    out_var_cts = invert_ct_perm(out_var_cts, dprog.var_perm)
    const_cts = invert_ct_perm(
        tuple(jnp.zeros_like(jnp.asarray(g)) for g in const_gates),
        dprog.const_perm)
    return state_ct, tuple(out_var_cts), const_cts


dist_fused_forward.defvjp(_fwd, _bwd)
