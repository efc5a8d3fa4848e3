"""Plane-layout layer scan: the Pallas hot path of the engine.

Same contract as :func:`dqc_tpu.circuit.scan.scanned_layers` (a gate-only
fused layer applied L times under ``lax.scan``, O(1)-memory reverse-scan
adjoint), but the state crosses the scan as two f32 planes (ops/planes.py)
and every dense block executes as a fused Pallas kernel:

* forward: blocks on the lane+sublane groups PAIR into one dual-group kernel
  sweep (up to 14 qubits of gates per HBM pass, measured 1.7x the XLA
  complex-einsum sweep on v5e); high-group blocks use the high-axis kernel;
  diagonals (in-group and cross-group) are broadcast multiplies that XLA
  fuses into neighbouring sweeps.
* backward: each dense block's uncompute + pair-gram + cotangent transport
  happens in ONE read of the (fwd, bwd) planes (block_backward kernels,
  measured 2.5x the XLA 3-matmul sequence), after which per-gate cotangents
  close in tiny 2^g matrix algebra (shared with circuit/fused_autograd.py).

The reference executes one full complex sweep per gate and three per gate in
backward (reference circuit.rs:214-429); this path replaces its entire
custom-CUDA layer 1 (primitives.cu:513-876) with TPU-native kernels.

Eligibility (:func:`plane_tape_eligible`): >=14 qubits (both minor groups
full) and complex64 — since round 2 every instruction kind executes on
planes: dense/diag blocks, diagonal crosses of any span (joint tables /
broadcast), dense crosses over two groups (per-group term accumulates),
dense gates over more groups (subblock gather/matmul/scatter), and density
requests at any positions (Gram kernels / subblock contractions).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dqc_tpu import config
from dqc_tpu.circuit.fused_autograd import (
    GateRef,
    _astype_host,
    _block_ops,
    _compose,
    _inv_dense,
    _inv_diag,
    _ref_gate,
    dense_block_var_cts,
    diag_block_var_cts,
)
from dqc_tpu.circuit.fusion import FBlock, FCross, FDensity, FusedTape
from dqc_tpu.ops import groups as gr
from dqc_tpu.ops import planes as pl

C64 = jnp.complex64


def plane_tape_eligible(ftape: FusedTape, dtype) -> bool:
    """True when the plane engine can execute this layer tape."""
    if not pl.plane_eligible(ftape.n, dtype):
        return False
    for fi in ftape.instructions:
        if isinstance(fi, FDensity):
            return False  # layer tapes are gate-only; densities -> epilogue
        # every cross-group gate is plane-executable: dense over 2 groups
        # as per-group term accumulates, dense over >2 groups as subblock
        # gather/matmul/scatter, diagonals of any span as tables/broadcast
    return True


def use_plane_engine(ftape: FusedTape, dtype) -> bool:
    mode = config.plane_engine()
    if mode is False:
        return False
    if not plane_tape_eligible(ftape, dtype):
        return False
    if mode is True:
        return True
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Instruction scheduling: pair lane/sublane dense blocks into dual sweeps
# ---------------------------------------------------------------------------

def _touched_groups(fi, n: int) -> set:
    if isinstance(fi, FBlock):
        return {fi.group}
    if isinstance(fi, FCross):
        return {gr.group_of_bit(n, p)[0] for p in fi.positions}
    return set(range(len(gr.group_sizes_low_first(n))))  # density: all


def _is_dense_minor_block(fi) -> bool:
    return isinstance(fi, FBlock) and fi.group in (0, 1) and not fi.all_diag


def schedule_dual_pairs(ftape: FusedTape) -> Tuple[Tuple[int, Optional[int]], ...]:
    """Execution order with lane/sublane dense blocks paired.

    Returns a tuple of ``(index, partner_index_or_None)``: when a dense block
    on group 0 (or 1) is followed — with no intervening instruction touching
    groups 0 or 1 — by a dense block on the other minor group, both apply in
    ONE dual kernel sweep. Instructions between the pair act on disjoint
    qubits, so hoisting the partner is exact.
    """
    instrs = ftape.instructions
    n = ftape.n
    consumed = [False] * len(instrs)
    out: List[Tuple[int, Optional[int]]] = []
    for i, fi in enumerate(instrs):
        if consumed[i]:
            continue
        partner = None
        if _is_dense_minor_block(fi):
            want = 1 - fi.group
            for j in range(i + 1, len(instrs)):
                fj = instrs[j]
                if consumed[j]:
                    continue
                if _is_dense_minor_block(fj) and fj.group == want:
                    partner = j
                    consumed[j] = True
                    break
                if _touched_groups(fj, n) & {0, 1}:
                    break
        out.append((i, partner))
        consumed[i] = True
    return tuple(out)


def plane_program(ftape: FusedTape) -> Tuple[Tuple, ...]:
    """Execution plan over the fused tape: ``('dense', i, partner_or_None)``
    kernel sweeps, ``('diag', (i1, ..., ik))`` fused diagonal runs (every
    consecutive stretch of commuting diagonals — in-group blocks and
    cross-group tables — executes as ONE aliased kernel pass,
    ops/pallas/diag.py), and ``('dens', i)`` density requests."""
    n = ftape.n
    items: List[Tuple] = []
    run: List[int] = []
    for i, j in schedule_dual_pairs(ftape):
        fi = ftape.instructions[i]
        is_diag = (isinstance(fi, FCross) and fi.diag) or (
            isinstance(fi, FBlock) and fi.all_diag)
        if is_diag:
            if (isinstance(fi, FCross) and len(
                    {gr.group_of_bit(n, p)[0] for p in fi.positions}) > 2):
                # >2-group diagonal: joint broadcast multiply ('mdiag') —
                # still commutes with the run, but its table does not fold
                # into the 3-factor diag-run form
                run.append(("m", i))
            else:
                run.append(i)
            continue
        if run:
            items.extend(_split_diag_run(run))
            run = []
        if isinstance(fi, FDensity):
            items.append(("dens", i))
        elif isinstance(fi, FCross):
            groups = {gr.group_of_bit(n, p)[0] for p in fi.positions}
            if len(groups) > 2:
                items.append(("xcross", i))  # subblock gather/matmul/scatter
            else:
                items.append(("dcross", i))  # per-group term accumulate
        else:
            items.append(("dense", i, j))
    if run:
        items.extend(_split_diag_run(run))
    items = _sink_diag_items(tuple(items), ftape)
    items = _pair_diag_into_dual(_pair_top_groups(items, ftape), ftape)
    return _pair_diag_into_high(items, ftape)


def _sink_diag_items(items: Tuple[Tuple, ...], ftape: FusedTape):
    """Commutation-aware canonicalization: move every diagonal item
    (``diag`` run / ``mdiag``) as LATE as possible — diagonals all commute
    with each other, and with dense sweeps on disjoint groups — then merge
    adjacent runs into ONE fused kernel pass. A rotations-then-entanglers
    layer (the hardware-efficient shape) collapses from one diag run per
    group stretch to a single run per layer (29q: 7 forward passes -> 4);
    an entanglers-then-rotations layer (VQE/QAOA) is left as-is for the
    ddual fold. Exact: only commuting items are reordered, so the function
    and every gradient are identical. Density readouts (``dens``) are
    barriers — nothing moves across them."""
    out: List[Tuple] = []
    for item in items:
        if item[0] in ("diag", "mdiag", "dens"):
            out.append(item)
            continue
        # equivalently: sink the trailing diagonals past this dense item
        # when their touched groups are disjoint
        k = len(out)
        touched = _item_touched(item, ftape)
        while k > 0 and out[k - 1][0] in ("diag", "mdiag") and not (
                _item_touched(out[k - 1], ftape) & touched):
            k -= 1
        out.insert(k, item)
    merged: List[Tuple] = []
    for item in out:
        if item[0] == "diag" and merged and merged[-1][0] == "diag":
            merged[-1] = ("diag", merged[-1][1] + item[1])
        else:
            merged.append(item)
    return tuple(merged)




def _pair_diag_into_dual(items: Tuple[Tuple, ...], ftape: FusedTape):
    """Fold a diagonal run ADJACENT to a minor dense sweep into one fused
    kernel item ``('ddual', run, i, j, diag_first)`` — either tape order:
    [run, dense] (the VQE/QAOA shape: entangler ring, then rotations;
    ``diag_first=True``) or [dense, run] (e.g. the distributed layer
    segment that rotates swapped-in qubits on the lane group and then runs
    their entanglers). The dual kernel multiplies the run's tables in-cell
    on the matching side and its adjoint rolls (fwd, bwd) through the run
    in the same pass, saving one full-state pass forward and two backward
    per layer."""

    def minor_dense(item):
        if item[0] != "dense":
            return False
        fi = ftape.instructions[item[1]]
        return isinstance(fi, FBlock) and fi.group in (0, 1)

    out: List[Tuple] = []
    for item in items:
        if out and out[-1][0] == "diag" and minor_dense(item):
            run = out.pop()[1]
            out.append(("ddual", run, item[1], item[2], True))
            continue
        if item[0] == "diag" and out and minor_dense(out[-1]):
            prev = out.pop()
            out.append(("ddual", item[1], prev[1], prev[2], False))
            continue
        out.append(item)
    return tuple(out)


def _item_touched(item, ftape: FusedTape) -> set:
    """Groups an execution-plan item reads or writes."""
    n = ftape.n
    if item[0] == "diag":
        out = set()
        for i in item[1]:
            out |= _touched_groups(ftape.instructions[i], n)
        return out
    if item[0] == "dhigh":
        out = _touched_groups(ftape.instructions[item[2]], n)
        for i in item[1]:
            out |= _touched_groups(ftape.instructions[i], n)
        return out
    if item[0] == "dense" and item[2] is not None:
        return (_touched_groups(ftape.instructions[item[1]], n)
                | _touched_groups(ftape.instructions[item[2]], n))
    return _touched_groups(ftape.instructions[item[1]], n)


def _pair_diag_into_high(items: Tuple[Tuple, ...], ftape: FusedTape):
    """Fold a diagonal run ADJACENT to a plain dense high-group sweep into
    one fused kernel item ``('dhigh', run, i, diag_first)`` — either tape
    order: [run, dense] (``diag_first=True``) or [dense, run]. Covers the
    shapes the ddual fold cannot reach (no minor dense sweep next to the
    run): a trailing entangler run after the layer's last high rotation
    sweep (26q hardware-efficient without the scan rotation), and the
    distributed layer segments that localize global qubits onto a high
    group — rotations sweep + entangler run in one pass (parallel/scan.py).
    Runs AFTER _pair_diag_into_dual, so minor dual folds keep priority;
    order is preserved exactly (no commutation), so the function and every
    gradient are identical."""
    n = ftape.n

    def foldable(item):
        if item[0] != "dense" or item[2] is not None:
            return None
        fi = ftape.instructions[item[1]]
        if not isinstance(fi, FBlock) or fi.all_diag:
            return None
        return item[1] if pl.dhigh_eligible(fi.group, n) else None

    out: List[Tuple] = []
    for item in items:
        if out and out[-1][0] == "diag":
            i = foldable(item)
            if i is not None:
                run = out.pop()[1]
                out.append(("dhigh", run, i, True))
                continue
        if item[0] == "diag" and out:
            i = foldable(out[-1])
            if i is not None:
                out.pop()
                out.append(("dhigh", item[1], i, False))
                continue
        out.append(item)
    return tuple(out)


def _pair_top_groups(items: Tuple[Tuple, ...], ftape: FusedTape):
    """Compose a dense block on a TINY top group with a dense block on the
    group below it into ONE merged-axis sweep ``kron(E_top, E_low)``
    (legal whenever nothing between them touches either group — dense
    blocks on distinct groups commute). At 29 qubits (groups 7,7,7,7,1)
    this turns the per-layer [dual, g2, g3, g4] four dense sweeps into
    three; the adjoint recovers both blocks' pair-grams from the merged
    256^2 gram by tiny contractions (see _backward_hpair)."""
    n = ftape.n
    dims = gr.group_dims(n)
    G = len(dims)
    jtop, jlow = G - 1, G - 2
    if jlow < 2 or dims[0] >= pl.MIN_KERNEL_X:
        return items

    def dense_group(item):
        if item[0] != "dense" or item[2] is not None:
            return None
        fi = ftape.instructions[item[1]]
        return fi.group if (isinstance(fi, FBlock) and not fi.all_diag) else None

    # The merged op sits at the EARLIER block's position — the LATER block
    # hoists backwards past the in-between items, which is exact iff none
    # of them touches the LATER block's group (the earlier block does not
    # move; reordering commuting ops leaves the function — and hence every
    # gradient — identical).
    out: List[Tuple] = []
    pending: Dict[int, Tuple[int, int]] = {}  # group -> (out idx, instr idx)
    last_touch = {jtop: -1, jlow: -1}
    for item in items:
        g = dense_group(item)
        if g in (jtop, jlow):
            other = jlow if g == jtop else jtop
            if other in pending and last_touch[g] < pending[other][0]:
                oi, ii = pending.pop(other)
                low_i, top_i = (ii, item[1]) if other == jlow else (item[1], ii)
                out[oi] = ("hpair", low_i, top_i)
                pending.pop(g, None)
                last_touch[g] = oi
                last_touch[other] = oi
                continue
            pending[g] = (len(out), item[1])
            last_touch[g] = len(out)
            out.append(item)
            continue
        touched = _item_touched(item, ftape)
        for gg in (jtop, jlow):
            if gg in touched:
                last_touch[gg] = len(out)
        out.append(item)
    return tuple(out)


def _split_diag_run(run) -> List[Tuple]:
    """A pending diagonal stretch -> ('diag', idxs) kernel runs with
    ('mdiag', i) broadcast items interleaved (order within the stretch is
    free: diagonals commute). The mdiag items come FIRST so the fused
    ('diag', ...) run stays adjacent to a following minor dense sweep and
    keeps the ddual fold (_pair_diag_into_dual)."""
    plain = tuple(i for i in run if not isinstance(i, tuple))
    items: List[Tuple] = [("mdiag", i) for kind, i in
                          (x for x in run if isinstance(x, tuple))]
    if plain:
        items.append(("diag", plain))
    return items


# ---------------------------------------------------------------------------
# Diagonal-run table composition: the run's total diagonal as three pairwise
# factors D[a, s, l] = Tas[a,s] * Tal[a,l] * Tsl[s,l] (see ops/pallas/diag.py)
# ---------------------------------------------------------------------------

class _DiagFactors:
    def __init__(self, n: int):
        self.dims = gr.group_dims(n)          # msb-first
        self.a_dims = self.dims[:-2]          # merged high groups
        self.A = int(np.prod(self.a_dims, dtype=np.int64)) if self.a_dims else 1
        self.sl = None                        # (128, 128) [s, l]
        self.a_s = None                       # (A, 128)
        self.a_l = None                       # (A, 128)
        self.lane = None                      # (128,)
        self.sub = None                       # (128,)
        self.a = None                         # (A,)

    @staticmethod
    def _m(acc, t):
        return t if acc is None else acc * t

    def _ax(self, j: int) -> int:
        # group j >= 2 sits at this index of a_dims (== index in full dims)
        return len(self.dims) - 1 - j

    def _expand_vec(self, j: int, vec):
        shape = [1] * len(self.a_dims)
        shape[self._ax(j)] = self.dims[self._ax(j)]
        return jnp.broadcast_to(jnp.asarray(vec).reshape(shape),
                                self.a_dims).reshape(-1)

    def _expand_rows(self, j: int, table2):
        shape = [1] * len(self.a_dims) + [128]
        shape[self._ax(j)] = self.dims[self._ax(j)]
        return jnp.broadcast_to(jnp.asarray(table2).reshape(shape),
                                tuple(self.a_dims) + (128,)).reshape(self.A, 128)

    def _expand_joint(self, ja: int, jb: int, table2):
        axa, axb = self._ax(ja), self._ax(jb)  # axa < axb (ja > jb)
        shape = [1] * len(self.a_dims)
        shape[axa] = self.dims[axa]
        shape[axb] = self.dims[axb]
        return jnp.broadcast_to(jnp.asarray(table2).reshape(shape),
                                self.a_dims).reshape(-1)

    def mul_group(self, j: int, vec):
        if j == 0:
            self.lane = self._m(self.lane, jnp.asarray(vec).reshape(-1))
        elif j == 1:
            self.sub = self._m(self.sub, jnp.asarray(vec).reshape(-1))
        else:
            self.a = self._m(self.a, self._expand_vec(j, vec))

    def mul_pair(self, ja: int, jb: int, table2):
        """Joint (ja, jb) cross table, ja > jb (cross_diag_table order)."""
        if (ja, jb) == (1, 0):
            self.sl = self._m(self.sl, jnp.asarray(table2))
        elif jb == 0:
            self.a_l = self._m(self.a_l, self._expand_rows(ja, table2))
        elif jb == 1:
            self.a_s = self._m(self.a_s, self._expand_rows(ja, table2))
        else:
            self.a = self._m(self.a, self._expand_joint(ja, jb, table2))

    def tables(self):
        tsl = jnp.ones((128, 128), C64)
        if self.sl is not None:
            tsl = tsl * jnp.asarray(self.sl).astype(C64)
        if self.sub is not None:
            tsl = tsl * jnp.asarray(self.sub).astype(C64)[:, None]
        if self.lane is not None:
            tsl = tsl * jnp.asarray(self.lane).astype(C64)[None, :]
        tas = jnp.ones((self.A, 128), C64)
        if self.a_s is not None:
            tas = tas * jnp.asarray(self.a_s).astype(C64)
        tal = jnp.ones((self.A, 128), C64)
        if self.a_l is not None:
            tal = tal * jnp.asarray(self.a_l).astype(C64)
        if self.a is not None:
            tal = tal * jnp.asarray(self.a).astype(C64)[:, None]
        return tsl, tas, tal


def _cross_ctx(fi: FCross) -> str:
    return (f"{'var' if fi.var else 'const'} cross-group diag gate, "
            f"queue index {fi.queue_idx}")


def _diag_run_tables(run, ftape: FusedTape, var_gates, const_gates, *,
                     inverse: bool = False):
    n = ftape.n
    sizes = gr.group_sizes_low_first(n)
    f = _DiagFactors(n)
    for i in run:
        fi = ftape.instructions[i]
        if isinstance(fi, FBlock):
            t = _block_operator(fi, var_gates, const_gates, sizes[fi.group],
                                inverse=inverse)
            f.mul_group(fi.group, t)
        else:
            d = _cross_gate(fi, var_gates, const_gates).reshape(-1)
            if inverse:
                d = _inv_diag(d, fi.unitary, _cross_ctx(fi))
            table2, ja, jb = gr.cross_diag_table(d, fi.positions, n)
            f.mul_pair(ja, jb, table2)
    return f.tables()


def _run_has_var(run, ftape: FusedTape) -> bool:
    for i in run:
        fi = ftape.instructions[i]
        if isinstance(fi, FBlock) and fi.has_var:
            return True
        if isinstance(fi, FCross) and fi.var:
            return True
    return False


def _reduce_a_rows(Qx, j: int, n: int):
    """Merged-high-axis reduction keeping group ``j``: (A, ...) ->
    (dim_j, ...) by summing every other high axis (trailing dims kept)."""
    dims = gr.group_dims(n)
    a_dims = dims[:-2]
    ax = len(dims) - 1 - j
    tail = Qx.shape[1:]
    v = Qx.reshape(tuple(a_dims) + tail)
    axes = tuple(k for k in range(len(a_dims)) if k != ax)
    return jnp.sum(v, axis=axes) if axes else v


def _reduce_a_joint(Wa, ja: int, jb: int, n: int):
    """(A,) -> (dim_ja, dim_jb) keeping the two high axes (ja > jb)."""
    dims = gr.group_dims(n)
    a_dims = dims[:-2]
    axa, axb = len(dims) - 1 - ja, len(dims) - 1 - jb
    v = Wa.reshape(a_dims)
    axes = tuple(k for k in range(len(a_dims)) if k not in (axa, axb))
    return jnp.sum(v, axis=axes) if axes else v


def _diag_run_backward(fxr, fxi, bxr, bxi, run, ftape: FusedTape,
                       var_gates, const_gates, var_cts: Dict[int, jax.Array]):
    """One aliased kernel pass for the whole run (fwd uncompute + cotangent
    transport); var-gate cotangents close from the kernel's order-invariant
    pair-product reductions: uncomputing gate g divides fwd by d_g, which
    lives only on g's own (kept) axes, so W_g = reduce(Q) * d_g^-1 — the
    exact per-gate grams the sequential path computed one sweep at a time."""
    n = ftape.n
    sizes = gr.group_sizes_low_first(n)
    has_var = _run_has_var(run, ftape)
    T = _diag_run_tables(run, ftape, var_gates, const_gates)
    Tinv = _diag_run_tables(run, ftape, var_gates, const_gates, inverse=True)
    fxr, fxi, bxr, bxi, Q = pl.backward_diag_run(
        fxr, fxi, bxr, bxi, Tinv, T, with_q=has_var, interpret=_interpret())
    if has_var:
        _diag_cts_from_Q(run, ftape, var_gates, const_gates, Q, var_cts)
    return fxr, fxi, bxr, bxi


def _diag_cts_from_Q(run, ftape: FusedTape, var_gates, const_gates, Q,
                     var_cts: Dict[int, jax.Array]):
    """Per-gate cotangents of a diagonal run from the kernel's Q pair
    reductions (see _diag_run_backward's docstring for the closure)."""
    n = ftape.n
    sizes = gr.group_sizes_low_first(n)
    Qsl, Qas, Qal = Q
    for i in run:
        fi = ftape.instructions[i]
        if isinstance(fi, FBlock):
            if not fi.has_var:
                continue
            g = sizes[fi.group]
            inv_tab = jnp.asarray(
                _block_operator(fi, var_gates, const_gates, g, inverse=True)
            ).reshape(-1).astype(C64)
            if fi.group == 0:
                W = jnp.sum(Qsl, axis=0) * inv_tab
            elif fi.group == 1:
                W = jnp.sum(Qsl, axis=1) * inv_tab
            else:
                Wa = jnp.sum(Qas, axis=1)
                W = _reduce_a_rows(Wa, fi.group, n) * inv_tab
            tables = _block_ops(fi, var_gates, const_gates, g, C64)
            diag_block_var_cts(fi, tables, W.astype(C64), var_gates,
                               const_gates, g, C64, var_cts)
        else:
            if not fi.var:
                continue
            d = _cross_gate(fi, var_gates, const_gates).reshape(-1)
            inv_t2, ja, jb = gr.cross_diag_table(
                _inv_diag(d, fi.unitary, _cross_ctx(fi)), fi.positions, n)
            if (ja, jb) == (1, 0):
                Wred = Qsl
            elif jb == 0:
                Wred = _reduce_a_rows(Qal, ja, n)
            elif jb == 1:
                Wred = _reduce_a_rows(Qas, ja, n)
            else:
                Wred = _reduce_a_joint(jnp.sum(Qas, axis=1), ja, jb, n)
            W2 = Wred.astype(C64) * jnp.asarray(inv_t2).astype(C64)
            _, vjp = jax.vjp(
                lambda dd: gr.cross_diag_table(dd, fi.positions, n)[0],
                jnp.asarray(d).astype(C64),
            )
            var_cts[fi.queue_idx] = vjp(W2)[0]


def estimate_hbm_passes(ftape: FusedTape, const_gates=None,
                        layers: Optional[int] = None) -> Tuple[float, float]:
    """(forward, backward) full-state HBM passes per layer under the plane
    engine — one pass = read+write of the full state's bytes. Used by
    bench.py to report *achieved* bandwidth (as opposed to the per-gate-sweep
    architecture-equivalent number).

    Exact for dense/diag kernel items: every dual/high/hpair sweep or fused
    diagonal run is 1 aliased pass forward; its adjoint reads and writes
    BOTH the fwd and bwd planes in one kernel = 2 passes. Dense cross-group
    items count 2 passes per decomposition term: with ``const_gates`` the
    term count is the EXECUTED one (``_dense_cross_expanded_terms`` prunes
    zero-weight terms for concrete gates — 2 for CNOT, not 4); var/traced
    gates use the positions-derived 4^ka bound. ``layers``: the scan depth
    the estimate amortizes over — the const-trailing-diag rotation (one
    pass fewer each way) only executes for >= 2 scanned layers, so a
    known depth of 1 keeps the unrotated count (None = assume deep).
    """
    program = plane_program(ftape)
    if layers is None or layers >= 2:
        rot = _rotatable_const_diag(program, ftape)
        if rot is not None:
            program = rot[1]  # amortized per-layer cost = the rotated body
    n = ftape.n
    fwd = bwd = 0.0
    for item in program:
        if item[0] == "dens":
            continue
        if item[0] == "dcross":
            fi = ftape.instructions[item[1]]
            pgrad = 1.0 if fi.var else 0.0
            if pl.backward_span_eligible(fi.positions, n):
                # one fused sweep each way (apply_cross_span fwd,
                # backward_cross_span: uncompute+gram+transport in 1 pass)
                fwd += 1.0
                bwd += 2.0  # one fused pass over both (fwd, bwd) plane pairs
                continue
            if pl.cross_pair_one_pass(fi.positions, n):
                # whole term sum in one fused kernel sweep (apply_cross_span
                # slice kernels / dual_multi / high_multi)
                fwd += 1.0
                bwd += 2.0 + pgrad
                continue
            terms = None
            if const_gates is not None and not fi.var:
                try:
                    m = _cross_dense_gate(fi, (), tuple(const_gates))
                    terms = len(_dense_cross_expanded_terms(m, fi.positions, n))
                except Exception:
                    terms = None
            if terms is None:
                by_group: Dict[int, int] = {}
                for p in fi.positions:
                    g = gr.group_of_bit(n, p)[0]
                    by_group[g] = by_group.get(g, 0) + 1
                terms = 4 ** min(by_group.values())
            fwd += 2.0 * terms
            bwd += 4.0 * terms + pgrad  # uncompute + transport + pair-grad
        elif item[0] == "xcross":
            fi = ftape.instructions[item[1]]
            pgrad = 1.0 if fi.var else 0.0
            if pl.backward_span_eligible(fi.positions, n):
                fwd += 1.0
                bwd += 2.0  # fused uncompute+gram+transport, one pass
            elif pl.cross_span_eligible(fi.positions, n):
                fwd += 1.0
                bwd += 2.0 + pgrad
            else:
                fwd += 3.0   # gather + matmul + scatter (permute sweeps)
                bwd += 7.0 + pgrad  # uncompute + pair-grad + transport
        elif item[0] == "mdiag":
            fwd += 1.0
            bwd += 3.0  # uncompute + subblock gram + transport
        else:
            # 'dense' (single/dual), 'hpair' merged, 'diag' runs and the
            # 'ddual'/'dhigh' folded sweeps: 1 aliased pass forward,
            # 2 (fwd+bwd planes) backward
            fwd += 1.0
            bwd += 2.0
    return fwd, bwd


# ---------------------------------------------------------------------------
# Per-instruction plane execution
# ---------------------------------------------------------------------------

def _block_operator(fi: FBlock, var_gates, const_gates, g: int, *,
                    inverse: bool = False, reverse: bool = False):
    ops = _block_ops(fi, var_gates, const_gates, g, C64, inverse=inverse)
    return _compose(ops, diag=fi.all_diag, reverse=reverse)


def _cross_gate(fi: FCross, var_gates, const_gates):
    return _astype_host(
        _ref_gate(GateRef(fi.var, fi.queue_idx, (), fi.diag, fi.unitary),
                  var_gates, const_gates),
        C64,
    )


def _apply_dense_item(xr, xi, i, j, ftape, var_gates, const_gates):
    n = ftape.n
    sizes = gr.group_sizes_low_first(n)
    interp = _interpret()
    fi = ftape.instructions[i]
    E = _block_operator(fi, var_gates, const_gates, sizes[fi.group])
    if j is not None:
        fj = ftape.instructions[j]
        Ep = _block_operator(fj, var_gates, const_gates, sizes[fj.group])
        E0, E1 = (E, Ep) if fi.group == 0 else (Ep, E)
        return pl.apply_dual(xr, xi, E0, E1, interpret=interp)
    return pl.apply_block(xr, xi, E, fi.group, n, interpret=interp)


# ---------------------------------------------------------------------------
# Dense cross-group (2-qubit) gates on planes
#
# G = sum_i A_i (x) B_i (operator-Schmidt, A on pos2): each term is two
# independent group-axis applies. The accumulate kernel mode chains the sum
# through ONE aliased accumulator — x is read r times (alias=False), each
# term's intermediate reuses one buffer: 3 plane-pairs live, ~2r HBM passes
# (r <= 4; 2 for CNOT/controlled-U). The reference sweeps once per 2q gate
# regardless (primitives.cu:573-620) but cannot fuse anything around it.
# ---------------------------------------------------------------------------

def _schmidt_pruned(gate4):
    """schmidt_terms with concrete zero-weight terms dropped host-side."""
    As, Bs = gr.schmidt_terms(gate4)
    ca, cb = gr.concrete_or_none(As), gr.concrete_or_none(Bs)
    if ca is not None and cb is not None:
        keep = [i for i in range(ca.shape[0])
                if np.abs(ca[i]).max() * np.abs(cb[i]).max() > 1e-12]
        return [(ca[i], cb[i]) for i in keep]
    return [(As[i], Bs[i]) for i in range(4)]


def _dense_cross_expanded_terms(gate_m, positions, n: int):
    """Exact per-group operator-product decomposition of a dense k-qubit
    gate spanning TWO groups: ``G = sum_t EA_t (on ja) * EB_t (on jb)``,
    full-group expanded.

    k = 2: operator-Schmidt (rank <= 4, SVD-pruned for constants). k >= 3:
    slice decomposition over the side with fewer gate bits — for each
    ``(qa, pa)`` a-side bit pattern pair, the a-side factor is the
    elementary ``|qa><pa|`` and the b-side factor the corresponding 2^kb
    slice of G (4^ka terms, exact for traced gates, no SVD)."""
    sizes = gr.group_sizes_low_first(n)
    k = len(positions)
    if k == 2:
        p2, p1 = positions
        j2, r2 = gr.group_of_bit(n, p2)
        j1, r1 = gr.group_of_bit(n, p1)
        return [
            (gr.expand_in_group(jnp.asarray(A), (r2,), sizes[j2]), j2,
             gr.expand_in_group(jnp.asarray(B), (r1,), sizes[j1]), j1)
            for A, B in _schmidt_pruned(gate_m)
        ]

    info = [gr.group_of_bit(n, p) for p in positions]
    group_ids = []
    for g, _ in info:
        if g not in group_ids:
            group_ids.append(g)
    assert len(group_ids) == 2, positions
    ia = [i for i, (g, _) in enumerate(info) if g == group_ids[0]]
    ib = [i for i, (g, _) in enumerate(info) if g == group_ids[1]]
    if len(ia) > len(ib):
        ia, ib = ib, ia
    ja = info[ia[0]][0]
    jb = info[ib[0]][0]
    ka, kb = len(ia), len(ib)
    rels_a = tuple(info[i][1] for i in ia)
    rels_b = tuple(info[i][1] for i in ib)

    G = jnp.asarray(gate_m).reshape((2,) * (2 * k))  # q bits .. p bits
    cG = gr.concrete_or_none(G)
    terms = []
    for qa in range(1 << ka):
        for pa in range(1 << ka):
            idx = [slice(None)] * (2 * k)
            for t, i in enumerate(ia):
                idx[i] = (qa >> (ka - 1 - t)) & 1
                idx[k + i] = (pa >> (ka - 1 - t)) & 1
            B = G[tuple(idx)].reshape(1 << kb, 1 << kb)
            if cG is not None and np.abs(np.asarray(cG[tuple(idx)])).max() < 1e-12:
                continue
            A = np.zeros((1 << ka, 1 << ka), np.complex64)
            A[qa, pa] = 1.0  # concrete: expands once, cached host-side
            terms.append(
                (gr.expand_in_group(A, rels_a, sizes[ja]), ja,
                 gr.expand_in_group(B, rels_b, sizes[jb]), jb))
    return terms


def _apply_dense_cross(xr, xi, gate_m, positions, n: int, interp, *,
                       conj: bool = False, acc0=None, out_dtype=None,
                       alias: bool = False):
    """Dense cross-group gate = per-group term decomposition. Preferred
    path: the WHOLE term sum in one fused kernel pass (pl.apply_cross_terms,
    aliased in place when ``alias`` — x is dead in the forward/adjoint
    sweeps, so no extra plane-pair is ever live). Fallback (term pairs with
    no fused kernel shape): 2 accumulate sweeps per term. ``conj``/``acc0``
    give the seed form ``acc0 + conj(G x)`` (x read-only, one aliased
    accumulator). ``out_dtype``: storage dtype of a FRESH accumulator (seed
    creation in mixed-storage mode, where the cotangent planes store
    reduced)."""
    sliced = pl.apply_cross_span(xr, xi, gate_m, positions, n,
                                 alias=alias and acc0 is None, conj=conj,
                                 acc=acc0, out_dtype=out_dtype,
                                 interpret=interp)
    if sliced is not None:
        return sliced
    terms = _dense_cross_expanded_terms(gate_m, positions, n)
    fused = pl.apply_cross_terms(xr, xi, terms, n,
                                 alias=alias and acc0 is None, conj=conj,
                                 acc=acc0, out_dtype=out_dtype,
                                 interpret=interp)
    if fused is not None:
        return fused
    acc = acc0
    for EA, ja, EB, jb in terms:
        tr, ti = pl.apply_block(xr, xi, EB, jb, n, alias=False,
                                interpret=interp)
        acc = pl.apply_block(tr, ti, EA, ja, n, acc=acc, conj=conj,
                             out_dtype=None if acc is not None else out_dtype,
                             interpret=interp)
    return acc


def _apply_xcross(xr, xi, gate_m, positions, n: int, *, alias: bool = False):
    """Dense k-qubit gate spanning >2 groups. Slice-kernel shapes (e.g.
    three bits in three high groups) run in ONE aliased pass
    (pl.apply_cross_span); the generic fallback gathers the target bits to
    the front (groups.subblocks, real-pair), does ONE (2^k, 2^k) x
    (2^k, 2^(n-k)) complex matmul on the MXU, and scatters back — the plane
    counterpart of groups.apply_dense's generic branch (reference scope
    caps at k=2, primitives.cu:573-620). ``alias`` only licenses in-place
    on the kernel path (the fallback never mutates)."""
    sliced = pl.apply_cross_span(xr, xi, gate_m, positions, n, alias=alias,
                                 interpret=_interpret())
    if sliced is not None:
        return sliced
    dims = gr.group_dims(n)
    m = jnp.asarray(gate_m).astype(C64)
    mr = m.real.astype(jnp.float32)
    mi = m.imag.astype(jnp.float32)
    Sr, restore_r = gr.subblocks_with_restore(xr.reshape(dims), positions, n)
    Si, restore_i = gr.subblocks_with_restore(xi.reshape(dims), positions, n)
    Sr, Si = pl.plane_f32(Sr), pl.plane_f32(Si)
    prec = config.matmul_precision()
    t1 = jnp.matmul(mr + mi, Sr, precision=prec)
    t2 = jnp.matmul(mi, Sr + Si, precision=prec)
    t3 = jnp.matmul(mr, Si - Sr, precision=prec)
    Yr = t1 - t2
    Yi = t1 + t3
    return (pl.plane_store(restore_r(Yr).reshape(xr.shape), xr.dtype),
            pl.plane_store(restore_i(Yi).reshape(xi.shape), xi.dtype))


def _plane_pair_grad(fxr, fxi, bxr, bxi, positions, n: int) -> jax.Array:
    """Dense cross-gate cotangent ``W[p, q] = sum_b bwd[p, b] fwd[q, b]``
    on planes (groups.pair_grad in real pairs, reference primitives.cu:219)."""
    dims = gr.group_dims(n)
    Fr = pl.plane_f32(gr.subblocks(fxr.reshape(dims), positions, n))
    Fi = pl.plane_f32(gr.subblocks(fxi.reshape(dims), positions, n))
    Br = pl.plane_f32(gr.subblocks(bxr.reshape(dims), positions, n))
    Bi = pl.plane_f32(gr.subblocks(bxi.reshape(dims), positions, n))
    prec = config.matmul_precision()
    t1 = jnp.matmul(Br + Bi, Fr.T, precision=prec)
    t2 = jnp.matmul(Bi, (Fr + Fi).T, precision=prec)
    t3 = jnp.matmul(Br, (Fi - Fr).T, precision=prec)
    return (t1 - t2) + 1j * (t1 + t3)


def _cross_dense_gate(fi: FCross, var_gates, const_gates):
    kk = 1 << len(fi.positions)
    return _cross_gate(fi, var_gates, const_gates).reshape(kk, kk)


def _hpair_ops(item, ftape, var_gates, const_gates, *, inverse=False):
    """(E_low, E_top) block operators of an hpair item."""
    sizes = gr.group_sizes_low_first(ftape.n)
    fi_low = ftape.instructions[item[1]]
    fi_top = ftape.instructions[item[2]]
    El = _block_operator(fi_low, var_gates, const_gates, sizes[fi_low.group],
                         inverse=inverse, reverse=inverse)
    Et = _block_operator(fi_top, var_gates, const_gates, sizes[fi_top.group],
                         inverse=inverse, reverse=inverse)
    return El, Et


def _ddual_order(item) -> bool:
    """diag_first flag of a ddual item (older 4-tuples = diag-first)."""
    return item[4] if len(item) > 4 else True


def _apply_ddual(xr, xi, item, ftape, var_gates, const_gates, *,
                 inverse: bool = False):
    """Fused [diag run + minor dense sweep] forward (either tape order):
    one kernel pass. ``inverse=True`` un-applies the item (inverse
    operands, flipped order) for the zero-cotangent uncompute walk."""
    n = ftape.n
    sizes = gr.group_sizes_low_first(n)
    T = _diag_run_tables(item[1], ftape, var_gates, const_gates,
                         inverse=inverse)
    fi = ftape.instructions[item[2]]
    E = _block_operator(fi, var_gates, const_gates, sizes[fi.group],
                        inverse=inverse, reverse=inverse)
    if item[3] is not None:
        fj = ftape.instructions[item[3]]
        Ep = _block_operator(fj, var_gates, const_gates, sizes[fj.group],
                             inverse=inverse, reverse=inverse)
        E0, E1 = (E, Ep) if fi.group == 0 else (Ep, E)
    else:
        E0, E1 = (E, None) if fi.group == 0 else (None, E)
    diag_first = _ddual_order(item) if not inverse else not _ddual_order(item)
    return pl.apply_dual(xr, xi, E0, E1, diag=T, diag_first=diag_first,
                         interpret=_interpret())


def _apply_dhigh_item(xr, xi, item, ftape, var_gates, const_gates, *,
                      inverse: bool = False):
    """Fused [diag run + dense high-group sweep] forward: one kernel pass.
    ``inverse=True`` un-applies the item (inverse operands, flipped order)
    for the zero-cotangent uncompute walk."""
    n = ftape.n
    sizes = gr.group_sizes_low_first(n)
    T = _diag_run_tables(item[1], ftape, var_gates, const_gates,
                         inverse=inverse)
    fi = ftape.instructions[item[2]]
    E = _block_operator(fi, var_gates, const_gates, sizes[fi.group],
                        inverse=inverse, reverse=inverse)
    diag_first = item[3] if not inverse else not item[3]
    return pl.apply_dhigh(xr, xi, E, T, fi.group, n, diag_first=diag_first,
                          interpret=_interpret())


def _apply_forward(xr, xi, program, ftape, var_gates, const_gates):
    """Gate-only forward over a plane program (no density items)."""
    for item in program:
        if item[0] == "diag":
            T = _diag_run_tables(item[1], ftape, var_gates, const_gates)
            xr, xi = pl.apply_diag_run(xr, xi, T, interpret=_interpret())
        elif item[0] == "ddual":
            xr, xi = _apply_ddual(xr, xi, item, ftape, var_gates, const_gates)
        elif item[0] == "dhigh":
            xr, xi = _apply_dhigh_item(xr, xi, item, ftape, var_gates,
                                       const_gates)
        elif item[0] == "mdiag":
            fi = ftape.instructions[item[1]]
            d = _cross_gate(fi, var_gates, const_gates).reshape(-1)
            xr, xi = pl.apply_multi_diag(xr, xi, d, fi.positions, ftape.n)
        elif item[0] == "dcross":
            fi = ftape.instructions[item[1]]
            xr, xi = _apply_dense_cross(
                xr, xi, _cross_dense_gate(fi, var_gates, const_gates),
                fi.positions, ftape.n, _interpret(), alias=True)
        elif item[0] == "xcross":
            fi = ftape.instructions[item[1]]
            xr, xi = _apply_xcross(
                xr, xi, _cross_dense_gate(fi, var_gates, const_gates),
                fi.positions, ftape.n, alias=True)
        elif item[0] == "hpair":
            El, Et = _hpair_ops(item, ftape, var_gates, const_gates)
            xr, xi = _apply_hpair(xr, xi, El, Et, ftape.n)
        else:
            assert item[0] == "dense", item
            xr, xi = _apply_dense_item(xr, xi, item[1], item[2], ftape,
                                       var_gates, const_gates)
    return xr, xi


def _apply_hpair(xr, xi, El, Et, n):
    """Forward of a merged (top, top-1) dense sweep: Kronecker-factorized
    kernel by default (the merged operator is always ``kron(Et, El)``, so
    expanding it costs ~Xt x more MXU work), expanded merged sweep under
    ``config.set_hpair_factorized(False)``."""
    if config.hpair_factorized():
        return pl.apply_merged_top_fact(xr, xi, Et, El, n,
                                        interpret=_interpret())
    return pl.apply_merged_top(xr, xi, pl.kron_ops(Et, El), n,
                               interpret=_interpret())


def _backward_program(fxr, fxi, bxr, bxi, program, ftape, var_gates,
                      const_gates, var_cts: Dict[int, jax.Array]):
    """Reverse the program: paired dense sweeps roll back in one dual kernel
    pass; each diagonal run rolls back in one aliased diag kernel pass."""
    for item in reversed(program):
        if item[0] == "diag":
            fxr, fxi, bxr, bxi = _diag_run_backward(
                fxr, fxi, bxr, bxi, item[1], ftape, var_gates, const_gates,
                var_cts)
        elif item[0] == "ddual":
            fxr, fxi, bxr, bxi = _backward_ddual(
                fxr, fxi, bxr, bxi, item, ftape, var_gates, const_gates,
                var_cts)
        elif item[0] == "dhigh":
            fxr, fxi, bxr, bxi = _backward_dhigh(
                fxr, fxi, bxr, bxi, item, ftape, var_gates, const_gates,
                var_cts)
        elif item[0] == "mdiag":
            fxr, fxi, bxr, bxi = _backward_multi_diag(
                fxr, fxi, bxr, bxi, ftape.instructions[item[1]], ftape,
                var_gates, const_gates, var_cts)
        elif item[0] == "hpair":
            fxr, fxi, bxr, bxi = _backward_hpair(
                fxr, fxi, bxr, bxi, item, ftape, var_gates, const_gates,
                var_cts)
        elif item[0] == "dcross":
            fxr, fxi, bxr, bxi = _backward_dense_cross(
                fxr, fxi, bxr, bxi, ftape.instructions[item[1]], ftape,
                var_gates, const_gates, var_cts)
        elif item[0] == "xcross":
            fxr, fxi, bxr, bxi = _backward_xcross(
                fxr, fxi, bxr, bxi, ftape.instructions[item[1]], ftape,
                var_gates, const_gates, var_cts)
        elif item[2] is None:
            fxr, fxi, bxr, bxi = _backward_step(
                fxr, fxi, bxr, bxi, ftape.instructions[item[1]], ftape,
                var_gates, const_gates, var_cts)
        else:
            fxr, fxi, bxr, bxi = _backward_dual_step(
                fxr, fxi, bxr, bxi, ftape.instructions[item[1]],
                ftape.instructions[item[2]], ftape, var_gates, const_gates,
                var_cts)
    return fxr, fxi, bxr, bxi


def _backward_hpair(fxr, fxi, bxr, bxi, item, ftape, var_gates, const_gates,
                    var_cts: Dict[int, jax.Array]):
    """Adjoint of a merged (top, top-1) dense sweep in ONE kernel pass.

    With forward order [low, top] (they commute), the sequential per-block
    pair-grams are exact restrictions of the merged gram
    ``T0m[(x4 d3), (y4 d3')] = sum_b bwd[..] fwd_in[..]``:

        T0_top[x, y] = sum_{d3 d3'} E_low[d3, d3'] T0m[(x d3), (y d3')]
        T0_low[x, y] = sum_{e d4}   E_top[e, d4]   T0m[(e x), (d4 y)]

    (gram of the top block sees fwd with only 'top' uncomputed = E_low
    applied to fwd_in; gram of the low block sees bwd after the top
    transport = E_top^T bwd — both contract into tiny matrix algebra.)"""
    n = ftape.n
    sizes = gr.group_sizes_low_first(n)
    fi_low = ftape.instructions[item[1]]
    fi_top = ftape.instructions[item[2]]
    El, Et = _hpair_ops(item, ftape, var_gates, const_gates)
    Eli, Eti = _hpair_ops(item, ftape, var_gates, const_gates, inverse=True)
    # round 5: the factorized backward now wins at BOTH production widths —
    # the round-4 Xt=2 loss was the T0_top pair-gram running as a
    # (2, N)@(N, 2) MXU dot (4/16384 of the systolic array useful); with
    # the VPU T0_top (block_backward.block_backward_merged_fact top_vpu)
    # measured v5e M=2^12 slice: Xt=2 12.7 ms vs 20.9 expanded, Xt=4 37.5
    # vs 49.2 r4-fact — see BENCHMARKS.md round 5.
    if config.hpair_factorized():
        # factorized kernel: the T0_top/T0_low restrictions come out of the
        # kernel directly (in-kernel narrow grams against the uncompute's
        # own intermediates), never materializing the (Xt*Xl)^2 merged gram
        fxr, fxi, bxr, bxi, T0_top, T0_low = pl.backward_merged_top_fact(
            fxr, fxi, bxr, bxi, Et, El, Eti, Eli, n, interpret=_interpret())
        if fi_top.has_var:
            ops = _block_ops(fi_top, var_gates, const_gates,
                             sizes[fi_top.group], C64)
            dense_block_var_cts(fi_top, ops, T0_top.astype(C64), var_gates,
                                const_gates, sizes[fi_top.group], C64,
                                var_cts)
        if fi_low.has_var:
            ops = _block_ops(fi_low, var_gates, const_gates,
                             sizes[fi_low.group], C64)
            dense_block_var_cts(fi_low, ops, T0_low.astype(C64), var_gates,
                                const_gates, sizes[fi_low.group], C64,
                                var_cts)
        return fxr, fxi, bxr, bxi
    fxr, fxi, bxr, bxi, T0m = pl.backward_merged_top(
        fxr, fxi, bxr, bxi, pl.kron_ops(Eti, Eli), pl.kron_ops(Et, El), n,
        interpret=_interpret())
    if fi_low.has_var or fi_top.has_var:
        X = 1 << sizes[fi_top.group]
        Xl = 1 << sizes[fi_low.group]
        T4 = T0m.reshape(X, Xl, X, Xl)
        if fi_top.has_var:
            T0_top = jnp.einsum("ab,xayb->xy", jnp.asarray(El).astype(C64),
                                T4.astype(C64),
                                precision=config.matmul_precision())
            ops = _block_ops(fi_top, var_gates, const_gates,
                             sizes[fi_top.group], C64)
            dense_block_var_cts(fi_top, ops, T0_top, var_gates, const_gates,
                                sizes[fi_top.group], C64, var_cts)
        if fi_low.has_var:
            T0_low = jnp.einsum("ed,exdy->xy", jnp.asarray(Et).astype(C64),
                                T4.astype(C64),
                                precision=config.matmul_precision())
            ops = _block_ops(fi_low, var_gates, const_gates,
                             sizes[fi_low.group], C64)
            dense_block_var_cts(fi_low, ops, T0_low, var_gates, const_gates,
                                sizes[fi_low.group], C64, var_cts)
    return fxr, fxi, bxr, bxi


def _backward_xcross(fxr, fxi, bxr, bxi, fi: FCross, ftape, var_gates,
                     const_gates, var_cts: Dict[int, jax.Array]):
    """Adjoint of a >2-group dense gate: span-eligible shapes run uncompute
    + pair-grad + transport as ONE fused kernel pass
    (pl.backward_cross_span); otherwise subblock uncompute with G^-1,
    pair-grad, transport with G^T (fused_autograd's FCross dense branch on
    planes, generic-positions variant)."""
    n = ftape.n
    m = _cross_dense_gate(fi, var_gates, const_gates)
    minv = _inv_dense(m, fi.unitary, _cross_ctx(fi))
    fused = pl.backward_cross_span(fxr, fxi, bxr, bxi, m, minv,
                                   fi.positions, n, interpret=_interpret())
    if fused is not None:
        fxr, fxi, bxr, bxi, W = fused
        if fi.var:
            var_cts[fi.queue_idx] = W
        return fxr, fxi, bxr, bxi
    fxr, fxi = _apply_xcross(fxr, fxi, minv, fi.positions, n, alias=True)
    if fi.var:
        var_cts[fi.queue_idx] = _plane_pair_grad(fxr, fxi, bxr, bxi,
                                                 fi.positions, n)
    bxr, bxi = _apply_xcross(bxr, bxi, m.T, fi.positions, n,
                              alias=True)
    return fxr, fxi, bxr, bxi


def _backward_multi_diag(fxr, fxi, bxr, bxi, fi: FCross, ftape, var_gates,
                         const_gates, var_cts: Dict[int, jax.Array]):
    """Adjoint of a >2-group diagonal: broadcast uncompute with d^-1,
    subblock pair-grad, transport with d (fused_autograd's diag FCross
    branch on planes)."""
    n = ftape.n
    d = _cross_gate(fi, var_gates, const_gates).reshape(-1)
    fxr, fxi = pl.apply_multi_diag(
        fxr, fxi, _inv_diag(d, fi.unitary, _cross_ctx(fi)), fi.positions, n)
    if fi.var:
        var_cts[fi.queue_idx] = pl.multi_diag_gram(fxr, fxi, bxr, bxi,
                                                   fi.positions, n)
    bxr, bxi = pl.apply_multi_diag(bxr, bxi, d, fi.positions, n)
    return fxr, fxi, bxr, bxi


def _backward_dense_cross(fxr, fxi, bxr, bxi, fi: FCross, ftape, var_gates,
                          const_gates, var_cts: Dict[int, jax.Array]):
    """Adjoint of a dense cross-group gate: uncompute with G^-1 (Schmidt
    terms), pair-grad on the restored planes, transport with G^T — the plane
    mirror of fused_autograd's FCross dense branch (reference
    circuit.rs:348-362)."""
    n = ftape.n
    interp = _interpret()
    m = _cross_dense_gate(fi, var_gates, const_gates)
    minv = _inv_dense(m, fi.unitary, _cross_ctx(fi))
    fused = pl.backward_cross_span(fxr, fxi, bxr, bxi, m, minv,
                                   fi.positions, n, interpret=interp)
    if fused is not None:
        fxr, fxi, bxr, bxi, W = fused
        if fi.var:
            var_cts[fi.queue_idx] = W
        return fxr, fxi, bxr, bxi
    fxr, fxi = _apply_dense_cross(
        fxr, fxi, minv, fi.positions,
        n, interp, alias=True)  # pair-grad reads the NEW (restored) planes
    if fi.var:
        var_cts[fi.queue_idx] = _plane_pair_grad(fxr, fxi, bxr, bxi,
                                                 fi.positions, n)
    bxr, bxi = _apply_dense_cross(bxr, bxi, m.T, fi.positions, n, interp,
                                  alias=True)
    return fxr, fxi, bxr, bxi


def _uncompute_program(fxr, fxi, program, ftape, var_gates, const_gates):
    """Roll the forward planes back through a program without a cotangent
    (zero-grad region: trailing gates / const-only epilogue segments)."""
    for item in reversed(program):
        if item[0] == "diag":
            Tinv = _diag_run_tables(item[1], ftape, var_gates, const_gates,
                                    inverse=True)
            fxr, fxi = pl.apply_diag_run(fxr, fxi, Tinv,
                                         interpret=_interpret())
            continue
        if item[0] == "ddual":
            # one fused inverse pass (inverse operands, flipped order)
            fxr, fxi = _apply_ddual(fxr, fxi, item, ftape, var_gates,
                                    const_gates, inverse=True)
            continue
        if item[0] == "dhigh":
            fxr, fxi = _apply_dhigh_item(fxr, fxi, item, ftape, var_gates,
                                         const_gates, inverse=True)
            continue
        fxr, fxi = _uncompute_only(fxr, fxi, ftape.instructions[item[1]],
                                   ftape, var_gates, const_gates)
        if len(item) > 2 and item[2] is not None:
            fxr, fxi = _uncompute_only(fxr, fxi, ftape.instructions[item[2]],
                                       ftape, var_gates, const_gates)
    return fxr, fxi


def _backward_step(fxr, fxi, bxr, bxi, fi, ftape, var_gates, const_gates,
                   var_cts: Dict[int, jax.Array]):
    """Roll (fwd, bwd) planes back through one instruction, recording var
    cotangents — the plane mirror of fused_autograd._backward_gate_step."""
    n = ftape.n
    sizes = gr.group_sizes_low_first(n)
    interp = _interpret()

    if isinstance(fi, FCross):
        d = _cross_gate(fi, var_gates, const_gates).reshape(-1)
        ctx = (f"{'var' if fi.var else 'const'} cross-group diag gate, "
               f"queue index {fi.queue_idx}")
        inv_t2, ja, jb = gr.cross_diag_table(_inv_diag(d, fi.unitary, ctx),
                                             fi.positions, n)
        fxr, fxi = pl.apply_cross_diag(fxr, fxi, inv_t2, ja, jb, n)
        if fi.var:
            W2 = pl.cross_diag_gram(fxr, fxi, bxr, bxi, ja, jb, n)
            _, vjp = jax.vjp(
                lambda dd: gr.cross_diag_table(dd, fi.positions, n)[0],
                jnp.asarray(d).astype(C64),
            )
            var_cts[fi.queue_idx] = vjp(W2.astype(C64))[0]
        t2, _, _ = gr.cross_diag_table(d, fi.positions, n)
        bxr, bxi = pl.apply_cross_diag(bxr, bxi, t2, ja, jb, n)
        return fxr, fxi, bxr, bxi

    assert isinstance(fi, FBlock)
    g = sizes[fi.group]
    if fi.all_diag:
        inv_table = _block_operator(fi, var_gates, const_gates, g, inverse=True)
        fxr, fxi = pl.apply_diag_axis(fxr, fxi, inv_table, fi.group, n)
        tables = _block_ops(fi, var_gates, const_gates, g, C64)
        if fi.has_var:
            W = pl.diag_gram_axis(fxr, fxi, bxr, bxi, fi.group, n).astype(C64)
            diag_block_var_cts(fi, tables, W, var_gates, const_gates, g, C64, var_cts)
        bxr, bxi = pl.apply_diag_axis(
            bxr, bxi, _compose(tables, diag=True), fi.group, n)
        return fxr, fxi, bxr, bxi

    Einv = _block_operator(fi, var_gates, const_gates, g, inverse=True, reverse=True)
    E = _block_operator(fi, var_gates, const_gates, g)
    fxr, fxi, bxr_n, bxi_n, T0 = pl.backward_block(
        fxr, fxi, bxr, bxi, Einv, E, fi.group, n, interpret=interp)
    if fi.has_var:
        ops = _block_ops(fi, var_gates, const_gates, g, C64)
        dense_block_var_cts(fi, ops, T0.astype(C64), var_gates, const_gates,
                            g, C64, var_cts)
    return fxr, fxi, bxr_n, bxi_n


def _backward_ddual(fxr, fxi, bxr, bxi, item, ftape, var_gates,
                    const_gates, var_cts: Dict[int, jax.Array]):
    """Adjoint of a fused [diag run + minor dense pair] in ONE kernel pass:
    the dual pair reverses exactly as _backward_dual_step, then (fwd, bwd)
    roll through the preceding diagonal run in the same pass with its Q
    reductions; per-gate cotangents close from T0l/T0s and Q."""
    from dqc_tpu.ops.pallas.block_backward import block_backward_dual

    n = ftape.n
    sizes = gr.group_sizes_low_first(n)
    run = item[1]
    fi_first = ftape.instructions[item[2]]
    fi_second = (ftape.instructions[item[3]]
                 if item[3] is not None else None)
    if fi_second is None:
        lane_fi = fi_first if fi_first.group == 0 else None
        sub_fi = fi_first if fi_first.group == 1 else None
        g0_first = fi_first.group == 0
    else:
        g0_first = fi_first.group == 0
        lane_fi = fi_first if g0_first else fi_second
        sub_fi = fi_second if g0_first else fi_first

    eye = np.eye(128, dtype=np.float32)
    zr = np.zeros((128, 128), dtype=np.float32)

    def ops_of(f, g):
        if f is None:
            return (eye, zr), (eye, zr)
        Einv = _block_operator(f, var_gates, const_gates, g, inverse=True,
                               reverse=True)
        E = _block_operator(f, var_gates, const_gates, g)
        return pl.op_planes(Einv), pl.op_planes(E)

    (e0ir, e0ii), (e0r, e0i) = ops_of(lane_fi, sizes[0])
    (e1ir, e1ii), (e1r, e1i) = ops_of(sub_fi, sizes[1])
    T = _diag_run_tables(run, ftape, var_gates, const_gates)
    Tinv = _diag_run_tables(run, ftape, var_gates, const_gates, inverse=True)
    with_q = _run_has_var(run, ftape)
    out = block_backward_dual(
        fxr, fxi, bxr, bxi, e0ir, e0ii, e0r, e0i, e1ir, e1ii, e1r, e1i,
        g0_first=g0_first, dot_mode=config.kernel_dot_mode(), bwd_dot_mode=config.bwd_kernel_dot_mode(),
        gram_dot_mode=config.gram_kernel_dot_mode(),
        diag_inv_tables=pl._diag_table_planes(Tinv),
        diag_tables=pl._diag_table_planes(T),
        diag_first_fwd=_ddual_order(item), diag_q=with_q,
        interpret=_interpret())
    fxr, fxi, bxr, bxi = out[0], out[1], out[2], out[3]
    if lane_fi is not None and lane_fi.has_var:
        ops = _block_ops(lane_fi, var_gates, const_gates, sizes[0], C64)
        dense_block_var_cts(lane_fi, ops, (out[4] + 1j * out[5]).astype(C64),
                            var_gates, const_gates, sizes[0], C64, var_cts)
    if sub_fi is not None and sub_fi.has_var:
        ops = _block_ops(sub_fi, var_gates, const_gates, sizes[1], C64)
        dense_block_var_cts(sub_fi, ops, (out[6] + 1j * out[7]).astype(C64),
                            var_gates, const_gates, sizes[1], C64, var_cts)
    if with_q:
        Q = (out[8] + 1j * out[9], out[10] + 1j * out[11],
             out[12] + 1j * out[13])
        _diag_cts_from_Q(run, ftape, var_gates, const_gates, Q, var_cts)
    return fxr, fxi, bxr, bxi


def _backward_dhigh(fxr, fxi, bxr, bxi, item, ftape, var_gates,
                    const_gates, var_cts: Dict[int, jax.Array]):
    """Adjoint of a fused [diag run + dense high-group sweep] in ONE kernel
    pass: uncompute + transport + the dense block's T0 pair-gram + the
    run's Q reductions (pl.backward_dhigh); cotangents close exactly as in
    _backward_ddual / _diag_run_backward."""
    n = ftape.n
    sizes = gr.group_sizes_low_first(n)
    run = item[1]
    fi = ftape.instructions[item[2]]
    g = sizes[fi.group]
    Einv = _block_operator(fi, var_gates, const_gates, g, inverse=True,
                           reverse=True)
    E = _block_operator(fi, var_gates, const_gates, g)
    T = _diag_run_tables(run, ftape, var_gates, const_gates)
    Tinv = _diag_run_tables(run, ftape, var_gates, const_gates, inverse=True)
    with_q = _run_has_var(run, ftape)
    fxr, fxi, bxr, bxi, T0, Q = pl.backward_dhigh(
        fxr, fxi, bxr, bxi, Einv, E, Tinv, T, fi.group, n,
        diag_first=item[3], with_q=with_q, interpret=_interpret())
    if fi.has_var:
        ops = _block_ops(fi, var_gates, const_gates, g, C64)
        dense_block_var_cts(fi, ops, T0.astype(C64), var_gates, const_gates,
                            g, C64, var_cts)
    if with_q:
        _diag_cts_from_Q(run, ftape, var_gates, const_gates, Q, var_cts)
    return fxr, fxi, bxr, bxi


def _backward_dual_step(fxr, fxi, bxr, bxi, fi_first, fi_second, ftape,
                        var_gates, const_gates, var_cts):
    """Adjoint of a paired lane+sublane dense-block dual sweep in ONE read of
    the (fwd, bwd) planes (block_backward_dual). ``fi_first`` was applied
    before ``fi_second`` in the forward."""
    from dqc_tpu.ops.pallas.block_backward import block_backward_dual

    n = ftape.n
    sizes = gr.group_sizes_low_first(n)
    g0_first = fi_first.group == 0
    lane_fi = fi_first if g0_first else fi_second
    sub_fi = fi_second if g0_first else fi_first

    E0inv = _block_operator(lane_fi, var_gates, const_gates, sizes[0],
                            inverse=True, reverse=True)
    E0 = _block_operator(lane_fi, var_gates, const_gates, sizes[0])
    E1inv = _block_operator(sub_fi, var_gates, const_gates, sizes[1],
                            inverse=True, reverse=True)
    E1 = _block_operator(sub_fi, var_gates, const_gates, sizes[1])
    e0ir, e0ii = pl.op_planes(E0inv)
    e0r, e0i = pl.op_planes(E0)
    e1ir, e1ii = pl.op_planes(E1inv)
    e1r, e1i = pl.op_planes(E1)
    fxr, fxi, bxr, bxi, t0l_r, t0l_i, t0s_r, t0s_i = block_backward_dual(
        fxr, fxi, bxr, bxi, e0ir, e0ii, e0r, e0i, e1ir, e1ii, e1r, e1i,
        g0_first=g0_first, dot_mode=config.kernel_dot_mode(), bwd_dot_mode=config.bwd_kernel_dot_mode(),
        gram_dot_mode=config.gram_kernel_dot_mode(),
        interpret=_interpret())
    if lane_fi.has_var:
        ops = _block_ops(lane_fi, var_gates, const_gates, sizes[0], C64)
        dense_block_var_cts(lane_fi, ops, (t0l_r + 1j * t0l_i).astype(C64),
                            var_gates, const_gates, sizes[0], C64, var_cts)
    if sub_fi.has_var:
        ops = _block_ops(sub_fi, var_gates, const_gates, sizes[1], C64)
        dense_block_var_cts(sub_fi, ops, (t0s_r + 1j * t0s_i).astype(C64),
                            var_gates, const_gates, sizes[1], C64, var_cts)
    return fxr, fxi, bxr, bxi


# ---------------------------------------------------------------------------
# The scanned-layers custom_vjp
# ---------------------------------------------------------------------------

import os
_SCAN_UNROLL = int(os.environ.get("DQC_SCAN_UNROLL", "1"))


def _num_layers(stacked_var_gates) -> int:
    leaves = jax.tree_util.tree_leaves(stacked_var_gates)
    return int(leaves[0].shape[0]) if leaves else 0


def _scan_unroll(n: int, stacked_var_gates) -> int:
    """Full unroll at >= config.full_unroll_qubits(): straight-line HLO lets
    the aliased Pallas kernels chain through one live (fwd, bwd) buffer set
    instead of a double-buffered while-loop carry (the 29q HBM-OOM driver,
    BENCHMARKS.md profile)."""
    if n >= config.full_unroll_qubits():
        return max(1, _num_layers(stacked_var_gates))
    return _SCAN_UNROLL


def _rotatable_const_diag(program, ftape: FusedTape):
    """Scan-rotation eligibility: the program ends with a CONST diagonal run
    that, moved to the front, ddual-folds into the layer's minor dual sweep.
    Then ``(R D)^L = D (R D)^(L-1) R``: head once, the folded body L-1
    times, the run once — saving one full-state pass per layer each way
    (29q hardware-efficient: 12 -> 9 passes/layer). Returns
    ``(head, rotated_body, diag_item)`` or None."""
    if len(program) < 2 or program[-1][0] != "diag":
        return None
    diag_item = program[-1]
    if _run_has_var(diag_item[1], ftape):
        return None
    head = program[:-1]
    rotated = _pair_diag_into_dual((diag_item,) + head, ftape)
    if not rotated or rotated[0][0] != "ddual":
        return None
    return head, rotated, diag_item


def _scan_layers_forward(xr, xi, ftape: FusedTape, program, stacked_var_gates,
                        const_gates):
    """Forward L layers of ``program`` on planes under ``lax.scan``, with
    the const-trailing-diag rotation when eligible."""
    n = ftape.n
    rot = _rotatable_const_diag(program, ftape)
    if rot is not None and _num_layers(stacked_var_gates) >= 2:
        head, rotated, diag_item = rot
        first = tuple(g[0] for g in stacked_var_gates)
        rest = tuple(g[1:] for g in stacked_var_gates)
        xr, xi = _apply_forward(xr, xi, head, ftape, first, const_gates)

        def body(carry, layer_gates):
            cr, ci = carry
            cr, ci = _apply_forward(cr, ci, rotated, ftape, layer_gates,
                                    const_gates)
            return (cr, ci), None

        (xr, xi), _ = jax.lax.scan(body, (xr, xi), rest,
                                   unroll=_scan_unroll(n, rest))
        return _apply_forward(xr, xi, (diag_item,), ftape, first, const_gates)

    def body(carry, layer_gates):
        cr, ci = carry
        cr, ci = _apply_forward(cr, ci, program, ftape, layer_gates,
                                const_gates)
        return (cr, ci), None

    (xr, xi), _ = jax.lax.scan(body, (xr, xi), stacked_var_gates,
                               unroll=_scan_unroll(n, stacked_var_gates))
    return xr, xi


def _scan_layers_backward(fxr, fxi, bxr, bxi, ftape: FusedTape, program,
                          stacked_var_gates, const_gates):
    """Reverse-scan the adjoint of L layers, mirroring the rotation of
    _scan_layers_forward. Returns ``((fxr, fxi, bxr, bxi), stacked_cts)``."""
    n = ftape.n

    def make_body(prog):
        def body(carry, layer_gates):
            cfr, cfi, cbr, cbi = carry
            var_cts: Dict[int, jax.Array] = {}
            cfr, cfi, cbr, cbi = _backward_program(
                cfr, cfi, cbr, cbi, prog, ftape, layer_gates, const_gates,
                var_cts)
            layer_cts = tuple(
                _match_ct(var_cts[q], layer_gates[q])
                for q in range(len(layer_gates)))
            return (cfr, cfi, cbr, cbi), layer_cts
        return body

    rot = _rotatable_const_diag(program, ftape)
    if rot is not None and _num_layers(stacked_var_gates) >= 2:
        head, rotated, diag_item = rot
        first = tuple(g[0] for g in stacked_var_gates)
        rest = tuple(g[1:] for g in stacked_var_gates)
        no_cts: Dict[int, jax.Array] = {}
        fxr, fxi, bxr, bxi = _backward_program(
            fxr, fxi, bxr, bxi, (diag_item,), ftape, first, const_gates,
            no_cts)
        (fxr, fxi, bxr, bxi), stacked_cts = jax.lax.scan(
            make_body(rotated), (fxr, fxi, bxr, bxi), rest,
            reverse=True, unroll=_scan_unroll(n, rest))
        var_cts0: Dict[int, jax.Array] = {}
        fxr, fxi, bxr, bxi = _backward_program(
            fxr, fxi, bxr, bxi, head, ftape, first, const_gates, var_cts0)
        first_cts = tuple(_match_ct(var_cts0[q], first[q])
                          for q in range(len(first)))
        full = tuple(jnp.concatenate([c0[None], cs], axis=0)
                     for c0, cs in zip(first_cts, stacked_cts))
        return (fxr, fxi, bxr, bxi), full

    (fxr, fxi, bxr, bxi), stacked_cts = jax.lax.scan(
        make_body(program), (fxr, fxi, bxr, bxi), stacked_var_gates,
        reverse=True, unroll=_scan_unroll(n, stacked_var_gates))
    return (fxr, fxi, bxr, bxi), stacked_cts


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def plane_scanned_layers(ftape: FusedTape, initial_state, stacked_var_gates,
                         const_gates):
    """Apply the layer L times on plane-layout state; returns the final flat
    complex statevector. Contract identical to scan.scanned_layers."""
    n = ftape.n
    program = plane_program(ftape)
    xr, xi = pl.to_planes(jnp.asarray(initial_state).astype(C64), n,
                          config.fwd_plane_dtype())
    xr, xi = _scan_layers_forward(xr, xi, ftape, program, stacked_var_gates,
                                  const_gates)
    return pl.from_planes(xr, xi, n)


def _fwd(ftape, initial_state, stacked_var_gates, const_gates):
    final = plane_scanned_layers(ftape, initial_state, stacked_var_gates,
                                 const_gates)
    return final, (final, initial_state, stacked_var_gates, const_gates)


def _bwd(ftape, residuals, ct):
    final, initial_state, stacked_var_gates, const_gates = residuals
    n = ftape.n
    program = plane_program(ftape)
    fxr, fxi = pl.to_planes(jnp.asarray(final), n, config.fwd_plane_dtype())
    bxr, bxi = _ct_to_planes(ct, n)
    (fxr, fxi, bxr, bxi), stacked_cts = _scan_layers_backward(
        fxr, fxi, bxr, bxi, ftape, program, stacked_var_gates, const_gates)
    init_ref = jnp.asarray(initial_state)
    state_ct = _state_ct_from_planes(bxr, bxi, n, init_ref.dtype)
    const_cts = tuple(jnp.zeros_like(jnp.asarray(g)) for g in const_gates)
    return state_ct, stacked_cts, const_cts


def _ct_prescale():
    """Power-of-2 prescale carried by the COTANGENT planes under "f16"
    storage: f16 has only 5 exponent bits (min normal 6.1e-5, max 65504)
    while deep statevector cotangent elements sit at ~2^-n/2. Grams,
    transports and Q-reductions are all LINEAR in the cotangent, so one
    division at each exit (gate cts, state ct) removes the scale exactly
    (powers of two round nothing). None for every other storage mode.

    S = 256, measured (18q x depth-100 vs c128 oracle, BENCHMARKS.md r5):
    S in {64, 512} -> grad rms ~1e-3 (flat); S >= 4096 CLIPS — near the
    end of the backward the cotangent concentrates toward the initial
    state, so single elements approach the full 2-norm (~||L||_2) and
    S * ||ct||_2 must stay under 65504. S=256 is clip-safe for cotangent
    2-norms up to 256 (expectation-value losses are O(n)) while keeping
    elements 2^10 below typical out of the subnormal band up to ~34q."""
    return 256.0 if config.state_storage() == "f16" else None


def _match_ct(ct, ref):
    ref = jnp.asarray(ref)
    ct = ct.reshape(ref.shape)
    s = _ct_prescale()
    if s is not None:
        ct = ct * (1.0 / s)
    if jnp.issubdtype(ref.dtype, jnp.complexfloating):
        return ct.astype(ref.dtype)
    return ct.real.astype(ref.dtype)


def _ct_to_planes(ct, n):
    """State cotangent -> bwd planes, applying the f16 prescale."""
    ct = jnp.asarray(ct).astype(C64)
    s = _ct_prescale()
    if s is not None:
        ct = ct * s
    return pl.to_planes(ct, n, config.bwd_plane_dtype())


def _state_ct_from_planes(bxr, bxi, n, dtype):
    """Bwd planes -> state cotangent, removing the f16 prescale."""
    st = pl.from_planes(bxr, bxi, n)
    s = _ct_prescale()
    if s is not None:
        st = st * (1.0 / s)
    return st.astype(dtype)


plane_scanned_layers.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Plane density epilogue
#
# The usual tail of a model is a block of density requests on the final
# state. The complex-engine path (fused_tape_forward) computes per-group
# Grams with complex einsums whose XLA real-decomposition keeps many
# full-state f32 temps live — the measured reason 29q fwd+grad exceeded HBM
# (28.27G requested, 12.27G over; profile in BENCHMARKS.md). Here the Grams
# are 3 real contractions per group straight off the planes, and the
# backward seeds ``(L + L^H) conj(psi)`` apply with the plane kernels.
# ---------------------------------------------------------------------------

def plane_epilogue_eligible(epi_ftape: FusedTape, dtype) -> bool:
    """Density-only tapes (any positions: in-group requests read cached
    Gram kernels, cross-group requests a subblock contraction)."""
    if not pl.plane_eligible(epi_ftape.n, dtype):
        return False
    return all(isinstance(fi, FDensity) for fi in epi_ftape.instructions)


def use_plane_epilogue(epi_ftape: FusedTape, dtype) -> bool:
    mode = config.plane_engine()
    if mode is False or not plane_epilogue_eligible(epi_ftape, dtype):
        return False
    if mode is True:
        return True
    return jax.default_backend() == "tpu"


def _plane_gram(xr, xi, j: int, n: int) -> jax.Array:
    """Complex group Gram in one HBM read (ops/pallas/gram.py kernels; XLA
    einsum fallback for tiny top groups)."""
    return pl.gram_axis(xr, xi, j, n, interpret=_interpret())


def _density_groups(fi: FDensity, n: int) -> set:
    return {gr.group_of_bit(n, p)[0] for p in fi.positions}


def _add_seed(pending: Dict, fi: FDensity, ct, n: int):
    """Fold one diff-density cotangent into the seed accumulators: in-group
    requests sum per-group expanded operators (key = group); cross-group
    requests keep ``(positions, sym)`` pairs (key = positions tuple) —
    their seed applies via the dense-cross/subblock path."""
    sizes = gr.group_sizes_low_first(n)
    d = 1 << len(fi.positions)
    ct_m = jnp.asarray(ct).reshape(d, d).astype(C64)
    s = _ct_prescale()
    if s is not None:
        ct_m = ct_m * s
    sym = ct_m + ct_m.conj().T
    groups = _density_groups(fi, n)
    if len(groups) == 1:
        j = groups.pop()
        rels = tuple(p % gr.GROUP_BITS for p in fi.positions)
        E = gr.expand_in_group(sym, rels, sizes[j])
        pending[j] = E if j not in pending else pending[j] + E
    else:
        key = fi.positions
        pending[key] = sym if key not in pending else pending[key] + sym


def _collect_seed_pending(epi_ftape: FusedTape, density_cts, n: int,
                          pending: Optional[Dict] = None):
    """Summed seed operators ``(L + L^H)`` from the diff-density cotangents
    of a density-only tape (fused_autograd._bwd flush_seeds)."""
    if pending is None:
        pending = {}
    it = iter(density_cts)
    for fi in epi_ftape.instructions:
        if not fi.diff:
            continue
        _add_seed(pending, fi, next(it), n)
    return pending


def _cross_density(xr, xi, positions, n: int) -> jax.Array:
    """Reduced density over positions spanning several groups:
    ``rho[p, q] = sum_b psi[p, b] conj(psi[q, b])`` via real-pair subblock
    views (groups.density's generic branch on planes, reference
    primitives.cu:779-876)."""
    dims = gr.group_dims(n)
    Sr = gr.subblocks(xr.reshape(dims), positions, n).astype(jnp.float32)
    Si = gr.subblocks(xi.reshape(dims), positions, n).astype(jnp.float32)
    prec = config.matmul_precision()
    Dr = (jnp.matmul(Sr, Sr.T, precision=prec)
          + jnp.matmul(Si, Si.T, precision=prec))
    Di = (jnp.matmul(Si, Sr.T, precision=prec)
          - jnp.matmul(Sr, Si.T, precision=prec))
    return (Dr + 1j * Di).astype(C64)


def _density_for(grams: Dict, xr, xi, fi: FDensity, n: int) -> jax.Array:
    sizes = gr.group_sizes_low_first(n)
    groups = _density_groups(fi, n)
    if len(groups) == 1:
        j = groups.pop()
        G = _gram_for(grams, xr, xi, j, n)
        rels = tuple(p % gr.GROUP_BITS for p in fi.positions)
        return gr.density_from_gram(G, rels, sizes[j])
    return _cross_density(xr, xi, fi.positions, n)


def _epilogue_density_list(epi_ftape: FusedTape, xr, xi, n: int):
    """Diff-density matrices of a density-only tape from cached per-group
    Grams (one kernel read per group; merged read for tiny top groups;
    subblock contraction for cross-group requests)."""
    grams: Dict[int, jax.Array] = {}
    return tuple(_density_for(grams, xr, xi, fi, n)
                 for fi in epi_ftape.instructions if fi.diff)


def _gram_for(grams: Dict[int, jax.Array], xr, xi, j: int, n: int):
    """Per-group Gram with caching; when the top group is tiny, ONE merged
    kernel read serves BOTH the top and the next group (partial traces)."""
    G = grams.get(j)
    if G is not None:
        return G
    njg = len(gr.group_dims(n))
    if pl.merged_top_tiny(n) and j in (njg - 1, njg - 2):
        G_low, G_top = pl.gram_merged_top(xr, xi, n, interpret=_interpret())
        grams[njg - 2] = G_low
        grams[njg - 1] = G_top
        return grams[j]
    G = _plane_gram(xr, xi, j, n)
    grams[j] = G
    return G


def _seed_apply(fxr, fxi, pending: Dict[int, jax.Array], n: int, interp,
                bxr=None, bxi=None):
    """Accumulate the density seeds ``sum_j M_j conj(psi)`` into (bxr, bxi),
    computed as ``conj(sum_j conj(M_j) psi)``: the forward planes are READ
    (``alias=False``) with no up-front negation buffer — one aliased apply
    per group would force XLA to copy the full-state input per extra
    consumer (the 2 GB neg/copy allocations in the 29q OOM profile,
    tools/mem29.py)."""
    if not pending:
        return bxr, bxi
    pending = dict(pending)
    bwd_dt = config.bwd_plane_dtype() if bxr is None else None
    njg = len(gr.group_dims(n))
    if pl.merged_top_tiny(n) and (njg - 1 in pending or njg - 2 in pending):
        # seeds are SUMS of per-group operators, so the top two groups'
        # seeds combine into ONE merged-axis operator and one pass
        dims = gr.group_dims(n)
        X, Xl = dims[0], dims[1]
        M_top = pending.pop(njg - 1, None)
        M_low = pending.pop(njg - 2, None)
        Mm = None
        if M_top is not None:
            Mm = jnp.kron(jnp.asarray(M_top), jnp.eye(Xl, dtype=C64))
        if M_low is not None:
            t = jnp.kron(jnp.eye(X, dtype=C64), jnp.asarray(M_low))
            Mm = t if Mm is None else Mm + t
        acc = None if bxr is None else (bxr, bxi)
        bxr, bxi = pl.apply_merged_top(fxr, fxi, jnp.conj(Mm), n,
                                       alias=False, conj=True, acc=acc,
                                       out_dtype=bwd_dt, interpret=interp)
        bwd_dt = None
    for key, M in pending.items():
        acc = None if bxr is None else (bxr, bxi)
        seed_dt = bwd_dt if acc is None else None
        if isinstance(key, tuple):
            # cross-group density seed: bwd += M conj(psi) = conj(conj(M) psi)
            groups = {gr.group_of_bit(n, p)[0] for p in key}
            if len(groups) <= 2 or pl.cross_span_eligible(key, n):
                bxr, bxi = _apply_dense_cross(fxr, fxi, jnp.conj(M), key, n,
                                              interp, conj=True, acc0=acc,
                                              out_dtype=seed_dt)
            else:
                yr, yi = _apply_xcross(fxr, fxi, jnp.conj(M), key, n)
                if acc is None:
                    dt = seed_dt or yr.dtype
                    bxr = pl.plane_store(pl.plane_f32(yr), dt)
                    bxi = pl.plane_store(-pl.plane_f32(yi), dt)
                else:
                    bxr = pl.plane_store(pl.plane_f32(bxr) + yr, bxr.dtype)
                    bxi = pl.plane_store(pl.plane_f32(bxi) - yi, bxi.dtype)
            continue
        bxr, bxi = pl.apply_block(fxr, fxi, jnp.conj(M), key, n, alias=False,
                                  conj=True, acc=acc, out_dtype=seed_dt,
                                  interpret=interp)
        bwd_dt = None
    return bxr, bxi


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def plane_density_epilogue(epi_ftape: FusedTape, state):
    """Diff-density matrices of a density-only tape on the final state —
    the plane-engine replacement for ``fused_tape_forward(epi, state, (), ())``."""
    densities, _ = _epilogue_fwd_impl(epi_ftape, state)
    return densities


def _epilogue_fwd_impl(epi_ftape, state):
    n = epi_ftape.n
    sizes = gr.group_sizes_low_first(n)
    xr, xi = pl.to_planes(jnp.asarray(state).astype(C64), n,
                          config.fwd_plane_dtype())
    return _epilogue_density_list(epi_ftape, xr, xi, n), (xr, xi)


def _epi_fwd(epi_ftape, state):
    densities, (xr, xi) = _epilogue_fwd_impl(epi_ftape, state)
    dtype_token = jnp.zeros((), jnp.asarray(state).dtype)
    return densities, (xr, xi, dtype_token)


def _epi_bwd(epi_ftape, residuals, density_cts):
    xr, xi, dtype_token = residuals
    state_dtype = dtype_token.dtype
    n = epi_ftape.n
    sizes = gr.group_sizes_low_first(n)
    interp = _interpret()

    # sum the (L + L^H) seed operators per group (cf. fused_autograd._bwd
    # flush_seeds), then ONE plane apply per group on conj(psi)
    pending = _collect_seed_pending(epi_ftape, density_cts, n)

    bxr, bxi = _seed_apply(xr, xi, pending, n, interp)
    if bxr is None:
        return (jnp.zeros((1 << n,), state_dtype),)
    return (_state_ct_from_planes(bxr, bxi, n, state_dtype),)


plane_density_epilogue.defvjp(_epi_fwd, _epi_bwd)


def epilogue_densities(epi_ftape: FusedTape, state):
    """Dispatcher used by models: plane epilogue when eligible, else the
    complex fused path."""
    from dqc_tpu.circuit.fused_autograd import fused_tape_forward

    if use_plane_epilogue(epi_ftape, jnp.asarray(state).dtype):
        return plane_density_epilogue(epi_ftape, state)
    return fused_tape_forward(epi_ftape, state, (), ())


# ---------------------------------------------------------------------------
# Fused scan + epilogue: the state stays plane-resident end-to-end
#
# Composing plane_scanned_layers with plane_density_epilogue crosses the
# custom_vjp boundary as a flat complex64 statevector: ~6 extra half-passes
# of conversion per step, and the final state is resident TWICE during the
# backward (the scan residual in complex AND the epilogue residual as
# planes) — 8 GB of duplicated residual at 29 qubits. This fused op keeps
# (xr, xi) planes from |0..0> to the density matrices and back.
# ---------------------------------------------------------------------------

def _scan_densities_impl(ftape: FusedTape, epi_ftape: FusedTape, initial_state,
                         stacked_var_gates, const_gates):
    n = ftape.n
    sizes = gr.group_sizes_low_first(n)
    program = plane_program(ftape)
    xr, xi = pl.to_planes(jnp.asarray(initial_state).astype(C64), n,
                          config.fwd_plane_dtype())
    xr, xi = _scan_layers_forward(xr, xi, ftape, program, stacked_var_gates,
                                  const_gates)

    return _epilogue_density_list(epi_ftape, xr, xi, n), (xr, xi)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def plane_scan_densities(ftape: FusedTape, epi_ftape: FusedTape, initial_state,
                         stacked_var_gates, const_gates):
    """Diff-density matrices of ``epi_ftape`` after applying the gate-only
    layer ``ftape`` L times — semantically ``plane_density_epilogue(epi,
    plane_scanned_layers(ftape, ...))`` without the complex round trips."""
    densities, _ = _scan_densities_impl(ftape, epi_ftape, initial_state,
                                        stacked_var_gates, const_gates)
    return densities


def _psd_fwd(ftape, epi_ftape, initial_state, stacked_var_gates, const_gates):
    densities, (xr, xi) = _scan_densities_impl(
        ftape, epi_ftape, initial_state, stacked_var_gates, const_gates)
    dtype_token = jnp.zeros((), jnp.asarray(initial_state).dtype)
    return densities, (xr, xi, dtype_token, stacked_var_gates, const_gates)


def _psd_bwd(ftape, epi_ftape, residuals, density_cts):
    fxr, fxi, dtype_token, stacked_var_gates, const_gates = residuals
    n = ftape.n
    sizes = gr.group_sizes_low_first(n)
    interp = _interpret()

    # density cotangents -> summed (L + L^H) seed operator per group, ONE
    # plane apply per group on conj(psi_final) (cf. _epi_bwd)
    pending = _collect_seed_pending(epi_ftape, density_cts, n)

    bxr, bxi = _seed_apply(fxr, fxi, pending, n, interp)
    state_dtype = dtype_token.dtype
    if bxr is None:
        state_ct = jnp.zeros((1 << n,), state_dtype)
        stacked_cts = jax.tree_util.tree_map(
            lambda g: jnp.zeros_like(jnp.asarray(g)), stacked_var_gates)
        const_cts = tuple(jnp.zeros_like(jnp.asarray(g)) for g in const_gates)
        return state_ct, stacked_cts, const_cts

    # reverse layer scan, identical to plane_scanned_layers' backward
    program = plane_program(ftape)
    (fxr, fxi, bxr, bxi), stacked_cts = _scan_layers_backward(
        fxr, fxi, bxr, bxi, ftape, program, stacked_var_gates, const_gates)
    state_ct = _state_ct_from_planes(bxr, bxi, n, state_dtype)
    const_cts = tuple(jnp.zeros_like(jnp.asarray(g)) for g in const_gates)
    return state_ct, stacked_cts, const_cts


plane_scan_densities.defvjp(_psd_fwd, _psd_bwd)


def scan_with_epilogue(ftape: FusedTape, epi_ftape: FusedTape, initial_state,
                       stacked_var_gates, const_gates):
    """Dispatcher used by models: fused plane-resident scan+epilogue when
    both tapes are eligible, else compose the two stages."""
    from dqc_tpu.circuit.scan import scanned_layers

    dtype = jnp.asarray(initial_state).dtype
    if (use_plane_engine(ftape, dtype)
            and plane_epilogue_eligible(epi_ftape, dtype)):
        return plane_scan_densities(ftape, epi_ftape, initial_state,
                                    stacked_var_gates, const_gates)
    state = scanned_layers(ftape, initial_state, stacked_var_gates, const_gates)
    return epilogue_densities(epi_ftape, state)


# ---------------------------------------------------------------------------
# Standard-state fused prologue + scan + epilogue: NO full-state complex
# buffer anywhere.
#
# Every model starts from |0..0> and never differentiates w.r.t. the initial
# state, yet the generic op above still (a) takes a 2^n complex64 input,
# (b) returns a 2^n complex64 state cotangent, and (c) pays two plane<->
# complex transposes per step — at 29 qubits that is 8 GB of dead buffers
# plus 2x2 GB transpose temps, the exact allocations in the measured 29q OOM
# (27.29G/15.75G, tools/mem29.py; BENCHMARKS.md). Here |0..0> is built AS
# planes, the const-only prologue runs on planes inside the op, and the
# backward returns gate cotangents only: live set = fwd planes + bwd planes.
# ---------------------------------------------------------------------------

def _tape_all_const(ftape: FusedTape) -> bool:
    for fi in ftape.instructions:
        if isinstance(fi, FBlock) and fi.has_var:
            return False
        if isinstance(fi, FCross) and fi.var:
            return False
        if isinstance(fi, FDensity):
            return False
    return True


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def plane_std_scan_densities(pro_ftape: Optional[FusedTape], ftape: FusedTape,
                             epi_ftape: FusedTape, pro_const_gates,
                             stacked_var_gates, const_gates):
    """Diff densities of ``epi_ftape`` after ``pro_ftape`` (const-only, may
    be None) then L layers of ``ftape``, starting from |0..0> — fully
    plane-resident, no 2^n complex buffer in the whole fwd+bwd graph."""
    densities, _ = _std_impl(pro_ftape, ftape, epi_ftape, pro_const_gates,
                             stacked_var_gates, const_gates)
    return densities


def _std_impl(pro_ftape, ftape, epi_ftape, pro_const_gates, stacked_var_gates,
              const_gates):
    n = ftape.n
    sizes = gr.group_sizes_low_first(n)
    xr, xi = pl.standard_planes(n, config.fwd_plane_dtype())
    if pro_ftape is not None:
        xr, xi = _apply_forward(xr, xi, plane_program(pro_ftape), pro_ftape,
                                (), pro_const_gates)

    program = plane_program(ftape)
    xr, xi = _scan_layers_forward(xr, xi, ftape, program, stacked_var_gates,
                                  const_gates)

    return _epilogue_density_list(epi_ftape, xr, xi, n), (xr, xi)


def _std_fwd(pro_ftape, ftape, epi_ftape, pro_const_gates, stacked_var_gates,
             const_gates):
    densities, (xr, xi) = _std_impl(pro_ftape, ftape, epi_ftape,
                                    pro_const_gates, stacked_var_gates,
                                    const_gates)
    return densities, (xr, xi, pro_const_gates, stacked_var_gates, const_gates)


def _std_bwd(pro_ftape, ftape, epi_ftape, residuals, density_cts):
    fxr, fxi, pro_const_gates, stacked_var_gates, const_gates = residuals
    n = ftape.n
    sizes = gr.group_sizes_low_first(n)
    interp = _interpret()

    pending = _collect_seed_pending(epi_ftape, density_cts, n)

    pro_cts = tuple(jnp.zeros_like(jnp.asarray(g)) for g in pro_const_gates)
    const_cts = tuple(jnp.zeros_like(jnp.asarray(g)) for g in const_gates)
    if not pending:
        stacked_cts = jax.tree_util.tree_map(
            lambda g: jnp.zeros_like(jnp.asarray(g)), stacked_var_gates)
        return pro_cts, stacked_cts, const_cts

    bxr, bxi = _seed_apply(fxr, fxi, pending, n, interp)

    # reverse layer scan stops at the prologue: it is const-only and the
    # initial state needs no cotangent, so neither state is rolled through it
    program = plane_program(ftape)
    _, stacked_cts = _scan_layers_backward(
        fxr, fxi, bxr, bxi, ftape, program, stacked_var_gates, const_gates)
    return pro_cts, stacked_cts, const_cts


plane_std_scan_densities.defvjp(_std_fwd, _std_bwd)


def std_scan_with_epilogue(pro_ftape: Optional[FusedTape], ftape: FusedTape,
                           epi_ftape: FusedTape, pro_const_gates,
                           stacked_var_gates, const_gates, *,
                           dtype=jnp.complex64):
    """Dispatcher used by models whose circuit starts from |0..0>: the fully
    plane-resident op when every stage is eligible, else the composed
    fallback (fused prologue run + scan + epilogue)."""
    from dqc_tpu.circuit.fused_autograd import fused_run
    from dqc_tpu.ops.statevector import standard_state

    pro_ok = pro_ftape is None or (plane_tape_eligible(pro_ftape, dtype)
                                   and _tape_all_const(pro_ftape))
    if (pro_ok and use_plane_engine(ftape, dtype)
            and plane_epilogue_eligible(epi_ftape, dtype)):
        return plane_std_scan_densities(pro_ftape, ftape, epi_ftape,
                                        pro_const_gates, stacked_var_gates,
                                        const_gates)
    # optimization_barrier: without it XLA constant-folds the prologue's
    # HIGHEST-precision c64 dots against the embedded |0..0> literal at
    # COMPILE time (measured 2-6.4 s slow_operation_alarm stalls per dot in
    # the 20q dryrun; grows with state size). The barrier makes the state a
    # runtime value at zero runtime cost — the prologue is one sweep.
    state = jax.lax.optimization_barrier(standard_state(ftape.n, dtype))
    if pro_ftape is not None:
        _, state = fused_run(pro_ftape, state, (), tuple(pro_const_gates))
    return scan_with_epilogue(ftape, epi_ftape, state, stacked_var_gates,
                              const_gates)


# ---------------------------------------------------------------------------
# Generic plane tape execution (the direct build() path)
#
# The scan engine above covers layered models; this executes an ARBITRARY
# fused tape — gates and density requests interleaved — on planes, making
# the Pallas kernels the default engine for any eligible circuit built
# through the reference-compatible AutoGradCircuit API (the reference's
# entire use case, circuit.py:160-202).
# ---------------------------------------------------------------------------

def plane_full_tape_eligible(ftape: FusedTape, dtype) -> bool:
    """Gates + densities: since round 2 EVERY instruction kind is
    plane-executable (dense/diag blocks, cross-group gates of any span,
    densities at any positions) — only the layout prerequisites remain
    (>= 14 qubits, complex64)."""
    return pl.plane_eligible(ftape.n, dtype)


def use_plane_tape(ftape: FusedTape, dtype) -> bool:
    mode = config.plane_engine()
    if mode is False or not plane_full_tape_eligible(ftape, dtype):
        return False
    if mode is True:
        return True
    return jax.default_backend() == "tpu"


def _trim_program(program, stop_after: Optional[int]):
    """Restrict a program to instructions with index <= stop_after. A diag
    run straddling the cut keeps only its early members (diagonals commute,
    so a subset composes exactly); a dense pair loses a late partner."""
    if stop_after is None:
        return program
    out = []
    for item in program:
        if item[0] == "diag":
            keep = tuple(i for i in item[1] if i <= stop_after)
            if keep:
                out.append(("diag", keep))
        elif item[0] in ("dens", "dcross", "mdiag", "xcross"):
            if item[1] <= stop_after:
                out.append(item)
        elif item[0] == "ddual":
            keep_run = tuple(x for x in item[1] if x <= stop_after)
            keep_dense = [x for x in (item[2], item[3])
                          if x is not None and x <= stop_after]
            whole = (keep_run == tuple(item[1])
                     and len(keep_dense) == (2 if item[3] is not None else 1))
            if whole:
                out.append(item)
            else:
                parts = []
                if keep_run:
                    parts.append(("diag", keep_run))
                if keep_dense:
                    dense = ("dense", keep_dense[0],
                             keep_dense[1] if len(keep_dense) > 1 else None)
                    parts = (parts + [dense] if _ddual_order(item)
                             else [dense] + parts)
                out.extend(parts)
        elif item[0] == "dhigh":
            keep_run = tuple(x for x in item[1] if x <= stop_after)
            keep_dense = item[2] <= stop_after
            if keep_run == tuple(item[1]) and keep_dense:
                out.append(item)
            else:
                parts = []
                if keep_run:
                    parts.append(("diag", keep_run))
                if keep_dense:
                    dense = ("dense", item[2], None)
                    parts = [dense] + parts if not item[3] else parts + [dense]
                out.extend(parts)
        elif item[0] == "hpair":
            keep = [x for x in (item[1], item[2]) if x <= stop_after]
            if len(keep) == 2:
                out.append(item)
            elif keep:
                out.append(("dense", keep[0], None))
        else:
            i, j = item[1], item[2]
            if i > stop_after:
                continue
            out.append(("dense", i, j if (j is not None and j <= stop_after) else None))
    return tuple(out)


def _plane_run_diff(ftape: FusedTape, state, var_gates, const_gates,
                    *, stop_after: Optional[int] = None):
    """Forward execution collecting diff densities; returns
    ``(densities, (xr, xi))`` with the planes at the stop point."""
    n = ftape.n
    sizes = gr.group_sizes_low_first(n)
    program = _trim_program(plane_program(ftape), stop_after)
    xr, xi = pl.to_planes(jnp.asarray(state).astype(C64), n,
                          config.fwd_plane_dtype())
    densities = []
    gram_cache: Dict[int, jax.Array] = {}
    for item in program:
        if item[0] == "dens":
            fi = ftape.instructions[item[1]]
            if fi.diff:
                densities.append(_density_for(gram_cache, xr, xi, fi, n))
            continue
        gram_cache.clear()
        if item[0] == "diag":
            T = _diag_run_tables(item[1], ftape, var_gates, const_gates)
            xr, xi = pl.apply_diag_run(xr, xi, T, interpret=_interpret())
        elif item[0] == "ddual":
            xr, xi = _apply_ddual(xr, xi, item, ftape, var_gates, const_gates)
        elif item[0] == "dhigh":
            xr, xi = _apply_dhigh_item(xr, xi, item, ftape, var_gates,
                                       const_gates)
        elif item[0] == "mdiag":
            fi = ftape.instructions[item[1]]
            xr, xi = pl.apply_multi_diag(
                xr, xi, _cross_gate(fi, var_gates, const_gates).reshape(-1),
                fi.positions, n)
        elif item[0] == "dcross":
            fi = ftape.instructions[item[1]]
            xr, xi = _apply_dense_cross(
                xr, xi, _cross_dense_gate(fi, var_gates, const_gates),
                fi.positions, n, _interpret(), alias=True)
        elif item[0] == "xcross":
            fi = ftape.instructions[item[1]]
            xr, xi = _apply_xcross(
                xr, xi, _cross_dense_gate(fi, var_gates, const_gates),
                fi.positions, n, alias=True)
        elif item[0] == "hpair":
            El, Et = _hpair_ops(item, ftape, var_gates, const_gates)
            xr, xi = _apply_hpair(xr, xi, El, Et, n)
        else:
            xr, xi = _apply_dense_item(xr, xi, item[1], item[2], ftape,
                                       var_gates, const_gates)
    return tuple(densities), (xr, xi)


def _uncompute_only(fxr, fxi, fi, ftape, var_gates, const_gates):
    """Roll the forward planes back through one instruction without touching
    a cotangent (the reference's trailing-gate path, circuit.rs:327-332)."""
    n = ftape.n
    sizes = gr.group_sizes_low_first(n)
    interp = _interpret()
    if isinstance(fi, FCross):
        if not fi.diag:
            m = _cross_dense_gate(fi, var_gates, const_gates)
            minv = _inv_dense(m, fi.unitary, _cross_ctx(fi))
            groups = {gr.group_of_bit(n, p)[0] for p in fi.positions}
            if len(groups) > 2:
                return _apply_xcross(fxr, fxi, minv, fi.positions, n,
                                     alias=True)
            return _apply_dense_cross(fxr, fxi, minv, fi.positions, n,
                                      interp, alias=True)
        d = _cross_gate(fi, var_gates, const_gates).reshape(-1)
        ctx = f"cross-group diag gate, queue index {fi.queue_idx}"
        dinv = _inv_diag(d, fi.unitary, ctx)
        if len({gr.group_of_bit(n, p)[0] for p in fi.positions}) > 2:
            return pl.apply_multi_diag(fxr, fxi, dinv, fi.positions, n)
        inv_t2, ja, jb = gr.cross_diag_table(dinv, fi.positions, n)
        return pl.apply_cross_diag(fxr, fxi, inv_t2, ja, jb, n)
    g = sizes[fi.group]
    if fi.all_diag:
        inv_table = _block_operator(fi, var_gates, const_gates, g, inverse=True)
        return pl.apply_diag_axis(fxr, fxi, inv_table, fi.group, n)
    Einv = _block_operator(fi, var_gates, const_gates, g, inverse=True, reverse=True)
    return pl.apply_block(fxr, fxi, Einv, fi.group, n, interpret=interp)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def plane_tape_forward(ftape: FusedTape, initial_state, var_gates, const_gates):
    """Differentiable plane-engine execution of a full fused tape, returning
    the diff-density matrices — the Pallas counterpart of
    fused_autograd.fused_tape_forward (same contract)."""
    densities, _ = _plane_run_diff(ftape, initial_state, var_gates, const_gates)
    return densities


def _pt_fwd(ftape, initial_state, var_gates, const_gates):
    last = ftape.last_diff_density_index()
    densities, (xr, xi) = _plane_run_diff(
        ftape, initial_state, var_gates, const_gates,
        stop_after=last if last >= 0 else -1)
    if last < 0:
        xr, xi = pl.to_planes(jnp.asarray(initial_state).astype(C64), ftape.n,
                              config.fwd_plane_dtype())
    dtype_token = jnp.zeros((), jnp.asarray(initial_state).dtype)
    return densities, (xr, xi, dtype_token, var_gates, const_gates)


def _pt_bwd(ftape, residuals, density_cts):
    fxr, fxi, dtype_token, var_gates, const_gates = residuals
    n = ftape.n
    sizes = gr.group_sizes_low_first(n)
    last = ftape.last_diff_density_index()
    interp = _interpret()

    diff_indices = [
        i for i, fi in enumerate(ftape.instructions)
        if isinstance(fi, FDensity) and fi.diff
    ]
    ct_of = dict(zip(diff_indices, density_cts))

    bxr = bxi = None
    var_cts: Dict[int, jax.Array] = {}
    pending: Dict[int, jax.Array] = {}  # group -> summed seed operator

    def flush_seeds(fxr, fxi, bxr, bxi):
        # all density cotangents at one circuit point seed the same
        # conj(psi): sum the (L + L^H) operators per group, apply ONCE per
        # group on planes (fused_autograd._bwd flush_seeds, on planes)
        bxr, bxi = _seed_apply(fxr, fxi, pending, n, interp, bxr, bxi)
        pending.clear()
        return bxr, bxi

    # exact reverse of the (trimmed) forward execution plan
    program = _trim_program(plane_program(ftape), last if last >= 0 else -1)
    for item in reversed(program):
        if item[0] == "dens":
            fi = ftape.instructions[item[1]]
            if not fi.diff:
                continue
            _add_seed(pending, fi, ct_of[item[1]], n)
            continue

        bxr, bxi = flush_seeds(fxr, fxi, bxr, bxi)
        if bxr is None:
            # before any seed: uncompute only (zero-grad trailing gates)
            fxr, fxi = _uncompute_program(fxr, fxi, (item,), ftape,
                                          var_gates, const_gates)
            continue
        fxr, fxi, bxr, bxi = _backward_program(
            fxr, fxi, bxr, bxi, (item,), ftape, var_gates, const_gates,
            var_cts)
    bxr, bxi = flush_seeds(fxr, fxi, bxr, bxi)

    state_dtype = dtype_token.dtype
    if bxr is None:
        state_ct = jnp.zeros((1 << n,), state_dtype)
    else:
        state_ct = _state_ct_from_planes(bxr, bxi, n, state_dtype)

    out_var_cts = []
    for qidx, ref_gate in enumerate(var_gates):
        ref_arr = jnp.asarray(ref_gate)
        ct = var_cts.get(qidx)
        if ct is None:
            out_var_cts.append(jnp.zeros_like(ref_arr))
        else:
            out_var_cts.append(_match_ct(ct, ref_arr))
    const_cts = tuple(jnp.zeros_like(jnp.asarray(g_)) for g_ in const_gates)
    return state_ct, tuple(out_var_cts), const_cts


plane_tape_forward.defvjp(_pt_fwd, _pt_bwd)
