"""Fused-tape execution + blockwise O(1)-memory adjoint.

Executes a :class:`~dqc_tpu.circuit.fusion.FusedTape` on the grouped-axis
engine (ops/groups.py) and differentiates it with the same
uncompute-instead-of-checkpoint strategy as the per-gate adjoint
(circuit/autograd.py; reference src/circuit.rs:266-429) — but at block
granularity:

* forward: one sweep per fused block (vs one per gate in the reference);
* backward per block: one uncompute sweep (composed inverse operator), one
  cotangent-transport sweep, and — for every var gate in the block at once —
  ONE pair-contraction sweep ``T0[x,y] = sum_b bwd[x,b] fwd[y,b]``; each
  per-gate cotangent then closes in ``2^g x 2^g`` matrix algebra:
  ``G_full_ct = After^T @ T0 @ Before^T`` projected back through the gate
  expansion's exact vjp. Backward cost drops from ~3 sweeps/gate to
  ~3 sweeps/block (the fw+bw gate-fusion idea, cf. PAPERS.md).

Numerically identical to the unfused path (same convention as plain JAX AD);
parity is enforced by tests/test_fused.py.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dqc_tpu import config
from dqc_tpu.circuit.fusion import FBlock, FCross, FDensity, FusedTape, GateRef
from dqc_tpu.ops import groups as gr
from dqc_tpu.ops import inversion


# ---------------------------------------------------------------------------
# Per-ref operators
#
# Constant gates stay host-side numpy end to end: ops/groups.py expands them
# with value-memoization (identical const gates share one embedded program
# constant), and the inverse/adjoint variants below are likewise computed in
# numpy for constants — TPU backends cannot fetch device-computed complex
# arrays for constant embedding.
# ---------------------------------------------------------------------------

def _ref_gate(ref: GateRef, var_gates, const_gates):
    return var_gates[ref.queue_idx] if ref.var else const_gates[ref.queue_idx]


def _inv_dense(m, unitary: bool, ctx: str = "gate"):
    return inversion.invert_gate(m, unitary, ctx)


def _inv_diag(d, unitary: bool, ctx: str = "diag gate"):
    return inversion.invert_diag(d, unitary, ctx)


def _ref_ctx(ref: GateRef) -> str:
    return f"{'var' if ref.var else 'const'} gate, queue index {ref.queue_idx}"


def _diag_to_dense(table):
    c = gr.concrete_or_none(table)
    if c is not None:
        return gr._cached(("diagm", c.tobytes(), c.dtype.str), lambda: np.diag(c))
    return jnp.diag(table)


def _ref_op(ref: GateRef, gate, g: int, *, inverse: bool = False):
    """Full-group operator of one gate occurrence (dense 2^g x 2^g)."""
    k = len(ref.rel_positions)
    if ref.diag:
        return _diag_to_dense(_ref_table(ref, gate, g, inverse=inverse))
    m = gate.reshape(1 << k, 1 << k)
    if inverse:
        m = _inv_dense(m, ref.unitary, _ref_ctx(ref))
    return gr.expand_in_group(m, ref.rel_positions, g)


def _ref_table(ref: GateRef, gate, g: int, *, inverse: bool = False):
    """Full-group diagonal table of one diag gate occurrence."""
    d = gate.reshape(-1)
    if inverse:
        d = _inv_diag(d, ref.unitary, _ref_ctx(ref))
    return gr.expand_diag_in_group(d, ref.rel_positions, g)


def _block_ops(block: FBlock, var_gates, const_gates, g: int, dtype,
               *, inverse: bool = False) -> List[jax.Array]:
    ops = []
    for ref in block.gates:
        gate = _astype_host(_ref_gate(ref, var_gates, const_gates), dtype)
        if block.all_diag:
            ops.append(_ref_table(ref, gate, g, inverse=inverse))
        else:
            ops.append(_ref_op(ref, gate, g, inverse=inverse))
    return ops


def _host_eye(g, dtype):
    return np.eye(1 << g, dtype=np.dtype(dtype))


def _host_ones(g, dtype):
    return np.ones(1 << g, dtype=np.dtype(dtype))


def _astype_host(x, dtype):
    c = gr.concrete_or_none(x)
    if c is not None:
        return c.astype(dtype)
    return x.astype(dtype)


def _opmul(a, b):
    """Operator-space product at config precision. Plain ``@`` on traced
    values runs at XLA's DEFAULT matmul precision — bf16 passes on the TPU
    MXU, which makes a composed block operator non-unitary at the 1e-2
    level (measured sv range [0.9954, 1.0118] for 7 composed 1q lane
    expansions); a variational optimizer then mines that non-unitarity for
    unbounded "energy" (E < exact ground at 20q x 26L). Host numpy pairs
    multiply exactly in f32/f64 and skip the kwarg."""
    if isinstance(a, np.ndarray) and isinstance(b, np.ndarray):
        return a @ b
    return jnp.matmul(a, b, precision=config.matmul_precision())


def _compose(ops: List[jax.Array], *, diag: bool, reverse: bool = False) -> jax.Array:
    """Total block operator. ``reverse=True`` composes the inverse order
    (for uncompute: ``(E_m...E_1)^-1 = E_1^-1 ... E_m^-1``)."""
    if diag:
        total = ops[0]
        for o in ops[1:]:
            total = total * o
        return total
    total = ops[0]
    for o in ops[1:]:
        total = _opmul(total, o) if reverse else _opmul(o, total)
    return total


def _apply_block(t, block: FBlock, ops: List[jax.Array], *, reverse: bool = False):
    if block.all_diag:
        return gr.apply_group_diag(t, _compose(ops, diag=True), block.group)
    return gr.apply_group_matrix(t, _compose(ops, diag=False, reverse=reverse), block.group)


# ---------------------------------------------------------------------------
# Forward execution
# ---------------------------------------------------------------------------

def fused_run(
    ftape: FusedTape,
    state: jax.Array,
    var_gates,
    const_gates,
    *,
    only_diff: bool = False,
    stop_after: Optional[int] = None,
) -> Tuple[Tuple[jax.Array, ...], jax.Array]:
    n = ftape.n
    t = gr.to_grouped(jnp.asarray(state), n)
    sizes = gr.group_sizes_low_first(n)
    densities: List[jax.Array] = []
    gram_cache: dict = {}  # per-group Grams shared by densities at one point
    for idx, fi in enumerate(ftape.instructions):
        if stop_after is not None and idx > stop_after:
            break
        if isinstance(fi, FDensity):
            if fi.diff or not only_diff:
                densities.append(gr.density_cached(t, fi.positions, n, gram_cache))
        elif isinstance(fi, FBlock):
            gram_cache.clear()
            ops = _block_ops(fi, var_gates, const_gates, sizes[fi.group], t.dtype)
            t = _apply_block(t, fi, ops)
        elif isinstance(fi, FCross):
            gram_cache.clear()
            gate = _astype_host(
                _ref_gate(
                    GateRef(fi.var, fi.queue_idx, (), fi.diag, fi.unitary),
                    var_gates, const_gates,
                ),
                t.dtype,
            )
            if fi.diag:
                t = gr.apply_diag(t, gate.reshape(-1), fi.positions, n)
            else:
                t = gr.apply_dense(t, gate, fi.positions, n)
        else:
            raise AssertionError(fi)
    return tuple(densities), gr.from_grouped(t)


# ---------------------------------------------------------------------------
# custom_vjp
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_tape_forward(ftape: FusedTape, initial_state, var_gates, const_gates):
    """Differentiable fused execution returning the diff-density matrices."""
    densities, _ = fused_run(ftape, initial_state, var_gates, const_gates, only_diff=True)
    return densities


def _fwd(ftape: FusedTape, initial_state, var_gates, const_gates):
    last = ftape.last_diff_density_index()
    densities, state = fused_run(
        ftape, initial_state, var_gates, const_gates,
        only_diff=True, stop_after=last if last >= 0 else -1,
    )
    if last < 0:
        state = jnp.asarray(initial_state)
    return densities, (state, initial_state, var_gates, const_gates)


def _backward_gate_step(fi, fwd, bwd, var_gates, const_gates, sizes, n, var_cts):
    """Roll (fwd, bwd) back through one gate instruction (FCross/FBlock),
    recording var-gate cotangents in ``var_cts``. ``bwd`` may be None
    (exact zero, before any density seed)."""
    if isinstance(fi, FCross):
        gate = _astype_host(
            _ref_gate(
                GateRef(fi.var, fi.queue_idx, (), fi.diag, fi.unitary),
                var_gates, const_gates,
            ),
            fwd.dtype,
        )
        ctx = (f"{'var' if fi.var else 'const'} cross-group gate, "
               f"queue index {fi.queue_idx}")
        if fi.diag:
            d = gate.reshape(-1)
            fwd = gr.apply_diag(fwd, _inv_diag(d, fi.unitary, ctx), fi.positions, n)
            if fi.var and bwd is not None:
                var_cts[fi.queue_idx] = gr.diag_pair_grad(fwd, bwd, fi.positions, n)
            if bwd is not None:
                bwd = gr.apply_diag(bwd, d, fi.positions, n)
        else:
            kk = 1 << len(fi.positions)
            m = gate.reshape(kk, kk)
            fwd = gr.apply_dense(fwd, _inv_dense(m, fi.unitary, ctx), fi.positions, n)
            if fi.var and bwd is not None:
                var_cts[fi.queue_idx] = gr.pair_grad(fwd, bwd, fi.positions, n)
            if bwd is not None:
                bwd = gr.apply_dense(bwd, m.T, fi.positions, n)
        return fwd, bwd

    # FBlock
    g = sizes[fi.group]
    inv_ops = _block_ops(fi, var_gates, const_gates, g, fwd.dtype, inverse=True)

    if fi.all_diag:
        fwd = gr.apply_group_diag(fwd, _compose(inv_ops, diag=True), fi.group)
        tables = None
        if fi.has_var and bwd is not None:
            tables = _block_ops(fi, var_gates, const_gates, g, fwd.dtype)
            W = gr.group_diag_gram(fwd, bwd, fi.group)
            diag_block_var_cts(fi, tables, W, var_gates, const_gates, g,
                               fwd.dtype, var_cts)
        if bwd is not None:
            if tables is None:
                tables = _block_ops(fi, var_gates, const_gates, g, fwd.dtype)
            bwd = gr.apply_group_diag(bwd, _compose(tables, diag=True), fi.group)
        return fwd, bwd

    # dense (or mixed) block
    fwd = gr.apply_group_matrix(fwd, _compose(inv_ops, diag=False, reverse=True), fi.group)
    ops = None
    if fi.has_var and bwd is not None:
        ops = _block_ops(fi, var_gates, const_gates, g, fwd.dtype)
        T0 = gr.group_pair_gram(fwd, bwd, fi.group)
        dense_block_var_cts(fi, ops, T0, var_gates, const_gates, g,
                            fwd.dtype, var_cts)
    if bwd is not None:
        if ops is None:
            ops = _block_ops(fi, var_gates, const_gates, g, fwd.dtype)
        bwd = gr.apply_group_matrix(bwd, _compose(ops, diag=False).T, fi.group)

    return fwd, bwd


def diag_block_var_cts(fi: FBlock, tables, W, var_gates, const_gates, g: int,
                       dtype, var_cts) -> None:
    """Close each var gate's cotangent of an all-diag block from the block
    gradient source ``W[x] = sum_b bwd[x, b] fwd_in[x, b]`` — tiny 2^g-vector
    algebra (prefix/suffix products of the other tables + the exact vjp of
    the diagonal expansion). Shared by the complex and plane-layout engines."""
    m = len(tables)
    prefix = [None] * (m + 1)
    prefix[0] = _host_ones(g, dtype)
    for i in range(m):
        prefix[i + 1] = prefix[i] * tables[i]
    suffix = [None] * (m + 1)
    suffix[m] = _host_ones(g, dtype)
    for i in range(m - 1, -1, -1):
        suffix[i] = suffix[i + 1] * tables[i]
    for i, ref in enumerate(fi.gates):
        if not ref.var:
            continue
        full_ct = W * prefix[i] * suffix[i + 1]
        gate = _astype_host(_ref_gate(ref, var_gates, const_gates), dtype)
        _, vjp = jax.vjp(
            lambda dd, r=ref: gr._expand_diag_impl(jnp, dd, r.rel_positions, g),
            jnp.asarray(gate).reshape(-1),
        )
        var_cts[ref.queue_idx] = vjp(full_ct)[0]


def dense_block_var_cts(fi: FBlock, ops, T0, var_gates, const_gates, g: int,
                        dtype, var_cts) -> None:
    """Close each var gate's cotangent of a dense/mixed block from the pair
    gram ``T0[x, y] = sum_b bwd[x, b] fwd_in[y, b]``: the full-group operator
    cotangent of gate ``i`` is ``suffix_i^T T0 prefix_i^T`` (2^g x 2^g matrix
    algebra), projected through the gate expansion's exact vjp. Shared by the
    complex and plane-layout engines."""
    m = len(ops)
    prefix = [None] * (m + 1)
    prefix[0] = _host_eye(g, dtype)
    for i in range(m):
        prefix[i + 1] = _opmul(ops[i], prefix[i])
    # suffix[i] = E_{m-1} ... E_{i+1}  (operators applied after gate i)
    suffix = [None] * m
    suffix[m - 1] = _host_eye(g, dtype)
    for i in range(m - 2, -1, -1):
        suffix[i] = _opmul(suffix[i + 1], ops[i + 1])
    for i, ref in enumerate(fi.gates):
        if not ref.var:
            continue
        full_ct = _opmul(_opmul(suffix[i].T, T0), prefix[i].T)
        gate = _astype_host(_ref_gate(ref, var_gates, const_gates), dtype)
        _, vjp = jax.vjp(
            lambda x, r=ref: _ref_op(r, x.astype(dtype), g),
            jnp.asarray(gate),
        )
        var_cts[ref.queue_idx] = vjp(full_ct)[0]


def _bwd(ftape: FusedTape, residuals, density_cts):
    state, initial_state, var_gates, const_gates = residuals
    n = ftape.n
    sizes = gr.group_sizes_low_first(n)
    last = ftape.last_diff_density_index()

    diff_indices = [
        i for i, fi in enumerate(ftape.instructions)
        if isinstance(fi, FDensity) and fi.diff
    ]
    ct_of = dict(zip(diff_indices, density_cts))

    fwd = gr.to_grouped(jnp.asarray(state), n)
    bwd = None
    var_cts: Dict[int, jax.Array] = {}
    pending: Dict[int, jax.Array] = {}  # group -> summed seed operator

    def flush_seeds(fwd, bwd):
        # All density cotangents at one circuit point seed the same conj(fwd):
        # sum the expanded (L + L^H) operators per group and apply ONCE per
        # group — O(groups) sweeps and live buffers instead of O(densities)
        # (28 independent full-state seeds kept 51 GB of HLO temps alive at
        # 28 qubits before this).
        if not pending:
            return bwd
        conj = fwd.conj()
        for j, M in pending.items():
            seed = gr.apply_group_matrix(conj, M, j)
            bwd = seed if bwd is None else bwd + seed
        pending.clear()
        return bwd

    for idx in range(last, -1, -1):
        fi = ftape.instructions[idx]

        if isinstance(fi, FDensity):
            if not fi.diff:
                continue
            ct = ct_of[idx]
            d = 1 << len(fi.positions)
            ct_m = jnp.asarray(ct).reshape(d, d).astype(fwd.dtype)
            sym = ct_m + ct_m.conj().T
            groups_hit = {gr.group_of_bit(n, p)[0] for p in fi.positions}
            if len(groups_hit) == 1:
                j = groups_hit.pop()
                g = sizes[j]
                rels = tuple(p % gr.GROUP_BITS for p in fi.positions)
                E = gr.expand_in_group(sym, rels, g)
                pending[j] = E if j not in pending else pending[j] + E
            else:
                seed = gr.apply_dense(fwd.conj(), sym, fi.positions, n)
                bwd = seed if bwd is None else bwd + seed
            continue

        bwd = flush_seeds(fwd, bwd)
        fwd, bwd = _backward_gate_step(
            fi, fwd, bwd, var_gates, const_gates, sizes, n, var_cts
        )
    bwd = flush_seeds(fwd, bwd)

    init_ref = jnp.asarray(initial_state)
    if bwd is None:
        state_ct = jnp.zeros_like(init_ref)
    else:
        state_ct = gr.from_grouped(bwd).astype(init_ref.dtype)

    out_var_cts = []
    for qidx, ref_gate in enumerate(var_gates):
        ref_arr = jnp.asarray(ref_gate)
        ct = var_cts.get(qidx)
        if ct is None:
            out_var_cts.append(jnp.zeros_like(ref_arr))
        else:
            ct = ct.reshape(ref_arr.shape)
            if jnp.issubdtype(ref_arr.dtype, jnp.complexfloating):
                out_var_cts.append(ct.astype(ref_arr.dtype))
            else:
                out_var_cts.append(ct.real.astype(ref_arr.dtype))
    const_cts = tuple(jnp.zeros_like(jnp.asarray(g_)) for g_ in const_gates)
    return state_ct, tuple(out_var_cts), const_cts


fused_tape_forward.defvjp(_fwd, _bwd)
