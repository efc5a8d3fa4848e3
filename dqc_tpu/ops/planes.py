"""Plane-layout statevector ops: complex64 state as two f32 planes.

The Pallas TPU kernels (ops/pallas/) cannot take complex refs (Mosaic
limitation), and extracting real/imag planes per call would cost the very
HBM sweeps the kernels save. So inside the scan hot path
(circuit/plane_scan.py) the state *lives* as a pair of float32 planes

    ``(xr, xi)``, each of shape ``(A, 128, 128)``, ``A = 2^(n-14)``,

i.e. the canonical grouped view (ops/groups.py: lane group = qubits 0..6 on
the last axis, sublane group = 7..13 on the middle axis, all higher groups
merged msb-first into the leading axis). Conversion happens once at scan
entry/exit.

Op mapping (one HBM pass each):
* dense block on groups 0+1   -> dual-group Pallas kernel (Karatsuba matmuls)
* dense block on group j >= 2 -> high-axis Pallas kernel (or a real-pair XLA
  einsum for tiny top groups)
* any diagonal (in-group or cross-group) -> broadcast real-pair elementwise
  multiply (XLA fuses adjacent diagonals into one sweep)
* blockwise adjoint step      -> one-pass block_backward kernels: uncompute
  + pair-gram + cotangent transport in a single read of (fwd, bwd)
  (the reference needs three separate sweeps per *gate*, circuit.rs:266-429)

Everything here is jit-traceable; kernels run under ``interpret=True`` on
CPU for tests.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dqc_tpu import config
from dqc_tpu.ops import groups as gr
from dqc_tpu.ops.pallas.dual_apply import (
    dual_group_apply_planes,
    dual_multi_apply_planes,
)
from dqc_tpu.ops.pallas.high_apply import (
    high_group_apply_planes,
    high_multi_apply_planes,
    merged_fact_apply_planes,
)
from dqc_tpu.ops.pallas.block_backward import (
    block_backward_high,
    block_backward_lane,
    block_backward_merged_fact,
    block_backward_sublane,
)
from dqc_tpu.ops.pallas.diag import diag_backward_planes, diag_sweep_planes
from dqc_tpu.ops.pallas.gram import gram_high, gram_lane, gram_sublane

F32 = jnp.float32

# a high-group Pallas kernel needs a Mosaic-tileable operator; smaller top
# groups fall back to a real-pair XLA einsum (still on planes, no conversion)
MIN_KERNEL_X = 8


def plane_eligible(n: int, dtype) -> bool:
    """Plane layout requires both minor groups full (n >= 14) and f32."""
    return n >= 14 and jnp.dtype(dtype) == jnp.dtype(jnp.complex64)


def plane_shape(n: int) -> Tuple[int, int, int]:
    return (1 << (n - 14), 128, 128)


def enc16(x: jax.Array) -> jax.Array:
    """XLA-level f32 -> f16-bit u16 (the "f16" storage codec outside
    kernels: XLA supports float16 natively, Mosaic does not — in-kernel
    conversion is ops/pallas/common.f32_of / store_as)."""
    return jax.lax.bitcast_convert_type(
        x.astype(jnp.float16), jnp.uint16)


def dec16(x: jax.Array) -> jax.Array:
    """XLA-level f16-bit u16 -> f32."""
    return jax.lax.bitcast_convert_type(x, jnp.float16).astype(F32)


def plane_f32(x: jax.Array) -> jax.Array:
    """Plane of ANY storage dtype -> f32 values (decodes u16 f16-bits)."""
    if x.dtype == jnp.uint16:
        return dec16(x)
    return x.astype(F32)


def plane_store(x: jax.Array, dtype) -> jax.Array:
    """f32 values -> plane of the given storage dtype."""
    if jnp.dtype(dtype) == jnp.uint16:
        return enc16(x)
    return x.astype(dtype)


def to_planes(state: jax.Array, n: int, dtype=F32) -> Tuple[jax.Array, jax.Array]:
    """Flat or grouped complex state -> (xr, xi) planes. ``dtype`` is the
    STORAGE dtype (f32 default; bf16 / f16-bit-u16 under
    config.set_state_storage modes — kernels always compute f32 in VMEM)."""
    t = jnp.asarray(state).reshape(plane_shape(n))
    return (plane_store(t.real.astype(F32), dtype),
            plane_store(t.imag.astype(F32), dtype))


def from_planes(xr: jax.Array, xi: jax.Array, n: int, dtype=jnp.complex64) -> jax.Array:
    """(xr, xi) planes -> flat complex state (any storage dtype)."""
    return (plane_f32(xr) + 1j * plane_f32(xi)).reshape(-1).astype(dtype)


def standard_planes(n: int, dtype=F32) -> Tuple[jax.Array, jax.Array]:
    """|0...0> directly as planes — no 2^n complex buffer is ever built
    (reference primitives.cu:176-199 zero-fills then sets amplitude 0)."""
    shape = plane_shape(n)
    xr = jnp.zeros(shape, dtype).at[0, 0, 0].set(1.0)
    return xr, jnp.zeros(shape, dtype)


def op_planes(E) -> Tuple[jax.Array, jax.Array]:
    """Complex operator -> (real, imag) f32 parts (host numpy for constants
    so identical block operators embed once)."""
    c = gr.concrete_or_none(E)
    if c is not None:
        key = ("P", c.tobytes(), c.dtype.str, c.shape)
        return gr._cached(key, lambda: (
            np.ascontiguousarray(c.real.astype(np.float32)),
            np.ascontiguousarray(c.imag.astype(np.float32)),
        ))
    E = jnp.asarray(E)
    return E.real.astype(F32), E.imag.astype(F32)


def _table_planes(table) -> Tuple[jax.Array, jax.Array]:
    c = gr.concrete_or_none(table)
    if c is not None:
        key = ("PT", c.tobytes(), c.dtype.str, c.shape)
        return gr._cached(key, lambda: (
            np.ascontiguousarray(c.real.astype(np.float32)),
            np.ascontiguousarray(c.imag.astype(np.float32)),
        ))
    t = jnp.asarray(table)
    return t.real.astype(F32), t.imag.astype(F32)


# ---------------------------------------------------------------------------
# High-group axis views
# ---------------------------------------------------------------------------

def _high_view(n: int, j: int) -> Tuple[int, int, int]:
    """(pre, X, M) such that planes.reshape(pre, X, M, 128) puts group ``j``'s
    bits on axis 1 (j >= 2; M merges lower high groups with the sublane
    axis)."""
    dims = gr.group_dims(n)  # msb-first
    G = len(dims)
    ax = G - 1 - j  # axis of group j in the grouped view
    pre = int(np.prod(dims[:ax], dtype=np.int64)) if ax > 0 else 1
    X = dims[ax]
    post = int(np.prod(dims[ax + 1:G - 2], dtype=np.int64)) if ax + 1 <= G - 3 else 1
    return pre, X, post * 128


def _merged_view(n: int, j: int) -> Tuple[int, int, int, int]:
    """(pre, X, Xl, M) merging tiny group ``j`` (j >= 3) with its lower
    neighbour ``j - 1``: planes.reshape(pre, X * Xl, M, 128) puts both
    groups' bits on one contracted axis of dim >= 256.

    Rationale: at 29 qubits the top group has ONE bit (groups 7,7,7,7,1), so
    every dense op / Gram on qubit 28 missed the kernel path; the X < 8
    slice-and-stack fallback materializes full-state concatenate/slice temps
    ([1, 2, 2^21, 128] f32 = 2 GB each) that XLA keeps live in straight-line
    unrolled code — the measured 29q fwd+grad OOM driver (27.29G/15.75G,
    tools/mem29.py). On the merged axis the op is ``kron(E, I)`` and the
    existing high kernels apply in place."""
    dims = gr.group_dims(n)
    G = len(dims)
    ax = G - 1 - j
    assert j >= 3, j
    pre = int(np.prod(dims[:ax], dtype=np.int64)) if ax > 0 else 1
    X = dims[ax]
    Xl = dims[ax + 1]
    post = int(np.prod(dims[ax + 2:G - 2], dtype=np.int64)) if ax + 2 <= G - 3 else 1
    return pre, X, Xl, post * 128


def _kron_id(E, Xl: int):
    """``E (x) I_Xl`` — host numpy for concrete operators (dedup/cache),
    traced jnp.kron otherwise."""
    c = gr.concrete_or_none(E)
    if c is not None:
        key = ("KI", c.tobytes(), c.dtype.str, c.shape, Xl)
        return gr._cached(key, lambda: np.kron(
            np.asarray(c), np.eye(Xl, dtype=c.dtype)))
    E = jnp.asarray(E)
    return jnp.kron(E, jnp.eye(Xl, dtype=E.dtype))


def kron_ops(Ea, Eb):
    """``Ea (x) Eb`` (Ea on the higher/major axis) — host numpy when both
    operators are concrete (dedup/cache), traced jnp.kron otherwise."""
    ca, cb = gr.concrete_or_none(Ea), gr.concrete_or_none(Eb)
    if ca is not None and cb is not None:
        key = ("K2", ca.tobytes(), cb.tobytes(), ca.dtype.str, cb.dtype.str,
               ca.shape, cb.shape)
        return gr._cached(key, lambda: np.kron(np.asarray(ca), np.asarray(cb)))
    return jnp.kron(jnp.asarray(Ea), jnp.asarray(Eb))


def merged_top_tiny(n: int) -> bool:
    """True when the top group is tiny enough that (top, top-1) ops merge
    onto one kernel axis (the hpair/merged-seed/merged-gram criterion)."""
    dims = gr.group_dims(n)
    return len(dims) >= 4 and dims[0] < MIN_KERNEL_X


def apply_merged_top(xr, xi, E_m, n: int, *, alias: bool = True,
                     conj: bool = False, acc=None, out_dtype=None,
                     interpret: bool = False):
    """Apply a dense operator on the MERGED (top, top-1) group axis
    (``E_m``: (X*Xl, X*Xl), e.g. kron(E_top, E_low)) in one kernel pass —
    one sweep where the per-group path would take two. ``conj``/``acc``:
    seed mode (see dual_group_apply_planes)."""
    dims = gr.group_dims(n)
    jtop = len(dims) - 1
    pre, X, Xl, M = _merged_view(n, jtop)
    er, ei = op_planes(E_m)
    vxr = xr.reshape(pre, X * Xl, M, 128)
    vxi = xi.reshape(pre, X * Xl, M, 128)
    yr, yi = high_group_apply_planes(vxr, vxi, er, ei,
                                     dot_mode=config.kernel_dot_mode(),
                                     alias=alias, conj=conj, acc=acc,
                                     out_dtype=out_dtype, interpret=interpret)
    return yr.reshape(xr.shape), yi.reshape(xi.shape)


def apply_merged_top_fact(xr, xi, Et, El, n: int, *, alias: bool = True,
                          interpret: bool = False):
    """Apply ``Et (x) El`` on the merged (top, top-1) axis in one pass
    WITHOUT expanding the Kronecker product — the low factor runs Xl-wide
    MXU contractions, the tiny top factor runs as VPU scalar combinations
    (high_apply.merged_fact_apply_planes). MXU work per element is ~Xt x
    less than ``apply_merged_top`` on ``kron(Et, El)``."""
    dims = gr.group_dims(n)
    jtop = len(dims) - 1
    pre, X, Xl, M = _merged_view(n, jtop)
    el_r, el_i = op_planes(El)
    et_r, et_i = op_planes(Et)
    vxr = xr.reshape(pre, X * Xl, M, 128)
    vxi = xi.reshape(pre, X * Xl, M, 128)
    yr, yi = merged_fact_apply_planes(vxr, vxi, el_r, el_i, et_r, et_i,
                                      x_top=X, dot_mode=config.kernel_dot_mode(),
                                      alias=alias, interpret=interpret)
    return yr.reshape(xr.shape), yi.reshape(xi.shape)


def backward_merged_top_fact(fxr, fxi, bxr, bxi, Et, El, Eti, Eli, n: int,
                             *, interpret: bool = False):
    """Factorized one-pass adjoint on the merged (top, top-1) axis; returns
    the planes plus the complex ``(T0_top, T0_low)`` pair-gram restrictions
    (see block_backward_merged_fact) instead of the (Xt*Xl)^2 merged gram."""
    dims = gr.group_dims(n)
    jtop = len(dims) - 1
    pre, X, Xl, M = _merged_view(n, jtop)
    shape4 = (pre, X * Xl, M, 128)
    eli_r, eli_i = op_planes(Eli)
    el_r, el_i = op_planes(El)
    eti_r, eti_i = op_planes(Eti)
    et_r, et_i = op_planes(Et)
    # bf16x3 is a measured LOSS in this kernel (tools/hpair_fact_bench.py,
    # 30q shape Xt=4/Xl=128: 82.5 ms vs 49.1 ms f32) — the factorization has
    # 12 dot sites that each re-split slab-scale operands into bf16 hi/lo
    # pairs, and that VPU/VMEM traffic exceeds the saved MXU passes (unlike
    # the 3-dot expanded kernel, where bf16x3 wins 1.75x). f32 dots are
    # faster AND more accurate here, so the reduced-storage auto mode clamps
    # to f32; an explicit benchmark can still pass bf16x3 to the kernel fn.
    bwd_mode = config.bwd_kernel_dot_mode()
    if bwd_mode == "bf16x3":
        bwd_mode = "f32"
    fr, fi, br, bi, ttr, tti, tlr, tli = block_backward_merged_fact(
        fxr.reshape(shape4), fxi.reshape(shape4),
        bxr.reshape(shape4), bxi.reshape(shape4),
        eli_r, eli_i, el_r, el_i, eti_r, eti_i, et_r, et_i, x_top=X,
        dot_mode=config.kernel_dot_mode(),
        bwd_dot_mode=bwd_mode,
        gram_dot_mode=config.gram_kernel_dot_mode(), interpret=interpret)
    return (fr.reshape(fxr.shape), fi.reshape(fxr.shape),
            br.reshape(fxr.shape), bi.reshape(fxr.shape),
            ttr + 1j * tti, tlr + 1j * tli)


def gram_merged_top(xr, xi, n: int, *, interpret: bool = False):
    """(G_low, G_top): BOTH top group Grams from ONE merged-axis kernel read
    — partial traces of the (X*Xl)^2 merged Gram over the other factor."""
    dims = gr.group_dims(n)
    jtop = len(dims) - 1
    pre, X, Xl, M = _merged_view(n, jtop)
    S, C = gram_high(xr.reshape(pre, X * Xl, M, 128),
                     xi.reshape(pre, X * Xl, M, 128),
                     dot_mode=config.kernel_dot_mode(), interpret=interpret)
    Gm = (S + 1j * (C.T - C)).reshape(X, Xl, X, Xl)
    G_top = jnp.einsum("xdyd->xy", Gm)
    G_low = jnp.einsum("dxdy->xy", Gm)
    return G_low, G_top


def backward_merged_top(fxr, fxi, bxr, bxi, Einv_m, E_m, n: int,
                        *, interpret: bool = False):
    """block_backward on the merged (top, top-1) axis; returns the planes
    plus the MERGED (X*Xl)^2 pair-gram (complex) for per-block extraction."""
    dims = gr.group_dims(n)
    jtop = len(dims) - 1
    pre, X, Xl, M = _merged_view(n, jtop)
    shape4 = (pre, X * Xl, M, 128)
    einv_r, einv_i = op_planes(Einv_m)
    e_r, e_i = op_planes(E_m)
    fr, fi, br, bi, t0r, t0i = block_backward_high(
        fxr.reshape(shape4), fxi.reshape(shape4),
        bxr.reshape(shape4), bxi.reshape(shape4),
        einv_r, einv_i, e_r, e_i, dot_mode=config.kernel_dot_mode(), bwd_dot_mode=config.bwd_kernel_dot_mode(),
        gram_dot_mode=config.gram_kernel_dot_mode(),
        interpret=interpret)
    return (fr.reshape(fxr.shape), fi.reshape(fxr.shape),
            br.reshape(fxr.shape), bi.reshape(fxr.shape), t0r + 1j * t0i)


def _trace_id(Gm: jax.Array, X: int, Xl: int) -> jax.Array:
    """Partial trace over the identity factor of a merged-axis (X*Xl, X*Xl)
    Gram/pair-gram: ``G[x, y] = sum_d Gm[(x,d), (y,d)]``."""
    return jnp.einsum("xdyd->xy", Gm.reshape(X, Xl, X, Xl))


# ---------------------------------------------------------------------------
# Dense applies
# ---------------------------------------------------------------------------

def _diag_table_planes(tables):
    """Complex (tsl, tas, tal) -> the 6 f32 operands of the diag-run
    kernels (host split for concrete tables)."""
    if tables is None:
        return None
    tsl, tas, tal = tables
    return (_table_planes(tsl) + _table_planes(tas) + _table_planes(tal))


def apply_dual(xr, xi, E0: Optional[jax.Array], E1: Optional[jax.Array],
               *, alias: bool = True, conj: bool = False, acc=None,
               diag=None, diag_first: bool = True, out_dtype=None,
               interpret: bool = False):
    """One HBM pass applying lane-group operator ``E0`` and sublane-group
    operator ``E1`` (either may be None = identity; both 128x128 complex).
    ``diag``: complex (tsl, tas, tal) tables of a fused diagonal run
    multiplied in the same pass — BEFORE the dual gates when ``diag_first``
    (tape order [run, dense]), AFTER them otherwise ([dense, run])."""
    eye = np.eye(128, dtype=np.float32)
    zr = np.zeros((128, 128), dtype=np.float32)
    e0r, e0i = op_planes(E0) if E0 is not None else (eye, zr)
    e1r, e1i = op_planes(E1) if E1 is not None else (eye, zr)
    return dual_group_apply_planes(xr, xi, e0r, e0i, e1r, e1i,
                                   dot_mode=config.kernel_dot_mode(),
                                   alias=alias, conj=conj, acc=acc,
                                   diag_tables=_diag_table_planes(diag),
                                   diag_first=diag_first,
                                   out_dtype=out_dtype, interpret=interpret)


def _apply_high_smallx(vxr, vxi, er, ei, X: int):
    """Tiny contracted axis (X < 8, e.g. a 1-2 bit top group): the operator
    entries are scalars, so the apply is a linear combination of axis slices
    — pure elementwise multiply-adds that XLA fuses into ONE state pass
    (an einsum here materializes full-state temps per Karatsuba term; at 29
    qubits those 2 GB temps were the HBM-OOM driver, see BENCHMARKS.md)."""
    er = jnp.asarray(er)
    ei = jnp.asarray(ei)
    outr, outi = [], []
    for x in range(X):
        accr = acci = None
        for y in range(X):
            tr = er[x, y] * vxr[:, y] - ei[x, y] * vxi[:, y]
            ti = er[x, y] * vxi[:, y] + ei[x, y] * vxr[:, y]
            accr = tr if accr is None else accr + tr
            acci = ti if acci is None else acci + ti
        outr.append(accr)
        outi.append(acci)
    return jnp.stack(outr, axis=1), jnp.stack(outi, axis=1)


def dhigh_eligible(j: int, n: int) -> bool:
    """True when a diagonal run folds into the dense sweep on high group
    ``j`` as ONE fused kernel pass (apply_dhigh / backward_dhigh): the
    plain high view applies (kernel-tileable X, no merged-axis view — a
    merged axis interleaves foreign bits into the contracted axis, where
    the run's a-tables no longer factor per block)."""
    if j < 2:
        return False
    _, X, M = _high_view(n, j)
    return MIN_KERNEL_X <= X <= 128 and M % 128 == 0


def dhigh_view_tables(tables, j: int, n: int):
    """Diag-run tables (tsl (128,128), tas (A,128), tal (A,128)) complex ->
    the 6 f32 view-table operands of the fused dhigh kernels for high group
    ``j``: tas/tal reshaped to (pre, X, post, 128) so each grid cell's
    BlockSpec delivers exactly its a-rows (a = (i*X + x)*post + p)."""
    tsl, tas, tal = tables
    pre, X, M = _high_view(n, j)
    post = M // 128
    tsl_r, tsl_i = _table_planes(tsl)
    tas_r, tas_i = _table_planes(tas)
    tal_r, tal_i = _table_planes(tal)
    v = (pre, X, post, 128)
    return (jnp.asarray(tsl_r), jnp.asarray(tsl_i),
            jnp.asarray(tas_r).reshape(v), jnp.asarray(tas_i).reshape(v),
            jnp.asarray(tal_r).reshape(v), jnp.asarray(tal_i).reshape(v))


def apply_dhigh(xr, xi, E, tables, j: int, n: int, *, diag_first: bool = True,
                interpret: bool = False):
    """Fused [diagonal run + dense sweep on high group ``j``] forward in ONE
    aliased pass (``diag_first``: run precedes the dense in tape order).
    Caller checks dhigh_eligible."""
    pre, X, M = _high_view(n, j)
    er, ei = op_planes(E)
    vxr = xr.reshape(pre, X, M, 128)
    vxi = xi.reshape(pre, X, M, 128)
    yr, yi = high_group_apply_planes(
        vxr, vxi, er, ei, dot_mode=config.kernel_dot_mode(), alias=True,
        diag=dhigh_view_tables(tables, j, n), diag_first=diag_first,
        interpret=interpret)
    return yr.reshape(xr.shape), yi.reshape(xr.shape)


def backward_dhigh(fxr, fxi, bxr, bxi, Einv, E, tables_inv, tables, j: int,
                   n: int, *, diag_first: bool = True, with_q: bool = False,
                   interpret: bool = False):
    """One-pass adjoint of a fused [diag run + dense high sweep]: uncompute,
    cotangent transport, the dense block's T0 pair-gram and (``with_q``) the
    run's Q reductions, in a single read of the (fwd, bwd) planes. Returns
    ``(fxr, fxi, bxr, bxi, T0, Q-or-None)`` with T0 complex (X, X) and Q the
    complex (Qsl (128,128), Qas (A,128), Qal (A,128)) diag.py reductions."""
    from dqc_tpu.ops.pallas.block_backward import block_backward_high

    pre, X, M = _high_view(n, j)
    einv_r, einv_i = op_planes(Einv)
    e_r, e_i = op_planes(E)
    vshape = (pre, X, M, 128)
    out = block_backward_high(
        fxr.reshape(vshape), fxi.reshape(vshape),
        bxr.reshape(vshape), bxi.reshape(vshape),
        jnp.asarray(einv_r), jnp.asarray(einv_i),
        jnp.asarray(e_r), jnp.asarray(e_i),
        dot_mode=config.kernel_dot_mode(),
        bwd_dot_mode=config.bwd_kernel_dot_mode(),
        gram_dot_mode=config.gram_kernel_dot_mode(),
        diag_inv_tables=dhigh_view_tables(tables_inv, j, n),
        diag_tables=dhigh_view_tables(tables, j, n),
        diag_first_fwd=diag_first, diag_q=with_q, interpret=interpret)
    fr, fi, br, bi, t0r, t0i = out[:6]
    Q = None
    if with_q:
        A = pre * X * (M // 128)
        qsl = out[6] + 1j * out[7]
        # kernel layouts (common.dh_table_views): qas (pre, post, k, X,
        # m_blk), qal (pre, post, X, 128) -> canonical (A, 128) a-tables
        qas = (jnp.transpose(out[8], (0, 3, 1, 2, 4)).reshape(A, 128)
               + 1j * jnp.transpose(out[9], (0, 3, 1, 2, 4)).reshape(A, 128))
        qal = (jnp.transpose(out[10], (0, 2, 1, 3)).reshape(A, 128)
               + 1j * jnp.transpose(out[11], (0, 2, 1, 3)).reshape(A, 128))
        Q = (qsl, qas, qal)
    return (fr.reshape(fxr.shape), fi.reshape(fxr.shape),
            br.reshape(bxr.shape), bi.reshape(bxr.shape),
            t0r + 1j * t0i, Q)


def apply_high(xr, xi, E, j: int, n: int, *, alias: bool = True,
               conj: bool = False, acc=None, out_dtype=None,
               interpret: bool = False):
    """Dense full-group operator on high group ``j >= 2`` (one pass)."""
    pre, X, M = _high_view(n, j)
    if X >= MIN_KERNEL_X:
        er, ei = op_planes(E)
        vxr = xr.reshape(pre, X, M, 128)
        vxi = xi.reshape(pre, X, M, 128)
        yr, yi = high_group_apply_planes(vxr, vxi, er, ei,
                                         dot_mode=config.kernel_dot_mode(),
                                         alias=alias, conj=conj, acc=acc,
                                         out_dtype=out_dtype,
                                         interpret=interpret)
    elif j >= 3:
        # tiny top group: merged-axis kernel (see _merged_view)
        pre, X, Xl, M = _merged_view(n, j)
        er, ei = op_planes(_kron_id(E, Xl))
        vxr = xr.reshape(pre, X * Xl, M, 128)
        vxi = xi.reshape(pre, X * Xl, M, 128)
        yr, yi = high_group_apply_planes(vxr, vxi, er, ei,
                                         dot_mode=config.kernel_dot_mode(),
                                         alias=alias, conj=conj, acc=acc,
                                         out_dtype=out_dtype,
                                         interpret=interpret)
    else:
        # small-n fallback (j == 2 tiny): elementwise, XLA fuses conj/acc
        er, ei = op_planes(E)
        vxr = plane_f32(xr.reshape(pre, X, M, 128))
        vxi = plane_f32(xi.reshape(pre, X, M, 128))
        yr, yi = _apply_high_smallx(vxr, vxi, er, ei, X)
        if conj:
            yi = -yi
        out_dt = (acc[0].dtype if acc is not None
                  else (out_dtype or xr.dtype))
        if acc is not None:
            yr = plane_f32(acc[0].reshape(yr.shape)) + yr
            yi = plane_f32(acc[1].reshape(yi.shape)) + yi
        yr = plane_store(yr, out_dt)
        yi = plane_store(yi, out_dt)
    return yr.reshape(xr.shape), yi.reshape(xi.shape)


def apply_block(xr, xi, E, j: int, n: int, *, alias: bool = True,
                conj: bool = False, acc=None, out_dtype=None,
                interpret: bool = False):
    """Dense full-group operator on any group axis. ``conj``/``acc``: emit
    ``acc + conj(E x)`` with the accumulator updated in place (density
    seeds)."""
    if j == 0:
        return apply_dual(xr, xi, E, None, alias=alias, conj=conj, acc=acc,
                          out_dtype=out_dtype, interpret=interpret)
    if j == 1:
        return apply_dual(xr, xi, None, E, alias=alias, conj=conj, acc=acc,
                          out_dtype=out_dtype, interpret=interpret)
    return apply_high(xr, xi, E, j, n, alias=alias, conj=conj, acc=acc,
                      out_dtype=out_dtype, interpret=interpret)


def apply_cross_terms(xr, xi, terms, n: int, *, alias: bool = True,
                      conj: bool = False, acc=None, out_dtype=None,
                      interpret: bool = False):
    """ONE-pass execution of a dense cross-group gate's full per-group
    term decomposition (plane_scan._dense_cross_expanded_terms): ``y =
    sum_t (EA_t on ja)(EB_t on jb) x`` with conj/acc/storage semantics of
    apply_block. Covers the (minor, minor) and (lane, high) group pairs —
    the per-term 2-pass accumulate path needed a temp pair + a fresh
    accumulator pair per gate (3 plane-pairs live, the 29q-shard dense-cross
    memory ceiling). Returns None when the pair shape has no fused kernel
    (caller falls back to the per-term sweeps)."""
    groups = {t[1] for t in terms} | {t[3] for t in terms}
    if len(groups) != 2:
        return None

    def stacked(ops):
        rs, is_ = zip(*(op_planes(E) for E in ops))
        return jnp.stack(rs), jnp.stack(is_)

    if groups == {0, 1}:
        el = [EA if ja == 0 else EB for EA, ja, EB, jb in terms]
        em = [EB if ja == 0 else EA for EA, ja, EB, jb in terms]
        el_r, el_i = stacked(el)
        em_r, em_i = stacked(em)
        return dual_multi_apply_planes(
            xr, xi, el_r, el_i, em_r, em_i,
            dot_mode=config.kernel_dot_mode(), alias=alias, conj=conj,
            acc=acc, out_dtype=out_dtype, interpret=interpret)
    if 0 in groups:
        j = max(groups)
        pre, X, M = _high_view(n, j)
        if X < MIN_KERNEL_X:
            return None
        eh = [EA if ja == j else EB for EA, ja, EB, jb in terms]
        el = [EB if ja == j else EA for EA, ja, EB, jb in terms]
        eh_r, eh_i = stacked(eh)
        el_r, el_i = stacked(el)
        vxr = xr.reshape(pre, X, M, 128)
        vxi = xi.reshape(pre, X, M, 128)
        a2 = None if acc is None else (acc[0].reshape(pre, X, M, 128),
                                       acc[1].reshape(pre, X, M, 128))
        yr, yi = high_multi_apply_planes(
            vxr, vxi, eh_r, eh_i, el_r, el_i,
            dot_mode=config.kernel_dot_mode(), alias=alias, conj=conj,
            acc=a2, out_dtype=out_dtype, interpret=interpret)
        return yr.reshape(xr.shape), yi.reshape(xi.shape)
    return None


# ---------------------------------------------------------------------------
# One-pass dense cross-group gates on a SPAN view
#
# The plane layout's flat ravel orders qubits (n-1 .. 14 | 13 .. 7 | 6 .. 0):
# any contiguous bit range [b0, b_max] with b0 >= 7 is one contiguous axis of
# the view ``(2^(n-1-b_max), 2^span, 2^(b0-7), 128)`` — exactly the high-group
# kernel's (A1, X, M, 128) contract. A dense cross-group gate whose non-lane
# bits fit a <= 8-bit span therefore runs as ONE aliased high-kernel pass with
# the gate expanded over the span axis (expand_in_group), no Schmidt split, no
# temp plane pair — closing the (sublane, high) and (high, high) pair shapes
# (the qubit 13-14 and 20-21 boundaries every ladder ansatz crosses) that
# previously ran 2 accumulate sweeps per decomposition term. Lane bits ride
# along as per-term 128x128 lane factors in the multi-term high+lane kernel.
# The reference sweeps once per 2q gate regardless of position
# (primitives.cu:573-620); this restores that on planes for every shape.
# ---------------------------------------------------------------------------

MAX_SPAN_BITS = 8  # 256x256 expanded operator; the merged-top path's proven X


def _span_geom(positions, n: int):
    """(b0, span_bits, lane_bits) of the span view for a dense gate, or
    None when ineligible. Span covers every bit >= 7, padded down to at
    least 3 bits (X = 8, the Mosaic-tileable kernel minimum)."""
    if n < 15:
        return None
    hi = [p for p in positions if p >= 7]
    lanes = tuple(p for p in positions if p < 7)
    # pure-minor pairs belong to the dual kernel; and without an A bit the
    # span view cannot beat the existing paths
    if not hi or max(hi) < 14:
        return None
    b_max, b_min = max(hi), min(hi)
    span = max(3, b_max - b_min + 1)
    if span > MAX_SPAN_BITS:
        return None
    b0 = b_max - span + 1
    if b0 < 7:
        return None
    if lanes and len(lanes) > 2:
        return None
    return b0, span, lanes


def cross_span_eligible(positions, n: int) -> bool:
    """True when a dense gate on ``positions`` runs as ONE span-view kernel
    pass (see _span_geom)."""
    return _span_geom(positions, n) is not None


def _permuted_gate(gate_m, positions):
    """(positions sorted descending, gate reindexed to that order) — the
    gate's index convention ties bit significance to the positions tuple
    order (reference circuit.rs q2gate args; ir.FCross)."""
    k = len(positions)
    order = sorted(range(k), key=lambda i: -positions[i])
    spos = tuple(positions[i] for i in order)
    if list(order) == list(range(k)):
        return spos, jnp.asarray(gate_m) if gr.concrete_or_none(gate_m) is None else gate_m
    perm = list(order) + [k + i for i in order]
    c = gr.concrete_or_none(gate_m)
    if c is not None:
        key = ("PG", c.tobytes(), c.dtype.str, tuple(order))
        return spos, gr._cached(key, lambda: np.ascontiguousarray(
            c.reshape((2,) * (2 * k)).transpose(perm).reshape(1 << k, 1 << k)))
    G = jnp.asarray(gate_m).reshape((2,) * (2 * k))
    return spos, G.transpose(perm).reshape(1 << k, 1 << k)


def _span_operator(G, rels, span: int):
    """Gate (descending-position index order) expanded over the span axis:
    complex ``(2^span, 2^span)`` (host-cached for constants)."""
    c = gr.concrete_or_none(G)
    if c is not None:
        return gr.expand_in_group(c, rels, span)
    return gr.expand_in_group(jnp.asarray(G), rels, span)


def _lane_span_terms(G, kh: int, rels, span: int, lane_rels):
    """Two-side decomposition of a gate with lane bits: elementary
    ``|ql><pl|`` on the lane group x the corresponding gate slice expanded
    over the span axis. Returns stacked f32 ``(T, R, R)`` span parts and
    ``(T, 128, 128)`` lane parts (zero slices pruned for constants)."""
    kl = len(lane_rels)

    def build(xp, Gc):
        G4 = Gc.reshape(1 << kh, 1 << kl, 1 << kh, 1 << kl)
        cG = gr.concrete_or_none(G4)
        eh, el = [], []
        for ql in range(1 << kl):
            for pl_ in range(1 << kl):
                sub = G4[:, ql, :, pl_]
                if cG is not None and np.abs(np.asarray(cG[:, ql, :, pl_])).max() < 1e-12:
                    continue
                B = np.zeros((1 << kl, 1 << kl), np.complex64)
                B[ql, pl_] = 1.0
                eh.append(gr.expand_in_group(sub, rels, span))
                el.append(gr.expand_in_group(B, lane_rels, gr.GROUP_BITS))
        eh = xp.stack([xp.asarray(e) for e in eh])
        el = xp.stack([xp.asarray(e) for e in el])
        return (eh.real.astype(xp.float32), eh.imag.astype(xp.float32),
                el.real.astype(xp.float32), el.imag.astype(xp.float32))

    c = gr.concrete_or_none(G)
    if c is not None:
        key = ("LST", c.tobytes(), c.dtype.str, kh, tuple(rels), span,
               tuple(lane_rels))
        return gr._cached(key, lambda: tuple(
            np.ascontiguousarray(t) for t in build(np, np.asarray(c))))
    return build(jnp, jnp.asarray(G))


def apply_cross_span(xr, xi, gate_m, positions, n: int, *, alias: bool = True,
                     conj: bool = False, acc=None, out_dtype=None,
                     interpret: bool = False):
    """ONE-pass dense cross-group gate on the span view — covers the pair
    shapes apply_cross_terms does not: (sublane, high), (high, high),
    all-high >2-group spans, and (lane, A-bit) without a Mosaic-tileable
    group axis. Semantics of apply_block (conj/acc/out_dtype/alias).
    Returns None when the bit pattern has no span view (caller falls
    through to apply_cross_terms / per-term sweeps)."""
    geom = _span_geom(positions, n)
    if geom is None:
        return None
    b0, span, _ = geom
    spos, G = _permuted_gate(gate_m, tuple(int(p) for p in positions))
    hi = [p for p in spos if p >= 7]
    lanes = [p for p in spos if p < 7]
    rels = tuple(p - b0 for p in hi)
    b_max = hi[0]
    vshape = (1 << (n - 1 - b_max), 1 << span, 1 << (b0 - 7), 128)
    vxr = xr.reshape(vshape)
    vxi = xi.reshape(vshape)
    a2 = None if acc is None else (acc[0].reshape(vshape),
                                   acc[1].reshape(vshape))
    if not lanes:
        er, ei = op_planes(_span_operator(G, rels, span))
        yr, yi = high_group_apply_planes(
            vxr, vxi, jnp.asarray(er), jnp.asarray(ei),
            dot_mode=config.kernel_dot_mode(), alias=alias, conj=conj,
            acc=a2, out_dtype=out_dtype, interpret=interpret)
    else:
        eh_r, eh_i, el_r, el_i = _lane_span_terms(
            G, len(hi), rels, span, tuple(lanes))
        yr, yi = high_multi_apply_planes(
            vxr, vxi, jnp.asarray(eh_r), jnp.asarray(eh_i),
            jnp.asarray(el_r), jnp.asarray(el_i),
            dot_mode=config.kernel_dot_mode(), alias=alias, conj=conj,
            acc=a2, out_dtype=out_dtype, interpret=interpret)
    return yr.reshape(xr.shape), yi.reshape(xr.shape)


def cross_pair_one_pass(positions, n: int) -> bool:
    """True when a dense cross-group gate over TWO groups executes its whole
    term decomposition as ONE fused pass: the multi-term dual kernel
    (minor-minor), the multi-term high+lane kernel (lane x kernel-tileable
    high group), or a span view. Shared by plane_scan.estimate_hbm_passes so
    the published pass counts track the actual dispatch."""
    if cross_span_eligible(positions, n):
        return True
    groups = {gr.group_of_bit(n, p)[0] for p in positions}
    if groups == {0, 1}:
        return True
    sizes = gr.group_sizes_low_first(n)
    return 0 in groups and (1 << sizes[max(groups)]) >= MIN_KERNEL_X


def backward_span_eligible(positions, n: int) -> bool:
    """True when a dense gate on ``positions`` has a ONE-pass fused adjoint
    (backward_cross_span): span view exists AND no lane bits (lane shapes
    would need a multi-term backward kernel; they keep the 3-pass path)."""
    geom = _span_geom(positions, n)
    return geom is not None and not geom[2]


def _span_cotangent(t0r, t0i, rels, span: int):
    """Adjoint of expand_in_group: partial trace of the span-block pair-gram
    over the identity-factor bits. ``T0[x, y] = sum_b bwd[x, b] fwd_in[y, b]``
    with ``E = expand(G)`` gives ``dL/dG[p, q] = sum_r T0[x(p, r), y(q, r)]``
    (r = the non-gate span bits, equal on both sides). Real-pair in /
    complex out — the TPU backend has no complex diagonal-einsum lowering
    for eager calls."""
    k = len(rels)
    row_axes = [span - 1 - r for r in rels]
    others = [a for a in range(span) if a not in row_axes]
    perm = row_axes + others

    def red(T0):
        T4 = T0.reshape((2,) * (2 * span)).transpose(
            perm + [span + a for a in perm])
        T4 = T4.reshape(1 << k, 1 << (span - k), 1 << k, 1 << (span - k))
        return jnp.trace(T4, axis1=1, axis2=3)

    return jax.lax.complex(red(t0r.astype(F32)), red(t0i.astype(F32)))


def backward_cross_span(fxr, fxi, bxr, bxi, gate_m, gate_inv, positions,
                        n: int, *, interpret: bool = False):
    """ONE-pass adjoint for a span-eligible dense cross-group gate: uncompute
    (``fwd_in = expand(G^-1) fwd``), cotangent transport
    (``bwd' = expand(G)^T bwd``), and the gate cotangent — all in a single
    read of the (fwd, bwd) planes via block_backward_high on the span view
    (the reference needs three sweeps per gate, circuit.rs:348-362).

    Returns ``(fxr', fxi', bxr', bxi', W)`` with ``W`` the ``(2^k, 2^k)``
    complex cotangent in the ORIGINAL positions index order, or None when
    the shape is not backward_span_eligible."""
    if not backward_span_eligible(positions, n):
        return None
    pos = tuple(int(p) for p in positions)
    b0, span, _ = _span_geom(pos, n)
    spos, G = _permuted_gate(gate_m, pos)
    _, Ginv = _permuted_gate(gate_inv, pos)
    rels = tuple(p - b0 for p in spos)
    b_max = spos[0]
    vshape = (1 << (n - 1 - b_max), 1 << span, 1 << (b0 - 7), 128)
    einv_r, einv_i = op_planes(_span_operator(Ginv, rels, span))
    e_r, e_i = op_planes(_span_operator(G, rels, span))
    fr, fi, br, bi, t0r, t0i = block_backward_high(
        fxr.reshape(vshape), fxi.reshape(vshape),
        bxr.reshape(vshape), bxi.reshape(vshape),
        jnp.asarray(einv_r), jnp.asarray(einv_i),
        jnp.asarray(e_r), jnp.asarray(e_i),
        dot_mode=config.kernel_dot_mode(), bwd_dot_mode=config.bwd_kernel_dot_mode(),
        gram_dot_mode=config.gram_kernel_dot_mode(), interpret=interpret)
    W = _span_cotangent(t0r, t0i, rels, span)
    k = len(pos)
    order = sorted(range(k), key=lambda i: -pos[i])
    if list(order) != list(range(k)):
        inv = [order.index(i) for i in range(k)]
        W = W.reshape((2,) * (2 * k)).transpose(
            inv + [k + i for i in inv]).reshape(1 << k, 1 << k)
    return (fr.reshape(fxr.shape), fi.reshape(fxr.shape),
            br.reshape(bxr.shape), bi.reshape(bxr.shape), W)


# ---------------------------------------------------------------------------
# Diagonals (pure XLA elementwise; adjacent diagonals fuse into one sweep)
# ---------------------------------------------------------------------------

def _bshape(n: int, j: int) -> Tuple[int, ...]:
    dims = gr.group_dims(n)
    shape = [1] * len(dims)
    shape[len(dims) - 1 - j] = dims[len(dims) - 1 - j]
    return tuple(shape)


def _cmul(xr, xi, dr, di):
    return xr * dr - xi * di, xr * di + xi * dr


def apply_diag_axis(xr, xi, table, j: int, n: int):
    """Full-group diagonal table on group ``j`` (broadcast multiply)."""
    dims = gr.group_dims(n)
    tr, ti = _table_planes(table)
    shape = _bshape(n, j)
    yr, yi = _cmul(plane_f32(xr.reshape(dims)), plane_f32(xi.reshape(dims)),
                   jnp.asarray(tr).reshape(shape), jnp.asarray(ti).reshape(shape))
    return (plane_store(yr.reshape(xr.shape), xr.dtype),
            plane_store(yi.reshape(xi.shape), xi.dtype))


def _axis_indicators(positions, n: int):
    """Per gate-index-value mask factors: for each of the ``2^k`` diagonal
    entries, the set of (axis, 0/1-indicator vector) factors whose broadcast
    product selects the amplitudes with that bit pattern (positions
    msb-first, matching groups.subblocks)."""
    dims = gr.group_dims(n)
    G = len(dims)
    k = len(positions)
    out = []
    for j in range(1 << k):
        factors: Dict[int, np.ndarray] = {}
        for gate_bit, p in enumerate(positions):
            jg, rel = gr.group_of_bit(n, p)
            ax = G - 1 - jg
            want = (j >> (k - 1 - gate_bit)) & 1
            v = (((np.arange(dims[ax]) >> rel) & 1) == want).astype(np.float32)
            factors[ax] = factors.get(ax, np.ones(dims[ax], np.float32)) * v
        out.append(factors)
    return out


def apply_multi_diag(xr, xi, d, positions, n: int):
    """Diagonal k-qubit gate spanning ANY number of groups: the joint table
    is assembled as ``sum_j d[j] * (mask_j broadcast product)`` (tiny
    concrete 0/1 axis vectors, no gather) and applied as one fused
    elementwise multiply — closes the plane engine's >2-group-diagonal
    fallback (complex-engine counterpart: groups.apply_diag)."""
    dims = gr.group_dims(n)
    G = len(dims)
    d = jnp.asarray(d).reshape(-1)
    tr = ti = None
    for j, factors in enumerate(_axis_indicators(positions, n)):
        m = None
        for ax, v in factors.items():
            sh = [1] * G
            sh[ax] = dims[ax]
            b = jnp.asarray(v).reshape(sh)
            m = b if m is None else m * b
        term_r = d[j].real * m
        term_i = d[j].imag * m
        tr = term_r if tr is None else tr + term_r
        ti = term_i if ti is None else ti + term_i
    yr, yi = _cmul(plane_f32(xr.reshape(dims)), plane_f32(xi.reshape(dims)),
                   tr, ti)
    return (plane_store(yr.reshape(xr.shape), xr.dtype),
            plane_store(yi.reshape(xi.shape), xi.dtype))


def multi_diag_gram(fxr, fxi, bxr, bxi, positions, n: int) -> jax.Array:
    """``W[j] = sum_b bwd[j, b] fwd[j, b]`` over the gate-bit subblocks
    (the diag-gate cotangent, groups.diag_pair_grad on real planes)."""
    dims = gr.group_dims(n)
    Fr = plane_f32(gr.subblocks(fxr.reshape(dims), positions, n))
    Fi = plane_f32(gr.subblocks(fxi.reshape(dims), positions, n))
    Br = plane_f32(gr.subblocks(bxr.reshape(dims), positions, n))
    Bi = plane_f32(gr.subblocks(bxi.reshape(dims), positions, n))
    wr = jnp.sum(Br * Fr - Bi * Fi, axis=1)
    wi = jnp.sum(Br * Fi + Bi * Fr, axis=1)
    return wr + 1j * wi


def apply_cross_diag(xr, xi, table2, j2: int, j1: int, n: int):
    """Joint diagonal over two group axes; ``table2``: (dim_j2, dim_j1)."""
    dims = gr.group_dims(n)
    G = len(dims)
    a2, a1 = G - 1 - j2, G - 1 - j1
    tr, ti = _table_planes(table2)
    tr, ti = jnp.asarray(tr), jnp.asarray(ti)
    if a2 > a1:
        tr, ti = tr.T, ti.T
        a2, a1 = a1, a2
    shape = [1] * G
    shape[a2] = dims[a2]
    shape[a1] = dims[a1]
    yr, yi = _cmul(plane_f32(xr.reshape(dims)), plane_f32(xi.reshape(dims)),
                   tr.reshape(shape), ti.reshape(shape))
    return (plane_store(yr.reshape(xr.shape), xr.dtype),
            plane_store(yi.reshape(xi.shape), xi.dtype))


# ---------------------------------------------------------------------------
# Fused diagonal runs (ops/pallas/diag.py kernels)
# ---------------------------------------------------------------------------

def _pair_planes(t):
    # host-side split for concrete tables: a complex64 host array cannot be
    # device_put on the axon TPU backend (real-pair marshalling protocol,
    # utils/boundary.py), and splitting host-side also dedups constants
    return _table_planes(t)


def apply_diag_run(xr, xi, tables, *, interpret: bool = False):
    """One in-place pass applying a factored total diagonal
    ``tables = (tsl, tas, tal)`` (complex: (128,128), (A,128), (A,128))."""
    tsl, tas, tal = tables
    return diag_sweep_planes(xr, xi, *_pair_planes(tsl), *_pair_planes(tas),
                             *_pair_planes(tal), interpret=interpret)


def backward_diag_run(fxr, fxi, bxr, bxi, inv_tables, tables, *,
                      with_q: bool, interpret: bool = False):
    """One in-place pass rolling (fwd, bwd) through a diagonal run:
    ``fwd *= D_inv``, ``bwd *= D``; with ``with_q`` also returns the complex
    pair-product reductions ``(Qsl, Qas, Qal)`` (see ops/pallas/diag.py)."""
    isl, ias, ial = inv_tables
    tsl, tas, tal = tables
    out = diag_backward_planes(
        fxr, fxi, bxr, bxi,
        *_pair_planes(isl), *_pair_planes(ias), *_pair_planes(ial),
        *_pair_planes(tsl), *_pair_planes(tas), *_pair_planes(tal),
        with_q=with_q, interpret=interpret)
    if not with_q:
        return out + (None,)
    fr, fi, br, bi, qsl_r, qsl_i, qas_r, qas_i, qal_r, qal_i = out
    Q = (qsl_r + 1j * qsl_i, qas_r + 1j * qas_i, qal_r + 1j * qal_i)
    return fr, fi, br, bi, Q


# ---------------------------------------------------------------------------
# Group Grams (density epilogue)
# ---------------------------------------------------------------------------

def _gram_axis_xla(xr, xi, j: int, n: int) -> jax.Array:
    """3-einsum fallback for tiny top groups (X < MIN_KERNEL_X)."""
    dims = gr.group_dims(n)
    ax = len(dims) - 1 - j
    sub = gr._LETTERS[: len(dims)]
    o1 = sub[:ax] + "Z" + sub[ax + 1:]
    spec = f"{o1},{sub}->Z{sub[ax]}"
    hi = jax.lax.Precision.HIGHEST
    vr = plane_f32(xr.reshape(dims))
    vi = plane_f32(xi.reshape(dims))
    A = jnp.einsum(spec, vr, vr, precision=hi)
    B = jnp.einsum(spec, vi, vi, precision=hi)
    C = jnp.einsum(spec, vr, vi, precision=hi)
    return (A + B) + 1j * (C.T - C)


def gram_axis(xr, xi, j: int, n: int, *, interpret: bool = False) -> jax.Array:
    """Complex group Gram ``G[x, y] = sum_b t[x, b] conj(t[y, b])`` (the
    group_gram/density convention, conj on the second factor) over group
    axis ``j`` in ONE HBM read of the planes: ``G = S + i (C^T - C)`` from
    the (S, C) Pallas gram kernels. Serves every density request in the
    group (the reference sweeps the full state per density,
    primitives.cu:689-876)."""
    mode = config.kernel_dot_mode()
    if j == 0:
        S, C = gram_lane(xr, xi, dot_mode=mode, interpret=interpret)
    elif j == 1:
        S, C = gram_sublane(xr, xi, dot_mode=mode, interpret=interpret)
    else:
        pre, X, M = _high_view(n, j)
        if X < MIN_KERNEL_X:
            if j < 3:
                return _gram_axis_xla(xr, xi, j, n)
            # tiny top group: merged-axis kernel Gram, partial-traced back
            pre, X, Xl, M = _merged_view(n, j)
            S, C = gram_high(xr.reshape(pre, X * Xl, M, 128),
                             xi.reshape(pre, X * Xl, M, 128),
                             dot_mode=mode, interpret=interpret)
            return _trace_id(S + 1j * (C.T - C), X, Xl)
        S, C = gram_high(xr.reshape(pre, X, M, 128), xi.reshape(pre, X, M, 128),
                         dot_mode=mode, interpret=interpret)
    return S + 1j * (C.T - C)


# ---------------------------------------------------------------------------
# Reductions (backward diagonals)
# ---------------------------------------------------------------------------

def diag_gram_axis(fxr, fxi, bxr, bxi, j: int, n: int) -> jax.Array:
    """Complex ``W[x] = sum_b bwd[x, b] fwd[x, b]`` over group axis ``j``
    (the all-diag block gradient source, groups.group_diag_gram)."""
    dims = gr.group_dims(n)
    ax = len(dims) - 1 - j
    fr, fi = plane_f32(fxr.reshape(dims)), plane_f32(fxi.reshape(dims))
    br, bi = plane_f32(bxr.reshape(dims)), plane_f32(bxi.reshape(dims))
    axes = tuple(a for a in range(len(dims)) if a != ax)
    wr = jnp.sum(br * fr - bi * fi, axis=axes)
    wi = jnp.sum(br * fi + bi * fr, axis=axes)
    return wr + 1j * wi


def cross_diag_gram(fxr, fxi, bxr, bxi, j2: int, j1: int, n: int) -> jax.Array:
    """Complex ``W2[x2, x1] = sum_b bwd * fwd`` over the two group axes of a
    cross diagonal (its joint-table cotangent)."""
    dims = gr.group_dims(n)
    G = len(dims)
    a2, a1 = G - 1 - j2, G - 1 - j1
    fr, fi = plane_f32(fxr.reshape(dims)), plane_f32(fxi.reshape(dims))
    br, bi = plane_f32(bxr.reshape(dims)), plane_f32(bxi.reshape(dims))
    axes = tuple(a for a in range(G) if a not in (a2, a1))
    wr = jnp.sum(br * fr - bi * fi, axis=axes)
    wi = jnp.sum(br * fi + bi * fr, axis=axes)
    W = wr + 1j * wi  # axes ordered (min(a2,a1), max(a2,a1)) = (a2', a1')
    if a2 > a1:
        W = W.T
    return W  # (dim_j2, dim_j1)


# ---------------------------------------------------------------------------
# One-pass blockwise adjoint step
# ---------------------------------------------------------------------------

def backward_block(fxr, fxi, bxr, bxi, Einv, E, j: int, n: int,
                   *, interpret: bool = False):
    """Uncompute + pair-gram + cotangent transport for one dense block, in a
    single read of the (fwd, bwd) planes:

    ``fwd_in = Einv fwd_out``, ``bwd' = E^T bwd``,
    ``T0[x, y] = sum_b bwd[x, b] fwd_in[y, b]`` (complex, returned dense).

    Returns ``(fxr', fxi', bxr', bxi', T0)``.
    """
    einv_r, einv_i = op_planes(Einv)
    e_r, e_i = op_planes(E)
    mode = config.kernel_dot_mode()
    bmode = config.bwd_kernel_dot_mode()
    gmode = config.gram_kernel_dot_mode()
    if j == 0:
        fr, fi, br, bi, t0r, t0i = block_backward_lane(
            fxr, fxi, bxr, bxi, einv_r, einv_i, e_r, e_i, dot_mode=mode,
            bwd_dot_mode=bmode, gram_dot_mode=gmode, interpret=interpret)
        return fr, fi, br, bi, t0r + 1j * t0i
    if j == 1:
        fr, fi, br, bi, t0r, t0i = block_backward_sublane(
            fxr, fxi, bxr, bxi, einv_r, einv_i, e_r, e_i, dot_mode=mode,
            bwd_dot_mode=bmode, gram_dot_mode=gmode, interpret=interpret)
        return fr, fi, br, bi, t0r + 1j * t0i
    pre, X, M = _high_view(n, j)
    shape4 = (pre, X, M, 128)
    if X >= MIN_KERNEL_X:
        fr, fi, br, bi, t0r, t0i = block_backward_high(
            fxr.reshape(shape4), fxi.reshape(shape4),
            bxr.reshape(shape4), bxi.reshape(shape4),
            einv_r, einv_i, e_r, e_i, dot_mode=config.kernel_dot_mode(), bwd_dot_mode=config.bwd_kernel_dot_mode(),
        gram_dot_mode=config.gram_kernel_dot_mode(),
            interpret=interpret)
        return (fr.reshape(fxr.shape), fi.reshape(fxr.shape),
                br.reshape(fxr.shape), bi.reshape(fxr.shape), t0r + 1j * t0i)
    if j >= 3:
        # tiny top group: merged-axis kernel; the group's pair-gram is the
        # partial trace of the merged one over the kron-identity factor
        pre, X, Xl, M = _merged_view(n, j)
        shape4 = (pre, X * Xl, M, 128)
        einv_r, einv_i = op_planes(_kron_id(Einv, Xl))
        e_r, e_i = op_planes(_kron_id(E, Xl))
        fr, fi, br, bi, t0r, t0i = block_backward_high(
            fxr.reshape(shape4), fxi.reshape(shape4),
            bxr.reshape(shape4), bxi.reshape(shape4),
            einv_r, einv_i, e_r, e_i, dot_mode=config.kernel_dot_mode(), bwd_dot_mode=config.bwd_kernel_dot_mode(),
        gram_dot_mode=config.gram_kernel_dot_mode(),
            interpret=interpret)
        T0 = _trace_id(t0r + 1j * t0i, X, Xl)
        return (fr.reshape(fxr.shape), fi.reshape(fxr.shape),
                br.reshape(fxr.shape), bi.reshape(fxr.shape), T0)
    # tiny group just above the minors: fusable elementwise formulation
    # (see _apply_high_smallx)
    fr, fi = apply_high(fxr, fxi, Einv, j, n, interpret=interpret)
    vfr = plane_f32(fr.reshape(shape4))
    vfi = plane_f32(fi.reshape(shape4))
    vbr = plane_f32(bxr.reshape(shape4))
    vbi = plane_f32(bxi.reshape(shape4))
    # T0[x, y] = sum_batch bwd[x] fwd_in[y]: X^2 fused multiply-reduces
    rows = []
    for x in range(X):
        row = []
        for y in range(X):
            tr = jnp.sum(vbr[:, x] * vfr[:, y]) - jnp.sum(vbi[:, x] * vfi[:, y])
            ti = jnp.sum(vbr[:, x] * vfi[:, y]) + jnp.sum(vbi[:, x] * vfr[:, y])
            row.append(tr + 1j * ti)
        rows.append(jnp.stack(row))
    T0 = jnp.stack(rows)
    ETr, ETi = op_planes(E)
    ET = (jnp.asarray(ETr) + 1j * jnp.asarray(ETi)).T
    br, bi = apply_high(bxr, bxi, ET, j, n, interpret=interpret)
    return fr, fi, br, bi, T0
