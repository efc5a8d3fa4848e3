"""EXPERIMENT (measured negative result — see BENCHMARKS.md): tri-group
fused gate apply on real/imag planes.

Merging the first high group into the dual sweep saves one full-state HBM
pass but measures SLOWER on v5e at every variant tried (unrolled stages:
65 MB register spill -> VMEM OOM; fori_loop stages: 0.90x; interleaved
unrolled stages: 0.90x; the fused backward's four 8 MB IO windows demand
144.75 MB VMEM > the 128 MB chip and cannot compile at X=128). Kept here
with its A/B harness (tools/tri_bench.py) and interpret-mode oracle checks
(`python tools/tri_kernels.py check`) so the next session doesn't repeat
it. Not wired into the engine.


One HBM pass applies full-group operators to the lane group (qubits 0..6),
the sublane group (7..13) AND the first high group (14..14+g-1): the state
is viewed as ``(A1, X, 128, 128)`` with ``X = 2^g`` the high-group axis, a
whole ``X`` column is resident in VMEM per grid cell, and the three
contractions run back-to-back on it — up to 21 qubits' worth of fused gates
per sweep where dual_apply + high_apply needed two sweeps (the reference
applies ONE gate per sweep, primitives.cu:534-545).

The kernels stage through the output refs to bound VMEM: the lane stage
(plus an optional fused diagonal-run pre-multiply, the ddual pattern) runs
in 16-slice row chunks of the X axis, the sublane stage per x-slice, and
the high contraction in sublane-axis column chunks. Every stage loop is a
``lax.fori_loop`` — unrolled Python loops let Mosaic keep all chunk
values live across stages and spill ~65 MB of vector registers (measured:
129.5 MB > the 128 MB v5e VMEM); hardware loops bound the live set to one
chunk. IO windows are demand-sized like block_backward_high.

Exactness: identical dot set to dual_apply + high_apply (Karatsuba complex
matmuls at the configured dot mode); staging keeps f32 when the planes are
f32-stored. Works under ``interpret=True`` on CPU for testing.
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dqc_tpu.ops.pallas import common as cm
from dqc_tpu.ops.pallas.dots import make_dot

F32 = jnp.float32


def _cmul(xr, xi, yr, yi):
    return xr * yr - xi * yi, xr * yi + xi * yr


def _diag_chunk_mul(xr, xi, tsl_r, tsl_i, tas_c_r, tas_c_i, tal_c_r,
                    tal_c_i):
    """x *= Tas[a,s]*Tal[a,l]*Tsl[s,l] on an (rc, 128, 128) chunk with the
    (rc, 128) a-table chunks already sliced."""
    mr, mi = _cmul(
        tas_c_r[:, :, None], tas_c_i[:, :, None],
        tal_c_r[:, None, :], tal_c_i[:, None, :],
    )
    mr, mi = _cmul(mr, mi, tsl_r[:][None, :, :], tsl_i[:][None, :, :])
    return _cmul(xr, xi, mr, mi)


def _kernel(x_dim, dot_mode, has_diag, xr_ref, xi_ref,
            k1, k2, k3,            # lane El^T Karatsuba combinations
            m1, m2, m3,            # sublane Em (left-mult)
            h1, h2, h3,            # high Eh (left-mult)
            *rest):
    if has_diag:
        (tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i), rest = rest[:6], rest[6:]
    yr_ref, yi_ref = rest
    dot = make_dot(dot_mode)
    rc = min(16, x_dim)

    # stage A+B interleaved per rc-slice chunk: diag fold + lane (one
    # batched dot set per chunk) + sublane (per-slice dots), written ONCE
    # to the output refs — unrolled like dual_apply's hot loop, but each
    # chunk's values die at the write so nothing spills across stages
    for c in range(x_dim // rc):
        sl = slice(c * rc, (c + 1) * rc)
        xr = xr_ref[0, sl].astype(F32)
        xi = xi_ref[0, sl].astype(F32)
        if has_diag:
            xr, xi = _diag_chunk_mul(xr, xi, tsl_r, tsl_i,
                                     tas_r[0, sl], tas_i[0, sl],
                                     tal_r[0, sl], tal_i[0, sl])
        x2r = xr.reshape(-1, 128)
        x2i = xi.reshape(-1, 128)
        t1 = dot(x2r + x2i, k1[:])
        t2 = dot(x2i, k2[:])
        t3 = dot(x2r, k3[:])
        yr = (t1 - t2).reshape(rc, 128, 128)
        yi = (t1 + t3).reshape(rc, 128, 128)
        for a in range(rc):
            ar, ai = yr[a], yi[a]
            v1 = dot(m1[:], ar + ai)
            v2 = dot(m2[:], ai)
            v3 = dot(m3[:], ar)
            yr_ref[0, c * rc + a] = (v1 - v2).astype(yr_ref.dtype)
            yi_ref[0, c * rc + a] = (v1 + v3).astype(yi_ref.dtype)

    # stage C: high-group contraction over the X axis, in sublane-axis
    # column chunks (each chunk is read whole, transformed, written back —
    # exact, no cross-chunk dependence)
    ms = 16
    for c in range(128 // ms):
        slm = slice(c * ms, (c + 1) * ms)
        ar = yr_ref[0, :, slm, :].reshape(x_dim, -1).astype(F32)
        ai = yi_ref[0, :, slm, :].reshape(x_dim, -1).astype(F32)
        u1 = dot(h1[:], ar + ai)
        u2 = dot(h2[:], ai)
        u3 = dot(h3[:], ar)
        out3 = (x_dim, ms, 128)
        yr_ref[0, :, slm, :] = (u1 - u2).reshape(out3).astype(yr_ref.dtype)
        yi_ref[0, :, slm, :] = (u1 + u3).reshape(out3).astype(yi_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dot_mode", "alias",
                                             "interpret"))
def tri_group_apply_planes(xr, xi, el_r, el_i, em_r, em_i, eh_r, eh_i, *,
                           dot_mode: str = "f32", alias: bool = True,
                           diag_tables=None, interpret: bool = False):
    """Apply lane operator ``el``, sublane operator ``em`` and high-group
    operator ``eh`` (``X x X``) to plane-layout state ``(A1, X, 128, 128)``
    in ONE HBM pass. ``diag_tables``: the (tsl, tas, tal) real-pair tables
    of a fused diagonal run to pre-multiply BEFORE the gates (the ddual
    pattern, see plane_scan._pair_diag_into_dual) — ``tas``/``tal`` must be
    passed in the ``(A1, X, 128)`` view."""
    assert xr.ndim == 4 and xr.shape[2:] == (128, 128)
    A1, X = xr.shape[:2]
    assert X >= 8 and X & (X - 1) == 0, X
    k1 = el_r.T
    k2 = (el_r + el_i).T
    k3 = (el_i - el_r).T
    m1, m2, m3 = em_r, em_r + em_i, em_i - em_r
    h1, h2, h3 = eh_r, eh_r + eh_i, eh_i - eh_r
    has_diag = diag_tables is not None
    kern = functools.partial(_kernel, X, dot_mode, has_diag)
    big = pl.BlockSpec((1, X, 128, 128), cm.blk4a, memory_space=pltpu.VMEM)
    sm128 = pl.BlockSpec((128, 128), cm.fixed2, memory_space=pltpu.VMEM)
    smX = pl.BlockSpec((X, X), cm.fixed2, memory_space=pltpu.VMEM)
    tab_a = pl.BlockSpec((1, X, 128), cm.blk3, memory_space=pltpu.VMEM)
    in_specs = [big] * 2 + [sm128] * 6 + [smX] * 3
    args = (xr, xi, k1, k2, k3, m1, m2, m3, h1, h2, h3)
    if has_diag:
        in_specs += [sm128, sm128, tab_a, tab_a, tab_a, tab_a]
        args += tuple(diag_tables)
    aliases = {0: 0, 1: 1} if alias else {}
    # demand-sized scoped VMEM: double-buffered IO blocks + chunk
    # temporaries (~24 MB measured at X=128; the 64 MB default rejects the
    # X=128 resident column)
    io = 2 * 2 * X * 128 * 128 * jnp.dtype(xr.dtype).itemsize
    est = 2 * io + 32 * 1024 * 1024
    vmem_limit = min(120 * 1024 * 1024, max(64 * 1024 * 1024, est))
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct(xr.shape, xr.dtype),
                   jax.ShapeDtypeStruct(xr.shape, xr.dtype)),
        grid=(A1,),
        in_specs=in_specs,
        out_specs=(big, big),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=int(vmem_limit),
        ),
        interpret=interpret,
    )(*args)


def _kernel_bwd(x_dim, g0_first, dot_mode, has_diag, diag_q,
                fr_ref, fi_ref, br_ref, bi_ref,
                l_inv1, l_inv2, l_inv3,   # lane E0^-1 (right-mult, transposed)
                l_e1, l_e2, l_e3,         # lane E0 (right-mult for transport)
                s_inv1, s_inv2, s_inv3,   # sublane E1^-1 (left-mult)
                s_e1, s_e2, s_e3,         # sublane E1^T (left-mult)
                h_inv1, h_inv2, h_inv3,   # high Eh^-1 (left-mult)
                h_e1, h_e2, h_e3,         # high Eh^T (left-mult)
                *rest):
    """One-read adjoint of a tri item: high uncompute/gram/transport first
    (it was applied LAST in the forward), then the dual pair (ordering as
    block_backward._kernel_dual), then the optional diag-run roll-back —
    all staged through the output refs on the resident (X, 128, 128)
    column; every stage loop is a hardware fori_loop (see module doc)."""
    if has_diag:
        (isl_r, isl_i, ias_r, ias_i, ial_r, ial_i,
         tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i), rest = rest[:12], rest[12:]
    if diag_q:
        (fir_ref, fii_ref, bnr_ref, bni_ref,
         t0l_r_ref, t0l_i_ref, t0s_r_ref, t0s_i_ref,
         t0h_r_ref, t0h_i_ref,
         qsl_r_ref, qsl_i_ref, qas_r_ref, qas_i_ref,
         qal_r_ref, qal_i_ref) = rest
    else:
        (fir_ref, fii_ref, bnr_ref, bni_ref,
         t0l_r_ref, t0l_i_ref, t0s_r_ref, t0s_i_ref,
         t0h_r_ref, t0h_i_ref) = rest
    dot = make_dot(dot_mode)
    rc = min(16, x_dim)

    # ---- stage H: high-group backward, chunked over sublane columns ----
    ms = 16

    def stage_h(c, acc):
        t0h_r, t0h_i = acc
        slm = pl.ds(c * ms, ms)
        fr = fr_ref[0, :, slm, :].reshape(x_dim, -1).astype(F32)
        fi = fi_ref[0, :, slm, :].reshape(x_dim, -1).astype(F32)
        br = br_ref[0, :, slm, :].reshape(x_dim, -1).astype(F32)
        bi = bi_ref[0, :, slm, :].reshape(x_dim, -1).astype(F32)
        u1 = dot(h_inv1[:], fr + fi)
        u2 = dot(h_inv2[:], fi)
        u3 = dot(h_inv3[:], fr)
        fir = u1 - u2
        fii = u1 + u3
        out3 = (x_dim, ms, 128)
        fir_ref[0, :, slm, :] = fir.reshape(out3).astype(fir_ref.dtype)
        fii_ref[0, :, slm, :] = fii.reshape(out3).astype(fii_ref.dtype)
        sb = br + bi
        p1 = dot(br, fir.T)
        p2 = dot(bi, fii.T)
        p3 = dot(sb, (fir + fii).T)
        v1 = dot(h_e1[:], sb)
        v2 = dot(h_e2[:], bi)
        v3 = dot(h_e3[:], br)
        bnr_ref[0, :, slm, :] = (v1 - v2).reshape(out3).astype(bnr_ref.dtype)
        bni_ref[0, :, slm, :] = (v1 + v3).reshape(out3).astype(bni_ref.dtype)
        return (t0h_r + (p1 - p2), t0h_i + (p3 - p1 - p2))

    t0h_r, t0h_i = lax.fori_loop(
        0, 128 // ms, stage_h,
        (jnp.zeros((x_dim, x_dim), F32), jnp.zeros((x_dim, x_dim), F32)))

    # ---- dual pair on the staged refs (block_backward._kernel_dual) ----
    def lane_chunks(acc):
        def body(c, a):
            t0l_r, t0l_i = a
            sl = pl.ds(c * rc, rc)
            fr = fir_ref[0, sl].reshape(-1, 128).astype(F32)
            fi = fii_ref[0, sl].reshape(-1, 128).astype(F32)
            br = bnr_ref[0, sl].reshape(-1, 128).astype(F32)
            bi = bni_ref[0, sl].reshape(-1, 128).astype(F32)
            u1 = dot(fr + fi, l_inv1[:])
            u2 = dot(fi, l_inv2[:])
            u3 = dot(fr, l_inv3[:])
            f0r, f0i = u1 - u2, u1 + u3
            sb = br + bi
            p1 = dot(br.T, f0r)
            p2 = dot(bi.T, f0i)
            p3 = dot(sb.T, f0r + f0i)
            v1 = dot(sb, l_e1[:])
            v2 = dot(bi, l_e2[:])
            v3 = dot(br, l_e3[:])
            out3 = (rc, 128, 128)
            fir_ref[0, sl] = f0r.reshape(out3).astype(fir_ref.dtype)
            fii_ref[0, sl] = f0i.reshape(out3).astype(fii_ref.dtype)
            bnr_ref[0, sl] = (v1 - v2).reshape(out3).astype(bnr_ref.dtype)
            bni_ref[0, sl] = (v1 + v3).reshape(out3).astype(bni_ref.dtype)
            return (t0l_r + (p1 - p2), t0l_i + (p3 - p1 - p2))

        return lax.fori_loop(0, x_dim // rc, body, acc)

    def sub_slices(acc):
        def body(x, a):
            t0s_r, t0s_i = a
            fr = fir_ref[0, x].astype(F32)
            fi = fii_ref[0, x].astype(F32)
            br = bnr_ref[0, x].astype(F32)
            bi = bni_ref[0, x].astype(F32)
            u1 = dot(s_inv1[:], fr + fi)
            u2 = dot(s_inv2[:], fi)
            u3 = dot(s_inv3[:], fr)
            f1r, f1i = u1 - u2, u1 + u3
            sb = br + bi
            p1 = dot(br, f1r.T)
            p2 = dot(bi, f1i.T)
            p3 = dot(sb, (f1r + f1i).T)
            v1 = dot(s_e1[:], sb)
            v2 = dot(s_e2[:], bi)
            v3 = dot(s_e3[:], br)
            fir_ref[0, x] = f1r.astype(fir_ref.dtype)
            fii_ref[0, x] = f1i.astype(fii_ref.dtype)
            bnr_ref[0, x] = (v1 - v2).astype(bnr_ref.dtype)
            bni_ref[0, x] = (v1 + v3).astype(bni_ref.dtype)
            return (t0s_r + (p1 - p2), t0s_i + (p3 - p1 - p2))

        return lax.fori_loop(0, x_dim, body, acc)

    def z128():
        return (jnp.zeros((128, 128), F32), jnp.zeros((128, 128), F32))

    if g0_first:
        # forward tape order [B0(lane), B1(sublane)]: sublane rolls back first
        t0s_r, t0s_i = sub_slices(z128())
        t0l_r, t0l_i = lane_chunks(z128())
    else:
        t0l_r, t0l_i = lane_chunks(z128())
        t0s_r, t0s_i = sub_slices(z128())

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        t0l_r_ref[:] = jnp.zeros_like(t0l_r_ref)
        t0l_i_ref[:] = jnp.zeros_like(t0l_i_ref)
        t0s_r_ref[:] = jnp.zeros_like(t0s_r_ref)
        t0s_i_ref[:] = jnp.zeros_like(t0s_i_ref)
        t0h_r_ref[:] = jnp.zeros_like(t0h_r_ref)
        t0h_i_ref[:] = jnp.zeros_like(t0h_i_ref)

    t0l_r_ref[:] += t0l_r
    t0l_i_ref[:] += t0l_i
    t0s_r_ref[:] += t0s_r
    t0s_i_ref[:] += t0s_i
    t0h_r_ref[:] += t0h_r
    t0h_i_ref[:] += t0h_i

    if has_diag:
        # diag run preceded the dual in the forward: Q pair products first
        # (order-invariant reductions), then fwd *= D^-1, bwd *= D
        def stage_d(c, acc):
            qsl_r, qsl_i = acc
            sl = pl.ds(c * rc, rc)
            fr = fir_ref[0, sl].astype(F32)
            fi = fii_ref[0, sl].astype(F32)
            br = bnr_ref[0, sl].astype(F32)
            bi = bni_ref[0, sl].astype(F32)
            if diag_q:
                qr, qi = _cmul(br, bi, fr, fi)
                qsl_r = qsl_r + jnp.sum(qr, axis=0)
                qsl_i = qsl_i + jnp.sum(qi, axis=0)
                qas_r_ref[0, sl] = jnp.sum(qr, axis=2).astype(F32)
                qas_i_ref[0, sl] = jnp.sum(qi, axis=2).astype(F32)
                qal_r_ref[0, sl] = jnp.sum(qr, axis=1).astype(F32)
                qal_i_ref[0, sl] = jnp.sum(qi, axis=1).astype(F32)
            fr, fi = _diag_chunk_mul(fr, fi, isl_r, isl_i,
                                     ias_r[0, sl], ias_i[0, sl],
                                     ial_r[0, sl], ial_i[0, sl])
            br, bi = _diag_chunk_mul(br, bi, tsl_r, tsl_i,
                                     tas_r[0, sl], tas_i[0, sl],
                                     tal_r[0, sl], tal_i[0, sl])
            fir_ref[0, sl] = fr.astype(fir_ref.dtype)
            fii_ref[0, sl] = fi.astype(fii_ref.dtype)
            bnr_ref[0, sl] = br.astype(bnr_ref.dtype)
            bni_ref[0, sl] = bi.astype(bni_ref.dtype)
            return (qsl_r, qsl_i)

        qsl_r, qsl_i = lax.fori_loop(0, x_dim // rc, stage_d, z128())
        if diag_q:
            @pl.when(first)
            def _():
                qsl_r_ref[:] = jnp.zeros_like(qsl_r_ref)
                qsl_i_ref[:] = jnp.zeros_like(qsl_i_ref)

            qsl_r_ref[:] += qsl_r
            qsl_i_ref[:] += qsl_i


@functools.partial(jax.jit, static_argnames=("g0_first", "dot_mode",
                                             "diag_q", "interpret"))
def tri_block_backward(fr, fi, br, bi,
                       e0inv_r, e0inv_i, e0_r, e0_i,
                       e1inv_r, e1inv_i, e1_r, e1_i,
                       ehinv_r, ehinv_i, eh_r, eh_i,
                       *, g0_first: bool = True, dot_mode: str = "f32",
                       diag_inv_tables=None, diag_tables=None,
                       diag_q: bool = False, interpret: bool = False):
    """One-pass adjoint for a tri item (dual pair + first-high-group block,
    optionally with a folded diagonal run): ONE read of the (fwd, bwd)
    plane pairs in the ``(A1, X, 128, 128)`` view produces the uncomputed
    forward, the transported cotangent, and the three pair-grams
    ``(T0_lane, T0_sub, T0_high)`` (+ the diag-run Q reductions when
    ``diag_q``) — the backward mirror of :func:`tri_group_apply_planes`;
    separate kernels need two reads (block_backward_dual +
    block_backward_high). ``tas/tal`` diag tables in the ``(A1, X, 128)``
    view. Returns ``(f_r, f_i, b_r, b_i, t0l_r, t0l_i, t0s_r, t0s_i,
    t0h_r, t0h_i[, qsl_r, qsl_i, qas_r, qas_i, qal_r, qal_i])``.
    """
    assert fr.ndim == 4 and fr.shape[2:] == (128, 128)
    A1, X = fr.shape[:2]
    assert X >= 8 and X & (X - 1) == 0, X
    l_inv = e0inv_r.T, (e0inv_r + e0inv_i).T, (e0inv_i - e0inv_r).T
    l_e = e0_r, e0_r + e0_i, e0_i - e0_r
    s_inv = e1inv_r, e1inv_r + e1inv_i, e1inv_i - e1inv_r
    s_e = e1_r.T, (e1_r + e1_i).T, (e1_i - e1_r).T
    h_inv = ehinv_r, ehinv_r + ehinv_i, ehinv_i - ehinv_r
    h_e = eh_r.T, (eh_r + eh_i).T, (eh_i - eh_r).T
    has_diag = diag_tables is not None
    kern = functools.partial(_kernel_bwd, X, g0_first, dot_mode, has_diag,
                             diag_q and has_diag)
    big = pl.BlockSpec((1, X, 128, 128), cm.blk4a, memory_space=pltpu.VMEM)
    sm128 = pl.BlockSpec((128, 128), cm.fixed2, memory_space=pltpu.VMEM)
    smX = pl.BlockSpec((X, X), cm.fixed2, memory_space=pltpu.VMEM)
    tab_a = pl.BlockSpec((1, X, 128), cm.blk3, memory_space=pltpu.VMEM)
    in_specs = [big] * 4 + [sm128] * 12 + [smX] * 6
    args = ((fr, fi, br, bi) + l_inv + l_e + s_inv + s_e + h_inv + h_e)
    fbig = jax.ShapeDtypeStruct(fr.shape, fr.dtype)
    bbig = jax.ShapeDtypeStruct(br.shape, br.dtype)
    small = jax.ShapeDtypeStruct((128, 128), F32)
    smallX = jax.ShapeDtypeStruct((X, X), F32)
    out_shape = (fbig, fbig, bbig, bbig, small, small, small, small,
                 smallX, smallX)
    out_specs = (big,) * 4 + (sm128,) * 4 + (smX,) * 2
    if has_diag:
        for tabs in (diag_inv_tables, diag_tables):
            in_specs += [sm128, sm128, tab_a, tab_a, tab_a, tab_a]
            args += tuple(tabs)
        if diag_q:
            a_sh = jax.ShapeDtypeStruct((A1, X, 128), F32)
            out_shape += (small, small, a_sh, a_sh, a_sh, a_sh)
            out_specs += (sm128, sm128, tab_a, tab_a, tab_a, tab_a)
    io = 2 * 2 * X * 128 * 128 * (jnp.dtype(fr.dtype).itemsize
                                  + jnp.dtype(br.dtype).itemsize)
    est = 2 * io + 16 * 1024 * 1024
    vmem_limit = min(120 * 1024 * 1024, max(64 * 1024 * 1024, est))
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(A1,),
        in_specs=in_specs,
        out_specs=out_specs,
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=int(vmem_limit),
        ),
        interpret=interpret,
    )(*args)


def _check():
    """Interpret-mode oracle checks for both kernels (CPU)."""
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)
    A, X = 32, 16
    A1 = A // X

    def randc(*s):
        return (rng.standard_normal(s)
                + 1j * rng.standard_normal(s)).astype(np.complex64)

    def randu(k):
        q, _ = np.linalg.qr(rng.standard_normal((k, k))
                            + 1j * rng.standard_normal((k, k)))
        return q.astype(np.complex64)

    st = randc(A * 128 * 128)
    El, Em, Eh = randu(128), randu(128), randu(X)
    t = lambda x: jnp.asarray(np.ascontiguousarray(x))
    xr = jnp.asarray(st.real.reshape(A1, X, 128, 128))
    xi = jnp.asarray(st.imag.reshape(A1, X, 128, 128))
    yr, yi = tri_group_apply_planes(
        xr, xi, t(El.real), t(El.imag), t(Em.real), t(Em.imag),
        t(Eh.real), t(Eh.imag), interpret=True)
    got = (np.asarray(yr, np.float64)
           + 1j * np.asarray(yi, np.float64)).reshape(A1, X, 128, 128)
    tt = st.reshape(A1, X, 128, 128).astype(np.complex128)
    tt = np.einsum("axsl,ml->axsm", tt, El.astype(np.complex128))
    tt = np.einsum("ts,axsl->axtl", Em.astype(np.complex128), tt)
    tt = np.einsum("yx,axsl->aysl", Eh.astype(np.complex128), tt)
    err = np.abs(got - tt).max() / np.abs(tt).max()
    assert err < 5e-6, err
    print(f"forward oracle OK (rel err {err:.2e})")

    from dqc_tpu.ops.pallas.block_backward import (block_backward_dual,
                                                   block_backward_high)

    fr, fi, br, bi = (jnp.asarray(
        rng.standard_normal((A, 128, 128)).astype(np.float32))
        for _ in range(4))
    pl_ = lambda E: (t(E.real), t(E.imag))
    inv_ = lambda E: pl_(np.conj(E.T))
    v = lambda x: x.reshape(A1, X, 128, 128)
    u = lambda x: x.reshape(A, 128, 128)
    f2 = block_backward_high(v(fr), v(fi), v(br), v(bi), *inv_(Eh), *pl_(Eh),
                             interpret=True)
    ref = block_backward_dual(u(f2[0]), u(f2[1]), u(f2[2]), u(f2[3]),
                              *inv_(El), *pl_(El), *inv_(Em), *pl_(Em),
                              g0_first=True, interpret=True)
    out = tri_block_backward(v(fr), v(fi), v(br), v(bi),
                             *inv_(El), *pl_(El), *inv_(Em), *pl_(Em),
                             *inv_(Eh), *pl_(Eh), g0_first=True,
                             interpret=True)
    pairs = [(out[0], v(ref[0])), (out[1], v(ref[1])), (out[2], v(ref[2])),
             (out[3], v(ref[3])), (out[4], ref[4]), (out[5], ref[5]),
             (out[6], ref[6]), (out[7], ref[7]), (out[8], f2[4]),
             (out[9], f2[5])]
    worst = 0.0
    for a, b in pairs:
        err = float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max())
        scale = max(float(jnp.abs(jnp.asarray(b)).max()), 1e-9)
        worst = max(worst, err / scale)
        assert err / scale < 2e-5, (err / scale)
    print(f"backward oracle OK (worst rel {worst:.2e})")


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "check":
        _check()
