"""Pallas TPU kernel: one-pass blockwise adjoint step (lane group).

The backward pass of a fused block does three big contractions (see
circuit/fused_autograd.py): uncompute ``fwd_in = E^-1 fwd_out``, the
pair-gram ``T0 = sum_b bwd[x,b] fwd_in[y,b]`` and cotangent transport
``bwd' = E^T bwd`` — in XLA that is three separate complex matmuls, each
streaming the statevector through HBM (~6 array passes). This kernel reads
the (fwd, bwd) planes into VMEM once and produces all three outputs in a
single pass (~4 array passes): per grid step, Karatsuba complex dots for the
two applies plus a T0 partial accumulated across the sequential TPU grid.

Lane-group (qubits 0..6) variant; the same structure generalizes per axis.
Standalone building block for the round-2 plane-layout engine (see
STATUS.md); tested in interpret mode, measured on v5e via /tmp-style
microbenches.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dqc_tpu.ops.pallas import common as cm
from dqc_tpu.ops.pallas.dots import make_dot

F32 = jnp.float32
HI = jax.lax.Precision.HIGHEST


def _kernel(a_blk, dot_mode, bwd_dot_mode, gram_dot_mode,
            fr_ref, fi_ref, br_ref, bi_ref,
            inv_t1, inv_t2, inv_t3,      # Karatsuba operands of E^-1 (transposed)
            e_t1, e_t2, e_t3,            # Karatsuba operands of E (right-multiply)
            fir_ref, fii_ref, bnr_ref, bni_ref, t0r_ref, t0i_ref):
    dot = make_dot(dot_mode)
    bdot = make_dot(bwd_dot_mode)
    gdot = make_dot(gram_dot_mode)  # pair-gram dots (leaf outputs)

    # plane refs may be stored reduced (config.set_state_storage): loads
    # upcast to f32, all VMEM compute is f32, stores downcast
    fr = cm.f32_of(fr_ref[:].reshape(-1, 128))
    fi = cm.f32_of(fi_ref[:].reshape(-1, 128))
    br = cm.f32_of(br_ref[:].reshape(-1, 128))
    bi = cm.f32_of(bi_ref[:].reshape(-1, 128))

    # fwd_in = fwd_out @ Einv^T   (complex Karatsuba: 3 dots)
    u1 = dot(fr + fi, inv_t1[:])
    u2 = dot(fi, inv_t2[:])
    u3 = dot(fr, inv_t3[:])
    fir = u1 - u2
    fii = u1 + u3
    fir_ref[:] = cm.store_as(fir.reshape(fir_ref.shape), fir_ref.dtype)
    fii_ref[:] = cm.store_as(fii.reshape(fii_ref.shape), fii_ref.dtype)

    # bwd' = bwd @ E   (transport by E^T on the lane axis)
    sb = br + bi
    v1 = bdot(sb, e_t1[:])
    v2 = bdot(bi, e_t2[:])
    v3 = bdot(br, e_t3[:])
    bnr_ref[:] = cm.store_as((v1 - v2).reshape(bnr_ref.shape), bnr_ref.dtype)
    bni_ref[:] = cm.store_as((v1 + v3).reshape(bni_ref.shape), bni_ref.dtype)

    # T0 += bwd^T @ fwd_in (complex, NO conjugation — holomorphic pair gram)
    # Karatsuba, reusing the transport's (br+bi) operand: 3 dots, not 4
    p1 = gdot(br.T, fir)
    p2 = gdot(bi.T, fii)
    p3 = gdot(sb.T, fir + fii)
    t0r = p1 - p2
    t0i = p3 - p1 - p2

    @pl.when(pl.program_id(0) == 0)
    def _():
        t0r_ref[:] = jnp.zeros_like(t0r_ref)
        t0i_ref[:] = jnp.zeros_like(t0i_ref)

    t0r_ref[:] += t0r
    t0i_ref[:] += t0i


@functools.partial(jax.jit, static_argnames=("a_blk", "dot_mode",
                                             "bwd_dot_mode", "gram_dot_mode",
                                             "interpret"))
def block_backward_lane(fr, fi, br, bi, einv_r, einv_i, e_r, e_i,
                        *, a_blk: int = 4, dot_mode: str = "f32",
                        bwd_dot_mode: str = None,
                        gram_dot_mode: str = None,
                        interpret: bool = False):
    """One-pass adjoint step for a lane-group block.

    Returns ``(fwd_in_r, fwd_in_i, bwd_new_r, bwd_new_i, T0_r, T0_i)`` where
    ``fwd_in = E^-1 fwd_out``, ``bwd_new = E^T bwd`` and
    ``T0[x, y] = sum_batch bwd[.., x] * fwd_in[.., y]``.
    """
    assert fr.ndim == 3 and fr.shape[1:] == (128, 128)
    A = fr.shape[0]
    if A % a_blk:
        a_blk = 1
    # right-multiply forms: apply(M) == x @ M^T; Karatsuba combinations
    inv_t = einv_r.T, (einv_r + einv_i).T, (einv_i - einv_r).T
    # transport: bwd' = bwd @ (E^T)^T = bwd @ E — combinations of E itself
    e_t = e_r, e_r + e_i, e_i - e_r
    bs = cm.blk3
    es = cm.fixed2
    kern = functools.partial(_kernel, a_blk, dot_mode,
                             bwd_dot_mode or dot_mode,
                             gram_dot_mode or bwd_dot_mode or dot_mode)
    fbig = jax.ShapeDtypeStruct(fr.shape, fr.dtype)  # fwd pair keeps its storage
    bbig = jax.ShapeDtypeStruct(br.shape, br.dtype)  # bwd pair keeps its storage
    small = jax.ShapeDtypeStruct((128, 128), F32)
    return pl.pallas_call(
        kern,
        out_shape=(fbig, fbig, bbig, bbig, small, small),
        grid=(A // a_blk,),
        in_specs=[pl.BlockSpec((a_blk, 128, 128), bs, memory_space=pltpu.VMEM)] * 4
                + [pl.BlockSpec((128, 128), es, memory_space=pltpu.VMEM)] * 6,
        out_specs=(pl.BlockSpec((a_blk, 128, 128), bs, memory_space=pltpu.VMEM),) * 4
                 + (pl.BlockSpec((128, 128), es, memory_space=pltpu.VMEM),) * 2,
        # (fwd_in, bwd') overwrite (fwd_out, bwd): halves peak state memory
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(fr, fi, br, bi, *inv_t, *e_t)


def _kernel_sub(a_blk, dot_mode, bwd_dot_mode, gram_dot_mode,
                fr_ref, fi_ref, br_ref, bi_ref,
                inv1, inv2, inv3,        # Karatsuba operands of E^-1 (left-mult)
                e1, e2, e3,              # Karatsuba operands of E^T (left-mult)
                fir_ref, fii_ref, bnr_ref, bni_ref, t0r_ref, t0i_ref):
    dot = make_dot(dot_mode)
    bdot = make_dot(bwd_dot_mode)
    gdot = make_dot(gram_dot_mode)

    t0r_acc = jnp.zeros((128, 128), F32)
    t0i_acc = jnp.zeros((128, 128), F32)
    for a in range(a_blk):
        fr = cm.f32_of(fr_ref[a])
        fi = cm.f32_of(fi_ref[a])
        br = cm.f32_of(br_ref[a])
        bi = cm.f32_of(bi_ref[a])
        # fwd_in = Einv @ fwd_out (sublane axis = left matmul per slice)
        u1 = dot(inv1[:], fr + fi)
        u2 = dot(inv2[:], fi)
        u3 = dot(inv3[:], fr)
        fir = u1 - u2
        fii = u1 + u3
        fir_ref[a, :, :] = cm.store_as(fir, fir_ref.dtype)
        fii_ref[a, :, :] = cm.store_as(fii, fii_ref.dtype)
        # bwd' = E^T @ bwd
        sb = br + bi
        v1 = bdot(e1[:], sb)
        v2 = bdot(e2[:], bi)
        v3 = bdot(e3[:], br)
        bnr_ref[a, :, :] = cm.store_as((v1 - v2), bnr_ref.dtype)
        bni_ref[a, :, :] = cm.store_as((v1 + v3), bni_ref.dtype)
        # T0[x, y] += sum_c bwd[x, c] fwd_in[y, c]  (contract the lane axis)
        # Karatsuba (3 dots), reusing the transport's (br+bi) operand
        p1 = gdot(br, fir.T)
        p2 = gdot(bi, fii.T)
        p3 = gdot(sb, (fir + fii).T)
        t0r_acc += p1 - p2
        t0i_acc += p3 - p1 - p2

    @pl.when(pl.program_id(0) == 0)
    def _():
        t0r_ref[:] = jnp.zeros_like(t0r_ref)
        t0i_ref[:] = jnp.zeros_like(t0i_ref)

    t0r_ref[:] += t0r_acc
    t0i_ref[:] += t0i_acc


@functools.partial(jax.jit, static_argnames=("a_blk", "dot_mode",
                                             "bwd_dot_mode", "gram_dot_mode",
                                             "interpret"))
def block_backward_sublane(fr, fi, br, bi, einv_r, einv_i, e_r, e_i,
                           *, a_blk: int = 4, dot_mode: str = "f32",
                           bwd_dot_mode: str = None,
                           gram_dot_mode: str = None,
                           interpret: bool = False):
    """One-pass adjoint step for a sublane-group (qubits 7..13) block.

    Same contract as :func:`block_backward_lane` with the group operator on
    the second-to-last axis: ``fwd_in = E^-1 fwd_out``, ``bwd' = E^T bwd``,
    ``T0[x, y] = sum_batch bwd[.., x, c] fwd_in[.., y, c]``.
    """
    assert fr.ndim == 3 and fr.shape[1:] == (128, 128)
    A = fr.shape[0]
    if A % a_blk:
        a_blk = 1
    inv = einv_r, einv_r + einv_i, einv_i - einv_r
    et = e_r.T, (e_r + e_i).T, (e_i - e_r).T
    bs = cm.blk3
    es = cm.fixed2
    kern = functools.partial(_kernel_sub, a_blk, dot_mode,
                             bwd_dot_mode or dot_mode,
                             gram_dot_mode or bwd_dot_mode or dot_mode)
    fbig = jax.ShapeDtypeStruct(fr.shape, fr.dtype)
    bbig = jax.ShapeDtypeStruct(br.shape, br.dtype)
    small = jax.ShapeDtypeStruct((128, 128), F32)
    return pl.pallas_call(
        kern,
        out_shape=(fbig, fbig, bbig, bbig, small, small),
        grid=(A // a_blk,),
        in_specs=[pl.BlockSpec((a_blk, 128, 128), bs, memory_space=pltpu.VMEM)] * 4
                + [pl.BlockSpec((128, 128), es, memory_space=pltpu.VMEM)] * 6,
        out_specs=(pl.BlockSpec((a_blk, 128, 128), bs, memory_space=pltpu.VMEM),) * 4
                 + (pl.BlockSpec((128, 128), es, memory_space=pltpu.VMEM),) * 2,
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(fr, fi, br, bi, *inv, *et)


def _cmul(xr, xi, yr, yi):
    return xr * yr - xi * yi, xr * yi + xi * yr


def _diag_tile_mul(xr, xi, tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i):
    """x *= Tas[a,s]*Tal[a,l]*Tsl[s,l] on an (a_blk, 128, 128) tile."""
    mr, mi = _cmul(
        tas_r[:][:, :, None], tas_i[:][:, :, None],
        tal_r[:][:, None, :], tal_i[:][:, None, :],
    )
    mr, mi = _cmul(mr, mi, tsl_r[:][None, :, :], tsl_i[:][None, :, :])
    return _cmul(xr, xi, mr, mi)


def _kernel_dual(a_blk, g0_first, dot_mode, bwd_dot_mode, gram_dot_mode,
                 has_diag,
                 diag_first_fwd, diag_q,
                 fr_ref, fi_ref, br_ref, bi_ref,
                 l_inv1, l_inv2, l_inv3,   # lane E0^-1 (right-mult, transposed)
                 l_e1, l_e2, l_e3,         # lane E0 (right-mult for transport)
                 s_inv1, s_inv2, s_inv3,   # sublane E1^-1 (left-mult)
                 s_e1, s_e2, s_e3,         # sublane E1^T (left-mult)
                 *rest):
    """Adjoint step for a lane-group AND a sublane-group block in ONE read of
    the (fwd, bwd) planes. ``g0_first``: True when the lane block precedes
    the sublane block in tape order (then the sublane block is uncomputed
    first). ``diag_first_fwd``: the fused run preceded the dual in the
    forward ([run, dual] — rolled back dense-then-run); False = [dual, run]
    (run rolled back FIRST, before the dense stages)."""
    if has_diag:
        (isl_r, isl_i, ias_r, ias_i, ial_r, ial_i,
         tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i), rest = rest[:12], rest[12:]
    if diag_q:
        (fir_ref, fii_ref, bnr_ref, bni_ref,
         t0l_r_ref, t0l_i_ref, t0s_r_ref, t0s_i_ref,
         qsl_r_ref, qsl_i_ref, qas_r_ref, qas_i_ref,
         qal_r_ref, qal_i_ref) = rest
    else:
        (fir_ref, fii_ref, bnr_ref, bni_ref,
         t0l_r_ref, t0l_i_ref, t0s_r_ref, t0s_i_ref) = rest
    dot = make_dot(dot_mode)
    bdot = make_dot(bwd_dot_mode)
    gdot = make_dot(gram_dot_mode)

    t0l_r = jnp.zeros((128, 128), F32)
    t0l_i = jnp.zeros((128, 128), F32)
    t0s_r = jnp.zeros((128, 128), F32)
    t0s_i = jnp.zeros((128, 128), F32)

    def lane_full(fr, fi, br, bi, accum):
        # lane ops act on the full (a_blk*128, 128) tile at once — one big
        # GEMM per dot instead of a_blk MXU-fill-bound 128^3 dots
        u1 = dot(fr + fi, l_inv1[:])
        u2 = dot(fi, l_inv2[:])
        u3 = dot(fr, l_inv3[:])
        f0r, f0i = u1 - u2, u1 + u3
        sb = br + bi
        p1 = gdot(br.T, f0r)
        p2 = gdot(bi.T, f0i)
        p3 = gdot(sb.T, f0r + f0i)
        tr = p1 - p2
        ti = p3 - p1 - p2
        v1 = bdot(sb, l_e1[:])
        v2 = bdot(bi, l_e2[:])
        v3 = bdot(br, l_e3[:])
        return f0r, f0i, v1 - v2, v1 + v3, accum[0] + tr, accum[1] + ti

    def sub_step(fr, fi, br, bi, accum):
        # fwd_in = E1inv @ fwd; T0_sub over columns; bwd' = E1^T @ bwd
        # (left-multiplies: inherently per a-slice)
        u1 = dot(s_inv1[:], fr + fi)
        u2 = dot(s_inv2[:], fi)
        u3 = dot(s_inv3[:], fr)
        f1r, f1i = u1 - u2, u1 + u3
        sb = br + bi
        p1 = gdot(br, f1r.T)
        p2 = gdot(bi, f1i.T)
        p3 = gdot(sb, (f1r + f1i).T)
        tr = p1 - p2
        ti = p3 - p1 - p2
        v1 = bdot(s_e1[:], sb)
        v2 = bdot(s_e2[:], bi)
        v3 = bdot(s_e3[:], br)
        return f1r, f1i, v1 - v2, v1 + v3, accum[0] + tr, accum[1] + ti

    # plane refs may be stored reduced (config.set_state_storage): every ref
    # read upcasts to f32 (including re-reads of values staged through the
    # output refs), every ref store downcasts
    src_f, src_fi, src_b, src_bi = fr_ref, fi_ref, br_ref, bi_ref
    if has_diag and not diag_first_fwd:
        # forward was [dual, run]: roll (fwd, bwd) through the run FIRST —
        # Q pair product before the updates (diag.py semantics), staged
        # through the output refs for the dense stages below
        fr_c = cm.f32_of(fr_ref[:])
        fi_c = cm.f32_of(fi_ref[:])
        br_c = cm.f32_of(br_ref[:])
        bi_c = cm.f32_of(bi_ref[:])
        if diag_q:
            qr, qi = _cmul(br_c, bi_c, fr_c, fi_c)

            @pl.when(pl.program_id(0) == 0)
            def _():
                qsl_r_ref[:] = jnp.zeros_like(qsl_r_ref)
                qsl_i_ref[:] = jnp.zeros_like(qsl_i_ref)

            qsl_r_ref[:] += jnp.sum(qr, axis=0)
            qsl_i_ref[:] += jnp.sum(qi, axis=0)
            qas_r_ref[:] = jnp.sum(qr, axis=2)
            qas_i_ref[:] = jnp.sum(qi, axis=2)
            qal_r_ref[:] = jnp.sum(qr, axis=1)
            qal_i_ref[:] = jnp.sum(qi, axis=1)
        fr_c, fi_c = _diag_tile_mul(fr_c, fi_c, isl_r, isl_i, ias_r, ias_i,
                                    ial_r, ial_i)
        br_c, bi_c = _diag_tile_mul(br_c, bi_c, tsl_r, tsl_i, tas_r, tas_i,
                                    tal_r, tal_i)
        fir_ref[:] = cm.store_as(fr_c, fir_ref.dtype)
        fii_ref[:] = cm.store_as(fi_c, fii_ref.dtype)
        bnr_ref[:] = cm.store_as(br_c, bnr_ref.dtype)
        bni_ref[:] = cm.store_as(bi_c, bni_ref.dtype)
        src_f, src_fi, src_b, src_bi = fir_ref, fii_ref, bnr_ref, bni_ref
    if g0_first:
        # tape order [B0(lane), B1(sublane)] -> uncompute sublane first
        # (per slice, staged through the output refs), then lane on the tile
        for a in range(a_blk):
            f1r, f1i, b1r, b1i, t0s_r, t0s_i = sub_step(
                cm.f32_of(src_f[a]), cm.f32_of(src_fi[a]),
                cm.f32_of(src_b[a]), cm.f32_of(src_bi[a]), (t0s_r, t0s_i))
            fir_ref[a, :, :] = cm.store_as(f1r, fir_ref.dtype)
            fii_ref[a, :, :] = cm.store_as(f1i, fii_ref.dtype)
            bnr_ref[a, :, :] = cm.store_as(b1r, bnr_ref.dtype)
            bni_ref[a, :, :] = cm.store_as(b1i, bni_ref.dtype)
        fr = cm.f32_of(fir_ref[:].reshape(-1, 128))
        fi = cm.f32_of(fii_ref[:].reshape(-1, 128))
        br = cm.f32_of(bnr_ref[:].reshape(-1, 128))
        bi = cm.f32_of(bni_ref[:].reshape(-1, 128))
        f0r, f0i, b0r, b0i, t0l_r, t0l_i = lane_full(fr, fi, br, bi,
                                                     (t0l_r, t0l_i))
        fir_ref[:] = cm.store_as(f0r.reshape(fir_ref.shape), fir_ref.dtype)
        fii_ref[:] = cm.store_as(f0i.reshape(fii_ref.shape), fii_ref.dtype)
        bnr_ref[:] = cm.store_as(b0r.reshape(bnr_ref.shape), bnr_ref.dtype)
        bni_ref[:] = cm.store_as(b0i.reshape(bni_ref.shape), bni_ref.dtype)
    else:
        # tape order [B1(sublane), B0(lane)] -> lane first on the full tile
        fr = cm.f32_of(src_f[:]).reshape(-1, 128)
        fi = cm.f32_of(src_fi[:]).reshape(-1, 128)
        br = cm.f32_of(src_b[:]).reshape(-1, 128)
        bi = cm.f32_of(src_bi[:]).reshape(-1, 128)
        f0r, f0i, b0r, b0i, t0l_r, t0l_i = lane_full(fr, fi, br, bi,
                                                     (t0l_r, t0l_i))
        fir_ref[:] = cm.store_as(f0r.reshape(fir_ref.shape), fir_ref.dtype)
        fii_ref[:] = cm.store_as(f0i.reshape(fii_ref.shape), fii_ref.dtype)
        bnr_ref[:] = cm.store_as(b0r.reshape(bnr_ref.shape), bnr_ref.dtype)
        bni_ref[:] = cm.store_as(b0i.reshape(bni_ref.shape), bni_ref.dtype)
        for a in range(a_blk):
            f1r, f1i, b1r, b1i, t0s_r, t0s_i = sub_step(
                cm.f32_of(fir_ref[a]), cm.f32_of(fii_ref[a]),
                cm.f32_of(bnr_ref[a]), cm.f32_of(bni_ref[a]), (t0s_r, t0s_i))
            fir_ref[a, :, :] = cm.store_as(f1r, fir_ref.dtype)
            fii_ref[a, :, :] = cm.store_as(f1i, fii_ref.dtype)
            bnr_ref[a, :, :] = cm.store_as(b1r, bnr_ref.dtype)
            bni_ref[a, :, :] = cm.store_as(b1i, bni_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():
        t0l_r_ref[:] = jnp.zeros_like(t0l_r_ref)
        t0l_i_ref[:] = jnp.zeros_like(t0l_i_ref)
        t0s_r_ref[:] = jnp.zeros_like(t0s_r_ref)
        t0s_i_ref[:] = jnp.zeros_like(t0s_i_ref)

    t0l_r_ref[:] += t0l_r
    t0l_i_ref[:] += t0l_i
    t0s_r_ref[:] += t0s_r
    t0s_i_ref[:] += t0s_i

    if has_diag and diag_first_fwd:
        # the diagonal run preceded the dual in the forward: roll (fwd, bwd)
        # through it here — Q pair product BEFORE the updates, then
        # fwd *= D_inv, bwd *= D (ops/pallas/diag.py semantics)
        fr_c = cm.f32_of(fir_ref[:])
        fi_c = cm.f32_of(fii_ref[:])
        br_c = cm.f32_of(bnr_ref[:])
        bi_c = cm.f32_of(bni_ref[:])
        if diag_q:
            qr, qi = _cmul(br_c, bi_c, fr_c, fi_c)

            @pl.when(pl.program_id(0) == 0)
            def _():
                qsl_r_ref[:] = jnp.zeros_like(qsl_r_ref)
                qsl_i_ref[:] = jnp.zeros_like(qsl_i_ref)

            qsl_r_ref[:] += jnp.sum(qr, axis=0)
            qsl_i_ref[:] += jnp.sum(qi, axis=0)
            qas_r_ref[:] = jnp.sum(qr, axis=2)
            qas_i_ref[:] = jnp.sum(qi, axis=2)
            qal_r_ref[:] = jnp.sum(qr, axis=1)
            qal_i_ref[:] = jnp.sum(qi, axis=1)
        fr_c, fi_c = _diag_tile_mul(fr_c, fi_c, isl_r, isl_i, ias_r, ias_i,
                                    ial_r, ial_i)
        br_c, bi_c = _diag_tile_mul(br_c, bi_c, tsl_r, tsl_i, tas_r, tas_i,
                                    tal_r, tal_i)
        fir_ref[:] = cm.store_as(fr_c, fir_ref.dtype)
        fii_ref[:] = cm.store_as(fi_c, fii_ref.dtype)
        bnr_ref[:] = cm.store_as(br_c, bnr_ref.dtype)
        bni_ref[:] = cm.store_as(bi_c, bni_ref.dtype)


@functools.partial(jax.jit, static_argnames=("g0_first", "a_blk",
                                             "dot_mode", "bwd_dot_mode",
                                             "gram_dot_mode",
                                             "diag_first_fwd",
                                             "diag_q", "interpret"))
def block_backward_dual(fr, fi, br, bi,
                        e0inv_r, e0inv_i, e0_r, e0_i,
                        e1inv_r, e1inv_i, e1_r, e1_i,
                        *, g0_first: bool = True, a_blk: int = 8,
                        dot_mode: str = "f32", bwd_dot_mode: str = None,
                        gram_dot_mode: str = None,
                        diag_inv_tables=None,
                        diag_tables=None, diag_first_fwd: bool = True,
                        diag_q: bool = False,
                        interpret: bool = False):
    """One-pass adjoint step for a PAIR of blocks on the lane (E0) and
    sublane (E1) groups — the backward mirror of dual_group_apply_planes.

    Tape order matters for the pair grams: with ``g0_first`` (lane block
    applied first in the forward), the sublane block is rolled back first
    and its T0 sees the lane block still applied, exactly as two sequential
    single-group kernels would. Returns
    ``(f_r, f_i, b_r, b_i, T0_lane_r, T0_lane_i, T0_sub_r, T0_sub_i)``.
    """
    assert fr.ndim == 3 and fr.shape[1:] == (128, 128)
    A = fr.shape[0]
    if A % a_blk:
        a_blk = 1
    # a_blk sweep on v5e (tools/dual_ablk_sweep.py, A=8192 slice, r5):
    # 2: 22.64 ms, 4: 21.74, 8: 21.49, 16: 21.46 — default 8 takes the
    # ~1% over 4; the kernel's remaining 14%-of-roofline gap is the
    # per-a-slice 128^3 sublane dot pipeline, not grid overhead.
    if diag_tables is not None and a_blk % 8 and a_blk != A:
        # Mosaic: the (a_blk, 128) table blocks need a sublane dim divisible
        # by 8 (or the whole array)
        a_blk = 8 if A % 8 == 0 else A
    l_inv = e0inv_r.T, (e0inv_r + e0inv_i).T, (e0inv_i - e0inv_r).T
    l_e = e0_r, e0_r + e0_i, e0_i - e0_r
    s_inv = e1inv_r, e1inv_r + e1inv_i, e1inv_i - e1inv_r
    s_e = e1_r.T, (e1_r + e1_i).T, (e1_i - e1_r).T
    bs = cm.blk3
    es = cm.fixed2
    has_diag = diag_tables is not None
    kern = functools.partial(_kernel_dual, a_blk, g0_first, dot_mode,
                             bwd_dot_mode or dot_mode,
                             gram_dot_mode or bwd_dot_mode or dot_mode,
                             has_diag, diag_first_fwd, diag_q and has_diag)
    A_ = fr.shape[0]
    fbig = jax.ShapeDtypeStruct(fr.shape, fr.dtype)
    bbig = jax.ShapeDtypeStruct(br.shape, br.dtype)
    small = jax.ShapeDtypeStruct((128, 128), F32)
    big_spec = pl.BlockSpec((a_blk, 128, 128), bs, memory_space=pltpu.VMEM)
    sm_spec = pl.BlockSpec((128, 128), es, memory_space=pltpu.VMEM)
    tab_a = pl.BlockSpec((a_blk, 128), cm.blk2, memory_space=pltpu.VMEM)
    in_specs = [big_spec] * 4 + [sm_spec] * 12
    args = (fr, fi, br, bi) + tuple(l_inv) + tuple(l_e) + tuple(s_inv) + tuple(s_e)
    out_shape = (fbig, fbig, bbig, bbig, small, small, small, small)
    out_specs = (big_spec,) * 4 + (sm_spec,) * 4
    if has_diag:
        # inverse then forward tables: (tsl_r/i fixed; tas/tal r/i per-block)
        for tabs in (diag_inv_tables, diag_tables):
            in_specs += [sm_spec, sm_spec, tab_a, tab_a, tab_a, tab_a]
            args += tuple(tabs)
        if diag_q:
            a_sh = jax.ShapeDtypeStruct((A_, 128), F32)
            out_shape += (small, small, a_sh, a_sh, a_sh, a_sh)
            out_specs += (sm_spec, sm_spec, tab_a, tab_a, tab_a, tab_a)
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(A // a_blk,),
        in_specs=in_specs,
        out_specs=out_specs,
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def _top_combine(er_ref, ei_ref, vr, vi, *, transpose=False):
    """Complex scalar combinations over the tiny top axis: per output slice
    ``a``, ``y[a] = sum_b Et[a,b] v[b]`` (or Et^T with ``transpose``) as
    exact-f32 VPU mult-adds on the per-slice slabs (no MXU)."""
    x_top = len(vr)
    yr, yi = [], []
    for a in range(x_top):
        ar = ai = None
        for b in range(x_top):
            er = er_ref[b, a] if transpose else er_ref[a, b]
            ei = ei_ref[b, a] if transpose else ei_ref[a, b]
            pr = er * vr[b] - ei * vi[b]
            pi = er * vi[b] + ei * vr[b]
            ar = pr if ar is None else ar + pr
            ai = pi if ai is None else ai + pi
        yr.append(ar)
        yi.append(ai)
    return yr, yi


def _kernel_mtop_fact(x_top, x_low, n_chunks, dot_mode, bwd_dot_mode,
                      gram_dot_mode,
                      top_vpu,
                      fr_ref, fi_ref, br_ref, bi_ref,
                      li1, li2, li3, lt1, lt2, lt3,
                      etir_ref, etii_ref, etr_ref, eti_ref,
                      fir_ref, fii_ref, bnr_ref, bni_ref,
                      ttr_ref, tti_ref, tlr_ref, tli_ref):
    """Kronecker-factorized one-pass adjoint on the merged (top, low) axis.

    The merged operator is ``Et (x) El`` (hpair items are always built this
    way, plane_scan._backward_hpair), so instead of three (Xt*Xl)-wide
    contractions producing the full merged pair-gram T0m, the kernel runs
    ~3 Xl-wide contractions per element plus VPU top-factor combinations and
    emits the two RESTRICTIONS the gradient extraction actually consumes:

      T0_top[x,y] = sum_{c,d} bwd[(x d),c] * fwdA[(y d),c]
                    with fwdA = (Eti (x) I) fwd_out = (I (x) El) fwd_in
      T0_low[x,y] = sum_{c,e} bwd[(e x),c] * fwdB[(e y),c]
                    with fwdB = (I (x) Eli) fwd_out = (Et (x) I) fwd_in

    (the exact identities plane_scan._backward_hpair previously applied to
    T0m host-side). MXU MACs per element drop from 3*(Xt*Xl) to ~3*Xl+O(Xt)
    — ~Xt x less; at 30q (Xt=4, Xl=128) the merged backward was the
    slowest kernel of the flagship step (BENCHMARKS.md m_blk sweep)."""
    dot = make_dot(dot_mode)
    bdot = make_dot(bwd_dot_mode)
    gdot = make_dot(gram_dot_mode)
    m_blk = fr_ref.shape[2]
    mc = m_blk // n_chunks
    tt_r = jnp.zeros(ttr_ref.shape, F32)
    tt_i = jnp.zeros(tti_ref.shape, F32)
    tl_r = jnp.zeros(tlr_ref.shape, F32)
    tl_i = jnp.zeros(tli_ref.shape, F32)

    for c in range(n_chunks):
        sl = slice(c * mc, (c + 1) * mc)
        K = mc * 128
        f3r = cm.f32_of(fr_ref[0, :, sl, :]).reshape(x_top, x_low, K)
        f3i = cm.f32_of(fi_ref[0, :, sl, :]).reshape(x_top, x_low, K)
        b3r = cm.f32_of(br_ref[0, :, sl, :]).reshape(x_top, x_low, K)
        b3i = cm.f32_of(bi_ref[0, :, sl, :]).reshape(x_top, x_low, K)
        fr_l = [f3r[a] for a in range(x_top)]
        fi_l = [f3i[a] for a in range(x_top)]
        br_l = [b3r[a] for a in range(x_top)]
        bi_l = [b3i[a] for a in range(x_top)]

        # fwdA = (Eti (x) I) fwd_out — VPU top combos on the raw planes
        fAr, fAi = _top_combine(etir_ref, etii_ref, fr_l, fi_l)
        if top_vpu:
            # T0_top via VPU elementwise Karatsuba + full reductions: an
            # (Xt, N)@(N, Xt) MXU gram computes an Xt x Xt output tile with
            # 4/16384 of the systolic array doing useful work — at Xt=2 the
            # three such dots cost as much as a full 128-wide contraction
            # (the round-4 "fact loses at Xt=2" measurement). Xt^2 x 3
            # mul-reduce sweeps over the VMEM-resident slabs instead.
            ii = jax.lax.broadcasted_iota(jnp.int32, tt_r.shape, 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, tt_r.shape, 1)
            for x in range(x_top):
                sbx = br_l[x] + bi_l[x]
                for y in range(x_top):
                    p1 = jnp.sum(br_l[x] * fAr[y])
                    p2 = jnp.sum(bi_l[x] * fAi[y])
                    p3 = jnp.sum(sbx * (fAr[y] + fAi[y]))
                    # bool -> f32 cast, NOT where(c, 1.0, 0.0): two weak
                    # python-float branches resolve to f64 under x64 and a
                    # 64-bit tile in a Mosaic kernel SIGABRTs the axon AOT
                    # compiler's layout assignment (layout.h:205 bitwidth
                    # CHECK — the round-5 on-hardware test failure)
                    m = ((ii == x) & (jj == y)).astype(F32)
                    tt_r += (p1 - p2) * m
                    tt_i += (p3 - p1 - p2) * m
        else:
            # T0_top: (Xt, Xl*K) gram of bwd against fwdA (Karatsuba)
            b2r = b3r.reshape(x_top, x_low * K)
            b2i = b3i.reshape(x_top, x_low * K)
            a2r = jnp.stack(fAr).reshape(x_top, x_low * K)
            a2i = jnp.stack(fAi).reshape(x_top, x_low * K)
            p1 = gdot(b2r, a2r.T)
            p2 = gdot(b2i, a2i.T)
            p3 = gdot(b2r + b2i, (a2r + a2i).T)
            tt_r += p1 - p2
            tt_i += p3 - p1 - p2

        # fwdB = (I (x) Eli) fwd_out — per-slice Xl-wide Karatsuba matmuls
        fBr, fBi = [], []
        for a in range(x_top):
            t1 = dot(li1[:], fr_l[a] + fi_l[a])
            t2 = dot(li2[:], fi_l[a])
            t3 = dot(li3[:], fr_l[a])
            fBr.append(t1 - t2)
            fBi.append(t1 + t3)
            # T0_low partial: per-slice (Xl, K) gram of bwd against fwdB
            q1 = gdot(br_l[a], fBr[a].T)
            q2 = gdot(bi_l[a], fBi[a].T)
            q3 = gdot(br_l[a] + bi_l[a], (fBr[a] + fBi[a]).T)
            tl_r += q1 - q2
            tl_i += q3 - q1 - q2

        # fwd_in = (Eti (x) I) fwdB — VPU top combos complete the uncompute
        fnr, fni = _top_combine(etir_ref, etii_ref, fBr, fBi)
        ch3 = (x_top * x_low, mc, 128)
        fir_ref[0, :, sl, :] = cm.store_as(jnp.stack(fnr).reshape(ch3), fir_ref.dtype)
        fii_ref[0, :, sl, :] = cm.store_as(jnp.stack(fni).reshape(ch3), fii_ref.dtype)

        # transport: bwd_out = (Et^T (x) El^T) bwd
        blr, bli = [], []
        for a in range(x_top):
            sb = br_l[a] + bi_l[a]
            v1 = bdot(lt1[:], sb)
            v2 = bdot(lt2[:], bi_l[a])
            v3 = bdot(lt3[:], br_l[a])
            blr.append(v1 - v2)
            bli.append(v1 + v3)
        bor, boi = _top_combine(etr_ref, eti_ref, blr, bli, transpose=True)
        bnr_ref[0, :, sl, :] = cm.store_as(jnp.stack(bor).reshape(ch3), bnr_ref.dtype)
        bni_ref[0, :, sl, :] = cm.store_as(jnp.stack(boi).reshape(ch3), bni_ref.dtype)

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        ttr_ref[:] = jnp.zeros_like(ttr_ref)
        tti_ref[:] = jnp.zeros_like(tti_ref)
        tlr_ref[:] = jnp.zeros_like(tlr_ref)
        tli_ref[:] = jnp.zeros_like(tli_ref)

    ttr_ref[:] += tt_r
    tti_ref[:] += tt_i
    tlr_ref[:] += tl_r
    tli_ref[:] += tl_i


@functools.partial(jax.jit, static_argnames=("x_top", "m_blk", "dot_mode",
                                             "bwd_dot_mode", "gram_dot_mode",
                                             "top_vpu", "interpret"))
def block_backward_merged_fact(fr, fi, br, bi, elinv_r, elinv_i, el_r, el_i,
                               etinv_r, etinv_i, et_r, et_i, *, x_top: int,
                               m_blk: int = None, dot_mode: str = "f32",
                               bwd_dot_mode: str = None,
                               gram_dot_mode: str = None,
                               top_vpu: bool = None,
                               interpret: bool = False):
    """One-pass adjoint on the merged (top, low) view ``(A1, Xt*Xl, M, 128)``
    for a Kronecker-factorized operator ``Et (x) El`` (see
    ``_kernel_mtop_fact``). Returns ``(f_in planes, bwd_out planes,
    T0_top_r, T0_top_i, T0_low_r, T0_low_i)`` — the per-factor pair-gram
    restrictions, NOT the (Xt*Xl)^2 merged gram."""
    assert fr.ndim == 4 and fr.shape[-1] == 128
    A1, XX, M, _ = fr.shape
    Xl = el_r.shape[0]
    assert XX == x_top * Xl, (XX, x_top, Xl)
    if m_blk is None:
        m_blk = 16 if (XX >= 512 and M % 16 == 0) else 8
    if (jnp.dtype(fr.dtype).itemsize == 2
            or jnp.dtype(br.dtype).itemsize == 2):
        m_blk = max(m_blk, 16)
    if M % m_blk:
        m_blk = M
    slab = XX * m_blk * 128 * 4
    n_chunks = 1
    while (slab // n_chunks > 1024 * 1024 and n_chunks < m_blk
           and m_blk % (n_chunks * 2) == 0):
        n_chunks *= 2
    io_bytes = sum(2 * XX * m_blk * 128 * jnp.dtype(d).itemsize
                   for d in (fr.dtype, fr.dtype, br.dtype, br.dtype))
    # +8 MiB headroom: the stack model under-counted the measured scoped
    # demand by ~1.1 MiB at XX=512/m_blk=16 (82.07M vs an 81M limit -> OOM)
    est = (2 * io_bytes + 16 * (slab // n_chunks) + 16 * Xl * Xl * 4
           + 8 * 1024 * 1024)
    if "bf16x3" in (dot_mode, bwd_dot_mode, gram_dot_mode):
        # hi/lo bf16 operand splits add slab-scale intermediates Mosaic
        # cannot always fold into the f32 stack slots: measured scoped
        # demand 106.7e6 at XX=512/m_blk=16 all-f32 planes vs 85e6
        # estimated (the f32/f32 variant compiled at the same shape)
        est += 8 * slab
    if top_vpu is None:
        # measured on v5e at the M=2^12 slice (BENCHMARKS.md round 5):
        # VPU T0_top wins 2.5x at Xt=2 (12.7 vs 32.0 ms) and 1.31x at Xt=4
        # (37.5 vs 49.2) — the production widths (merged_top_tiny caps
        # Xt < 8). Xt=8 compiles in neither variant (VMEM).
        top_vpu = x_top <= 4
    if top_vpu:
        # the VPU pair-gram's elementwise products keep a few extra
        # chunk-slab temporaries live (measured scoped demand 101.5M at
        # XX=512/m_blk=16 vs the 89M MXU-gram estimate)
        est += x_top * (slab // n_chunks) * 4
    vmem_limit = min(110 * 1024 * 1024, max(64 * 1024 * 1024, est))
    li = elinv_r, elinv_r + elinv_i, elinv_i - elinv_r
    lt = el_r.T, (el_r + el_i).T, (el_i - el_r).T
    kern = functools.partial(_kernel_mtop_fact, x_top, Xl, n_chunks,
                             dot_mode, bwd_dot_mode or dot_mode,
                             gram_dot_mode or bwd_dot_mode or dot_mode,
                             top_vpu)
    fbig = jax.ShapeDtypeStruct(fr.shape, fr.dtype)
    bbig = jax.ShapeDtypeStruct(br.shape, br.dtype)
    t_top = jax.ShapeDtypeStruct((x_top, x_top), F32)
    t_low = jax.ShapeDtypeStruct((Xl, Xl), F32)
    blk = (1, XX, m_blk, 128)
    big = pl.BlockSpec(blk, cm.blk4, memory_space=pltpu.VMEM)
    lsp = pl.BlockSpec((Xl, Xl), cm.fixed2, memory_space=pltpu.VMEM)
    # explicit shape + x64-proof index map (a bare memory_space-only spec
    # auto-generates python-int-zero index maps -> i64 under x64, which
    # Mosaic fails to legalize)
    ssp = pl.BlockSpec((x_top, x_top), cm.fixed2, memory_space=pltpu.SMEM)
    tts = pl.BlockSpec((x_top, x_top), cm.fixed2, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=(fbig, fbig, bbig, bbig, t_top, t_top, t_low, t_low),
        grid=(A1, M // m_blk),
        in_specs=[big] * 4 + [lsp] * 6 + [ssp] * 4,
        out_specs=(big, big, big, big, tts, tts, lsp, lsp),
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=int(vmem_limit),
        ),
        interpret=interpret,
    )(fr, fi, br, bi, *li, *lt, etinv_r, etinv_i, et_r, et_i)
    return out


def _kernel_high(x_dim, n_chunks, k_sub, dot_mode, bwd_dot_mode,
                 gram_dot_mode,
                 has_diag, diag_first_fwd, diag_q,
                 fr_ref, fi_ref, br_ref, bi_ref,
                 inv1, inv2, inv3, e1, e2, e3, *rest):
    if has_diag:
        (isl_r, isl_i, ias_r, ias_i, ial_r, ial_i,
         tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i), rest = rest[:12], rest[12:]
    if diag_q:
        (fir_ref, fii_ref, bnr_ref, bni_ref, t0r_ref, t0i_ref,
         qsl_r_ref, qsl_i_ref, qas_r_ref, qas_i_ref,
         qal_r_ref, qal_i_ref) = rest
    else:
        fir_ref, fii_ref, bnr_ref, bni_ref, t0r_ref, t0i_ref = rest
    dot = make_dot(dot_mode)
    bdot = make_dot(bwd_dot_mode)
    gdot = make_dot(gram_dot_mode)

    # block shape: (1, X, m_blk, 128) — axis 1 is the full contracted group;
    # reduced-storage refs upcast on load, downcast on store. For large X
    # (the merged-top view reaches X=512 at 30q) the m axis is processed in
    # ``n_chunks`` column chunks so the f32 temporaries stay inside the
    # scoped-VMEM budget (one un-chunked 30q slab demands 116 MB > the
    # 128 MB v5e VMEM); T0 accumulates across chunks exactly.
    m_blk = fr_ref.shape[2]
    mc = m_blk // n_chunks
    t0r_acc = jnp.zeros(t0r_ref.shape, F32)
    t0i_acc = jnp.zeros(t0i_ref.shape, F32)
    if has_diag:
        dinv_r, dinv_i = cm.dh_tile(isl_r, isl_i, ias_r, ias_i, ial_r, ial_i)
        dfw_r, dfw_i = cm.dh_tile(tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i)
    if diag_q:
        qal_acc_r = jnp.zeros((x_dim, 128), F32)
        qal_acc_i = jnp.zeros((x_dim, 128), F32)
        qas_parts_r, qas_parts_i = [], []

        @pl.when(jnp.logical_and(pl.program_id(0) == 0,
                                 pl.program_id(1) == 0))
        def _():
            qsl_r_ref[:] = jnp.zeros_like(qsl_r_ref)
            qsl_i_ref[:] = jnp.zeros_like(qsl_i_ref)

    for c in range(n_chunks):
        sl = slice(c * mc, (c + 1) * mc)
        fr = cm.f32_of(fr_ref[0, :, sl, :].reshape(x_dim, -1))
        fi = cm.f32_of(fi_ref[0, :, sl, :].reshape(x_dim, -1))
        br = cm.f32_of(br_ref[0, :, sl, :].reshape(x_dim, -1))
        bi = cm.f32_of(bi_ref[0, :, sl, :].reshape(x_dim, -1))
        ch3 = (x_dim, mc, 128)

        if has_diag and not diag_first_fwd:
            # forward was [dense, run]: roll (fwd, bwd) through the run
            # FIRST — Q pair product before the updates (diag.py semantics)
            if diag_q:
                qr, qi = _cmul(br.reshape(ch3), bi.reshape(ch3),
                               fr.reshape(ch3), fi.reshape(ch3))
            fr, fi = _cmul(fr.reshape(ch3), fi.reshape(ch3),
                           dinv_r[:, sl, :], dinv_i[:, sl, :])
            br, bi = _cmul(br.reshape(ch3), bi.reshape(ch3),
                           dfw_r[:, sl, :], dfw_i[:, sl, :])
            fr, fi = fr.reshape(x_dim, -1), fi.reshape(x_dim, -1)
            br, bi = br.reshape(x_dim, -1), bi.reshape(x_dim, -1)

        u1 = dot(inv1[:], fr + fi)
        u2 = dot(inv2[:], fi)
        u3 = dot(inv3[:], fr)
        fir = u1 - u2
        fii = u1 + u3

        sb = br + bi
        v1 = bdot(e1[:], sb)
        v2 = bdot(e2[:], bi)
        v3 = bdot(e3[:], br)
        bnr = v1 - v2
        bni = v1 + v3

        # T0 Karatsuba (3 dots), reusing the transport's (br+bi) operand
        p1 = gdot(br, fir.T)
        p2 = gdot(bi, fii.T)
        p3 = gdot(sb, (fir + fii).T)
        t0r_acc += p1 - p2
        t0i_acc += p3 - p1 - p2

        if has_diag and diag_first_fwd:
            # forward was [run, dense]: the dense stage is undone, now roll
            # through the run — Q from (transported bwd, fwd-in) pair
            if diag_q:
                qr, qi = _cmul(bnr.reshape(ch3), bni.reshape(ch3),
                               fir.reshape(ch3), fii.reshape(ch3))
            fir, fii = _cmul(fir.reshape(ch3), fii.reshape(ch3),
                             dinv_r[:, sl, :], dinv_i[:, sl, :])
            bnr, bni = _cmul(bnr.reshape(ch3), bni.reshape(ch3),
                             dfw_r[:, sl, :], dfw_i[:, sl, :])
            fir, fii = fir.reshape(x_dim, -1), fii.reshape(x_dim, -1)
            bnr, bni = bnr.reshape(x_dim, -1), bni.reshape(x_dim, -1)

        fir_ref[0, :, sl, :] = cm.store_as(fir.reshape(ch3), fir_ref.dtype)
        fii_ref[0, :, sl, :] = cm.store_as(fii.reshape(ch3), fii_ref.dtype)
        bnr_ref[0, :, sl, :] = cm.store_as(bnr.reshape(ch3), bnr_ref.dtype)
        bni_ref[0, :, sl, :] = cm.store_as(bni.reshape(ch3), bni_ref.dtype)

        if diag_q:
            # the run's order-invariant Q reductions on this chunk's tile
            # (qsl: fixed accumulator window, rows by dynamic slice; qas:
            # chunk sums concatenated, each cell's (X, m_blk) tile written
            # exactly once after the loop; qal: accumulated across the
            # cell's chunks then once per consecutive p-window visit)
            # lax.rem on an np.int32 keeps the index math pure-i32: a
            # python-int `%` embeds an i64 literal under jax_enable_x64
            # whose i64->i32 convert recurses forever in Mosaic lowering
            row0 = (jax.lax.rem(pl.program_id(1), np.int32(k_sub)) * m_blk
                    + c * mc)
            cur_r = qsl_r_ref[pl.dslice(row0, mc), :]
            cur_i = qsl_i_ref[pl.dslice(row0, mc), :]
            qsl_r_ref[pl.dslice(row0, mc), :] = cur_r + jnp.sum(qr, axis=0)
            qsl_i_ref[pl.dslice(row0, mc), :] = cur_i + jnp.sum(qi, axis=0)
            qas_parts_r.append(jnp.sum(qr, axis=2))
            qas_parts_i.append(jnp.sum(qi, axis=2))
            qal_acc_r += jnp.sum(qr, axis=1)
            qal_acc_i += jnp.sum(qi, axis=1)

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        t0r_ref[:] = jnp.zeros_like(t0r_ref)
        t0i_ref[:] = jnp.zeros_like(t0i_ref)

    t0r_ref[:] += t0r_acc
    t0i_ref[:] += t0i_acc

    if diag_q:
        qas_r_ref[0, 0, 0] = (qas_parts_r[0] if len(qas_parts_r) == 1
                              else jnp.concatenate(qas_parts_r, axis=1))
        qas_i_ref[0, 0, 0] = (qas_parts_i[0] if len(qas_parts_i) == 1
                              else jnp.concatenate(qas_parts_i, axis=1))

        @pl.when(jax.lax.rem(pl.program_id(1), np.int32(k_sub)) == 0)
        def _():
            qal_r_ref[:] = jnp.zeros_like(qal_r_ref)
            qal_i_ref[:] = jnp.zeros_like(qal_i_ref)

        qal_r_ref[0, 0] += qal_acc_r
        qal_i_ref[0, 0] += qal_acc_i


@functools.partial(jax.jit, static_argnames=("m_blk", "dot_mode",
                                             "bwd_dot_mode", "gram_dot_mode",
                                             "diag_first_fwd",
                                             "diag_q", "interpret"))
def block_backward_high(fr, fi, br, bi, einv_r, einv_i, e_r, e_i,
                        *, m_blk: int = None, dot_mode: str = "f32",
                        bwd_dot_mode: str = None,
                        gram_dot_mode: str = None,
                        diag_inv_tables=None, diag_tables=None,
                        diag_first_fwd: bool = True, diag_q: bool = False,
                        interpret: bool = False):
    """One-pass adjoint step for a high-group block.

    The state planes must be shaped ``(A1, X, M, 128)`` with ``X`` the
    contracted group axis (its operator is ``X x X``, ``X <= 128``). Blocks
    read the full ``X`` column per (a1, m-tile) grid cell.

    ``diag_inv_tables`` / ``diag_tables``: 6 f32 view-tables each (see
    planes.dhigh_view_tables) of a diagonal run fused with the dense sweep
    in the forward — ``diag_first_fwd`` says the run preceded the dense
    ([run, dense], the rolled-back order is dense-then-run) or followed it.
    With ``diag_q`` the kernel also emits the run's order-invariant Q pair
    reductions (diag.py semantics): qsl (128, 128) plus qas/qal on the
    (A1, X, post, 128) a-table view.
    """
    assert fr.ndim == 4 and fr.shape[-1] == 128
    A1, X, M, _ = fr.shape
    if m_blk is None:
        # measured (tools/mtop_sweep.py, X=512 slice): m_blk=16 beats 8 by
        # ~5% f32 / ~6% bf16x3 on the merged-top shapes; >=32 is rejected
        # by the compiler (VMEM). Smaller X keeps the original 8 (untuned).
        m_blk = 16 if (X >= 512 and M % 16 == 0) else 8
    if (jnp.dtype(fr.dtype).itemsize == 2
            or jnp.dtype(br.dtype).itemsize == 2):
        m_blk = max(m_blk, 16)  # bf16 tiling: (16, 128) sublane x lane
    if M % m_blk:
        m_blk = M  # irregular M: whole axis per cell (tile-legal)
    has_diag = diag_inv_tables is not None
    if has_diag:
        assert M % 128 == 0 and m_blk <= 128 and 128 % m_blk == 0, (M, m_blk)
    # chunk the in-kernel f32 slab to ~1 MB per temporary (~12 temporaries;
    # see _kernel_high). The dominant VMEM term at large X is the
    # double-buffered IO blocks themselves, which cannot shrink below the
    # full X column x 16-sublane bf16 tile — so the scoped-vmem budget is
    # sized to the actual demand (the 64 MB default rejects the 30q merged
    # view, X=512; v5e has 128 MB physical VMEM).
    slab = X * m_blk * 128 * 4
    n_chunks = 1
    while (slab // n_chunks > 1024 * 1024 and n_chunks < m_blk
           and m_blk % (n_chunks * 2) == 0):
        n_chunks *= 2
    io_bytes = sum(2 * X * m_blk * 128 * jnp.dtype(d).itemsize
                   for d in (fr.dtype, fr.dtype, br.dtype, br.dtype))
    est = 2 * io_bytes + 14 * (slab // n_chunks) + 16 * X * X * 4
    if has_diag:
        # diag tiles (2x2 f32 (X, m_blk, 128)) + table blocks + Q windows
        est += 4 * X * m_blk * 128 * 4 + 8 * (X + m_blk) * 128 * 4
    vmem_limit = min(110 * 1024 * 1024, max(64 * 1024 * 1024, est))
    inv = einv_r, einv_r + einv_i, einv_i - einv_r
    et = e_r.T, (e_r + e_i).T, (e_i - e_r).T
    bs = cm.blk4
    es = cm.fixed2
    k_sub = (128 // m_blk) if has_diag else 1
    kern = functools.partial(_kernel_high, X, n_chunks, k_sub, dot_mode,
                             bwd_dot_mode or dot_mode,
                             gram_dot_mode or bwd_dot_mode or dot_mode,
                             has_diag, diag_first_fwd, diag_q)
    fbig = jax.ShapeDtypeStruct(fr.shape, fr.dtype)
    bbig = jax.ShapeDtypeStruct(br.shape, br.dtype)
    small = jax.ShapeDtypeStruct((X, X), F32)
    blk = (1, X, m_blk, 128)
    in_specs = ([pl.BlockSpec(blk, bs, memory_space=pltpu.VMEM)] * 4
                + [pl.BlockSpec((X, X), es, memory_space=pltpu.VMEM)] * 6)
    args = (fr, fi, br, bi) + tuple(inv) + tuple(et)
    out_shape = [fbig, fbig, bbig, bbig, small, small]
    out_specs = ([pl.BlockSpec(blk, bs, memory_space=pltpu.VMEM)] * 4
                 + [pl.BlockSpec((X, X), es, memory_space=pltpu.VMEM)] * 2)
    if has_diag:
        dh = cm.dh_table_specs(X, M, m_blk)
        in_specs += list(dh) + list(dh)
        args = (args + cm.dh_table_views(diag_inv_tables, m_blk)
                + cm.dh_table_views(diag_tables, m_blk))
    if diag_q:
        post = M // 128
        k = 128 // m_blk
        qa_s = jax.ShapeDtypeStruct((A1, post, k, X, m_blk), F32)
        qa_l = jax.ShapeDtypeStruct((A1, post, X, 128), F32)
        qsl_spec = pl.BlockSpec((128, 128), es, memory_space=pltpu.VMEM)
        _, _, tas_spec, _, tal_spec, _ = cm.dh_table_specs(X, M, m_blk)
        out_shape += [jax.ShapeDtypeStruct((128, 128), F32)] * 2 \
                     + [qa_s, qa_s, qa_l, qa_l]
        out_specs += [qsl_spec, qsl_spec, tas_spec, tas_spec,
                      tal_spec, tal_spec]
    return pl.pallas_call(
        kern,
        out_shape=tuple(out_shape),
        grid=(A1, M // m_blk),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # sized to demand (IO double-buffers + chunked temporaries);
            # the 64M floor covers the X=128 default, larger X raises it
            vmem_limit_bytes=int(vmem_limit),
        ),
        interpret=interpret,
    )(*args)
