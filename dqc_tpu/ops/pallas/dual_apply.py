"""Pallas TPU kernel: dual-group fused gate apply on real/imag planes.

One HBM pass applies full-group operators to BOTH minor qubit groups
(lane group = qubits 0..6, sublane group = 7..13): the block is read into
VMEM once, hit with ``Em @ X @ El^T`` complex matmuls (Karatsuba, 3 real
dots per complex product, combination operands precomputed host-side), and
written once — up to 14 qubits' worth of fused gates per sweep.

This is the PRODUCTION hot path of the plane-layout engine
(circuit/plane_scan.py): the state lives as real/imag planes across the
whole layer scan (ops/planes.py), so every eligible dense sweep lands here.
Measured on TPU v5e at 26 qubits (round-3 kernel-bandwidth tables in
BENCHMARKS.md): 4.6-6.0 ms per dual sweep at full-f32 precision with
``a_blk=16`` — latency-bound on the 16-slice sublane small-dot loop, not
MXU-pass-bound (bf16x3 and a_blk/semantics sweeps are flat; ~230 GB/s is
this kernel's structural floor on v5e). Mosaic rejects ``Precision.HIGH``
as a flag; ``dot_mode='bf16x3'`` is the manual opt-in 3-pass split
(ops/pallas/dots.py).

``diag_tables`` folds a whole adjacent diagonal run into this sweep — in
EITHER tape order: before the dual gates (``diag_first=True``) or after
them (the ddual item, see plane_scan._pair_diag_into_dual). Plane refs may
be stored in a reduced dtype (config.set_state_storage): compute is always
f32 in VMEM, loads/stores convert at the ref boundary.

Works under ``interpret=True`` on CPU for testing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dqc_tpu.ops.pallas import common as cm
from dqc_tpu.ops.pallas.dots import make_dot

F32 = jnp.float32
HI = jax.lax.Precision.HIGHEST


def _cmul(xr, xi, yr, yi):
    return xr * yr - xi * yi, xr * yi + xi * yr


def _diag_mul(xr, xi, tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i):
    """x *= Tas[a,s]*Tal[a,l]*Tsl[s,l] on an (a_blk, 128, 128) tile (the
    fused diag-run multiplier, ops/pallas/diag.py layout)."""
    mr, mi = _cmul(
        tas_r[:][:, :, None], tas_i[:][:, :, None],
        tal_r[:][:, None, :], tal_i[:][:, None, :],
    )
    mr, mi = _cmul(mr, mi, tsl_r[:][None, :, :], tsl_i[:][None, :, :])
    return _cmul(xr, xi, mr, mi)


def _kernel(a_blk, dot_mode, conj, has_acc, has_diag, diag_first,
            xr_ref, xi_ref, k1, k2, k3, m1, m2, m3, *rest):
    if has_diag:
        (tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i), rest = rest[:6], rest[6:]
    if has_acc:
        accr_ref, acci_ref, yr_ref, yi_ref = rest
    else:
        yr_ref, yi_ref = rest
    dot = make_dot(dot_mode)

    # plane refs may be stored in a reduced dtype (config.set_state_storage):
    # loads upcast to f32, all VMEM compute is f32, stores downcast
    xr = cm.f32_of(xr_ref[:])
    xi = cm.f32_of(xi_ref[:])
    dr = di = None
    if has_diag and diag_first:
        # pre-multiply by the fused diagonal run (applied BEFORE the dual
        # gates in the forward program) — zero extra HBM passes
        xr, xi = _diag_mul(xr, xi, tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i)
    elif has_diag:
        # the run FOLLOWS the dual gates: multiply per a-slice post-dots
        mr, mi = _cmul(
            tas_r[:][:, :, None], tas_i[:][:, :, None],
            tal_r[:][:, None, :], tal_i[:][:, None, :],
        )
        dr, di = _cmul(mr, mi, tsl_r[:][None, :, :], tsl_i[:][None, :, :])

    # lane group: y = x @ El^T via Karatsuba (k1 = El^T, k2 = (El+iEl_i)^T
    # style combinations precomputed by the wrapper)
    x2r = xr.reshape(-1, 128)
    x2i = xi.reshape(-1, 128)
    t1 = dot(x2r + x2i, k1[:])
    t2 = dot(x2i, k2[:])
    t3 = dot(x2r, k3[:])
    yr = (t1 - t2).reshape(a_blk, 128, 128)
    yi = (t1 + t3).reshape(a_blk, 128, 128)

    # sublane group per a-slice: z = Em @ y
    for a in range(a_blk):
        ar, ai = yr[a], yi[a]
        v1 = dot(m1[:], ar + ai)
        v2 = dot(m2[:], ai)
        v3 = dot(m3[:], ar)
        vr = v1 - v2
        vi = v1 + v3
        if dr is not None:
            vr, vi = _cmul(vr, vi, dr[a], di[a])
        if conj:
            vi = -vi
        if has_acc:
            vr = cm.f32_of(accr_ref[a]) + vr
            vi = cm.f32_of(acci_ref[a]) + vi
        yr_ref[a, :, :] = cm.store_as(vr, yr_ref.dtype)
        yi_ref[a, :, :] = cm.store_as(vi, yi_ref.dtype)


def _kernel_multi(a_blk, n_terms, dot_mode, conj, has_acc, xr_ref, xi_ref,
                  k1, k2, k3, m1, m2, m3, *rest):
    """Sum-of-terms dual sweep: ``y = sum_t Em_t @ x @ El_t^T`` in ONE HBM
    pass — a whole dense cross-group gate's Schmidt decomposition
    (plane_scan._dense_cross_expanded_terms) instead of 2 passes per term.
    Stacked operand refs are (T, 128, 128); modes as in ``_kernel``."""
    if has_acc:
        accr_ref, acci_ref, yr_ref, yi_ref = rest
    else:
        yr_ref, yi_ref = rest
    dot = make_dot(dot_mode)

    xr = cm.f32_of(xr_ref[:])
    xi = cm.f32_of(xi_ref[:])
    x2r = xr.reshape(-1, 128)
    x2i = xi.reshape(-1, 128)

    # lane stage per term (whole tile), results kept in VMEM registers
    lane = []
    for t in range(n_terms):
        t1 = dot(x2r + x2i, k1[t])
        t2 = dot(x2i, k2[t])
        t3 = dot(x2r, k3[t])
        lane.append(((t1 - t2).reshape(a_blk, 128, 128),
                     (t1 + t3).reshape(a_blk, 128, 128)))

    # sublane stage per a-slice, accumulating the term sum
    for a in range(a_blk):
        vr = vi = None
        for t in range(n_terms):
            ar, ai = lane[t][0][a], lane[t][1][a]
            v1 = dot(m1[t], ar + ai)
            v2 = dot(m2[t], ai)
            v3 = dot(m3[t], ar)
            wr, wi = v1 - v2, v1 + v3
            vr = wr if vr is None else vr + wr
            vi = wi if vi is None else vi + wi
        if conj:
            vi = -vi
        if has_acc:
            vr = cm.f32_of(accr_ref[a]) + vr
            vi = cm.f32_of(acci_ref[a]) + vi
        yr_ref[a, :, :] = cm.store_as(vr, yr_ref.dtype)
        yi_ref[a, :, :] = cm.store_as(vi, yi_ref.dtype)


@functools.partial(jax.jit, static_argnames=("a_blk", "dot_mode", "alias",
                                             "conj", "out_dtype",
                                             "interpret"))
def dual_multi_apply_planes(xr, xi, el_r, el_i, em_r, em_i, *,
                            a_blk: int = 16, dot_mode: str = "f32",
                            alias: bool = True, conj: bool = False,
                            acc=None, out_dtype=None,
                            interpret: bool = False):
    """Multi-term dual sweep: ``el_r/el_i/em_r/em_i`` are stacked
    ``(T, 128, 128)`` per-term lane/sublane factors; one HBM pass computes
    ``sum_t Em_t X El_t^T`` (with the same conj/acc/storage semantics as
    ``dual_group_apply_planes``). This is the one-pass execution of a dense
    cross-group gate between the two minor groups — the reference applies
    such gates amplitude-pair-wise in one sweep too (primitives.cu:104-160);
    the previous plane path needed 2 HBM passes per Schmidt term plus a
    fresh accumulator pair (the 3-plane-pair memory spike)."""
    assert xr.ndim == 3 and xr.shape[1:] == (128, 128)
    assert el_r.ndim == 3 and el_r.shape[1:] == (128, 128)
    T = el_r.shape[0]
    A = xr.shape[0]
    if A % a_blk:
        a_blk = 1 << (min(A, a_blk).bit_length() - 1)
        while A % a_blk:
            a_blk >>= 1
    # the kernel keeps ALL T lane-stage results live across the stage
    # boundary (T x 2 x (a_blk,128,128) f32); shrink the block so that
    # slab stays ~<=16 MB inside the 64 MB scoped-VMEM budget (a traced
    # k>=4 cross gate over two minor groups reaches T = 16 unpruned terms)
    while a_blk > 1 and T * 2 * a_blk * 128 * 128 * 4 > 16 * 1024 * 1024:
        a_blk >>= 1
        while A % a_blk:
            a_blk >>= 1
    k1 = jnp.swapaxes(el_r, 1, 2)
    k2 = jnp.swapaxes(el_r + el_i, 1, 2)
    k3 = jnp.swapaxes(el_i - el_r, 1, 2)
    m1, m2, m3 = em_r, em_r + em_i, em_i - em_r
    has_acc = acc is not None
    kern = functools.partial(_kernel_multi, a_blk, T, dot_mode, conj, has_acc)
    big = pl.BlockSpec((a_blk, 128, 128), cm.blk3, memory_space=pltpu.VMEM)
    tab = pl.BlockSpec((T, 128, 128), cm.fixed3, memory_space=pltpu.VMEM)
    in_specs = [big] * 2 + [tab] * 6
    args = (xr, xi, k1, k2, k3, m1, m2, m3)
    if has_acc:
        in_specs = in_specs + [big, big]
        args = args + (acc[0], acc[1])
        aliases = {8: 0, 9: 1}
        out_dt = acc[0].dtype
    else:
        out_dt = xr.dtype if out_dtype is None else jnp.dtype(out_dtype)
        same = jnp.dtype(out_dt) == jnp.dtype(xr.dtype)
        aliases = {0: 0, 1: 1} if (alias and same) else {}
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct(xr.shape, out_dt),
                   jax.ShapeDtypeStruct(xr.shape, out_dt)),
        grid=(A // a_blk,),
        in_specs=in_specs,
        out_specs=(big, big),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("a_blk", "dot_mode", "alias",
                                             "conj", "out_dtype",
                                             "diag_first", "interpret"))
def dual_group_apply_planes(xr, xi, el_r, el_i, em_r, em_i, *, a_blk: int = 16,
                            dot_mode: str = "f32", alias: bool = True,
                            conj: bool = False, acc=None, diag_tables=None,
                            diag_first: bool = True,
                            out_dtype=None, interpret: bool = False):
    """Apply lane-group operator ``el_r + i el_i`` and sublane-group operator
    ``em_r + i em_i`` to a plane-layout state ``(A, 128, 128) x 2`` in one
    HBM pass.

    ``alias=False`` keeps the input planes intact (fresh outputs): required
    when the same planes feed several consumers — an aliased call would
    force XLA to COPY the 2^n-sized input per extra consumer (the measured
    2 GB copy.* allocations in the 29q OOM profile, tools/mem29.py).

    ``conj=True`` emits ``conj(Em X El^T)``; ``acc=(ar, ai)`` adds the result
    into the accumulator planes IN PLACE (acc aliased, x read-only) — the
    density-seed pattern ``bwd += M conj(psi)`` in one pass per group with a
    single live accumulator (XLA keeps every non-aliased output of a seed
    fan-out live simultaneously: 5x4 GB in the 29q profile)."""
    assert xr.ndim == 3 and xr.shape[1:] == (128, 128)
    A = xr.shape[0]
    if A % a_blk:
        a_blk = 1 << (min(A, a_blk).bit_length() - 1)
        while A % a_blk:
            a_blk >>= 1
    # Karatsuba combination operands (tiny, host/trace-side)
    k1 = el_r.T
    k2 = (el_r + el_i).T
    k3 = (el_i - el_r).T
    m1, m2, m3 = em_r, em_r + em_i, em_i - em_r
    bs = cm.blk3
    es = cm.fixed2
    has_acc = acc is not None
    has_diag = diag_tables is not None
    kern = functools.partial(_kernel, a_blk, dot_mode, conj, has_acc,
                             has_diag, diag_first)
    big = pl.BlockSpec((a_blk, 128, 128), bs, memory_space=pltpu.VMEM)
    tab_sl = pl.BlockSpec((128, 128), es, memory_space=pltpu.VMEM)
    tab_a = pl.BlockSpec((a_blk, 128), cm.blk2, memory_space=pltpu.VMEM)
    in_specs = [big] * 2 + [tab_sl] * 6
    args = (xr, xi, k1, k2, k3, m1, m2, m3)
    acc_base = 8
    if has_diag:
        # (tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i)
        in_specs = in_specs + [tab_sl, tab_sl, tab_a, tab_a, tab_a, tab_a]
        args = args + tuple(diag_tables)
        acc_base += 6
    if has_acc:
        in_specs = in_specs + [big, big]
        args = args + (acc[0], acc[1])
        aliases = {acc_base: 0, acc_base + 1: 1}
    else:
        # output storage dtype follows the aliased buffer (acc in seed mode,
        # else the input planes); out_dtype overrides for no-acc outputs —
        # the seed-creation path where the accumulator's storage differs
        # from the input's (aliasing is dropped on a dtype mismatch)
        out_dt = xr.dtype if out_dtype is None else jnp.dtype(out_dtype)
        same = jnp.dtype(out_dt) == jnp.dtype(xr.dtype)
        # in-place update: the state planes are dead after the sweep
        # (SURVEY 7 step 4b - the reference mutates one buffer in place)
        aliases = {0: 0, 1: 1} if (alias and same) else {}
    if has_acc:
        out_dt = acc[0].dtype
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct(xr.shape, out_dt),
                   jax.ShapeDtypeStruct(xr.shape, out_dt)),
        grid=(A // a_blk,),
        in_specs=in_specs,
        out_specs=(big, big),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
