"""Pallas TPU kernel: full-group operator apply on a high group axis.

Companion to :mod:`dqc_tpu.ops.pallas.dual_apply` (which covers the lane and
sublane groups, qubits 0..13): for a group ``j >= 2`` the plane-layout state
``(A, 128, 128)`` is viewed as ``(A1, X, M, 128)`` with ``X = 2^g`` the
contracted group axis, and each grid cell reads a full ``X`` column into VMEM
and hits it with one complex (Karatsuba, 3 real dots) matmul ``y = E @ x``.

This is the forward half of ``block_backward_high``; same layout contract.
Replaces the reference's per-gate bit-strided sweep (reference
primitives.cu:513-620) for gates fused on high qubit groups.

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


_cmul = cm.cmul
_dh_tile = cm.dh_tile


def _kernel(x_dim, dot_mode, conj, has_acc, has_diag, diag_first,
            xr_ref, xi_ref, e1, e2, e3, *rest):
    if has_diag:
        (tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i), rest = rest[:6], rest[6:]
    if has_acc:
        accr_ref, acci_ref, yr_ref, yi_ref = rest
    else:
        yr_ref, yi_ref = rest
    dot = make_dot(dot_mode)

    # block shape: (1, X, m_blk, 128) — axis 1 is the full contracted group;
    # plane refs may be stored reduced (config.set_state_storage): loads
    # upcast to f32, stores downcast
    x3r = cm.f32_of(xr_ref[0])
    x3i = cm.f32_of(xi_ref[0])
    if has_diag and diag_first:
        dr, di = _dh_tile(tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i)
        x3r, x3i = _cmul(x3r, x3i, dr, di)
    xr = x3r.reshape(x_dim, -1)
    xi = x3i.reshape(x_dim, -1)
    t1 = dot(e1[:], xr + xi)
    t2 = dot(e2[:], xi)
    t3 = dot(e3[:], xr)
    vr = (t1 - t2).reshape(yr_ref.shape[1:])
    vi = (t1 + t3).reshape(yi_ref.shape[1:])
    if has_diag and not diag_first:
        dr, di = _dh_tile(tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i)
        vr, vi = _cmul(vr, vi, dr, di)
    if conj:
        vi = -vi
    if has_acc:
        vr = cm.f32_of(accr_ref[0]) + vr
        vi = cm.f32_of(acci_ref[0]) + vi
    yr_ref[0] = cm.store_as(vr, yr_ref.dtype)
    yi_ref[0] = cm.store_as(vi, yi_ref.dtype)


@functools.partial(jax.jit, static_argnames=("m_blk", "dot_mode", "alias",
                                             "conj", "out_dtype",
                                             "diag_first", "interpret"))
def high_group_apply_planes(xr, xi, e_r, e_i, *, m_blk: int = 8,
                            dot_mode: str = "f32", alias: bool = True,
                            conj: bool = False, acc=None, out_dtype=None,
                            diag=None, diag_first: bool = True,
                            interpret: bool = False):
    """Apply the complex operator ``e_r + i e_i`` (``X x X``) to the second
    axis of plane-layout state ``(A1, X, M, 128) x 2`` in one HBM pass.

    ``alias=False``: fresh outputs, inputs preserved; ``conj``/``acc``: emit
    ``acc + conj(E x)`` with the accumulator aliased in place (the density-
    seed pattern — see dual_group_apply_planes).

    ``diag``: 6 f32 view-tables of a fused diagonal run (see
    planes.dhigh_view_tables) multiplied in the same pass — BEFORE the
    contraction when ``diag_first`` (forward of a [run, dense] fold),
    AFTER it otherwise (forward of [dense, run], or uncompute of
    [run, dense] with inverse operands)."""
    assert xr.ndim == 4 and xr.shape[-1] == 128
    A1, X, M, _ = xr.shape
    out_dt = acc[0].dtype if acc is not None else xr.dtype
    if out_dtype is not None and acc is None:
        out_dt = jnp.dtype(out_dtype)
        if jnp.dtype(out_dt) != jnp.dtype(xr.dtype):
            alias = False  # dtype change: cannot alias the input planes
    if jnp.dtype(xr.dtype).itemsize == 2 or jnp.dtype(out_dt).itemsize == 2:
        # bf16 native tiling is (16, 128): the m-axis block (second-to-last
        # dim) must be a multiple of 16
        m_blk = max(m_blk, 16)
    if M % m_blk:
        m_blk = M  # irregular M: whole axis per cell (tile-legal)
    has_diag = diag is not None
    if has_diag:
        # the diag view-tables slice the sublane axis: the m block must sit
        # inside one sublane repetition (M = post * 128 by construction)
        assert M % 128 == 0 and m_blk <= 128 and 128 % m_blk == 0, (M, m_blk)
    # Karatsuba combination operands (tiny, host/trace-side)
    e1, e2, e3 = e_r, e_r + e_i, e_i - e_r
    bs = cm.blk4
    es = cm.fixed2
    has_acc = acc is not None
    kern = functools.partial(_kernel, X, dot_mode, conj, has_acc, has_diag,
                             diag_first)
    blk = (1, X, m_blk, 128)
    big = pl.BlockSpec(blk, bs, memory_space=pltpu.VMEM)
    in_specs = [big] * 2 + [pl.BlockSpec((X, X), es,
                                         memory_space=pltpu.VMEM)] * 3
    args = (xr, xi, e1, e2, e3)
    if has_diag:
        in_specs = in_specs + list(cm.dh_table_specs(X, M, m_blk))
        args = args + cm.dh_table_views(diag, m_blk)
    if has_acc:
        ai_base = len(args)
        in_specs = in_specs + [big, big]
        args = args + (acc[0].reshape(xr.shape), acc[1].reshape(xr.shape))
        aliases = {ai_base: 0, ai_base + 1: 1}
    else:
        aliases = {0: 0, 1: 1} if alias else {}
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct(xr.shape, out_dt),
                   jax.ShapeDtypeStruct(xr.shape, out_dt)),
        grid=(A1, M // m_blk),
        in_specs=in_specs,
        out_specs=(big, big),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)

def _kernel_fact(x_top, x_low, dot_mode, xr_ref, xi_ref,
                 l1, l2, l3, etr_ref, eti_ref, yr_ref, yi_ref):
    """Kronecker-factorized merged-top apply: ``y = (Et (x) El) x`` on the
    merged (top, low) axis WITHOUT expanding the (Xt*Xl)^2 operator — the
    low factor is Xt per-slice (Xl-wide) Karatsuba matmuls, the top factor
    is Xt^2 complex scalar combinations on the VPU (exact f32 mult-adds;
    f32-HIGHEST would emulate them with 6 bf16 MXU passes). MXU work per
    element drops from 3*(Xt*Xl) to ~3*Xl MACs — ~Xt x less (measured
    motivation: the 30q merged-top X=512 sweep is deeply MXU-bound,
    BENCHMARKS.md m_blk sweep)."""
    dot = make_dot(dot_mode)
    x3r = cm.f32_of(xr_ref[0])
    x3i = cm.f32_of(xi_ref[0])
    K = x3r.shape[1] * x3r.shape[2]
    xr = x3r.reshape(x_top, x_low, K)
    xi = x3i.reshape(x_top, x_low, K)
    vr, vi = [], []
    for a in range(x_top):
        t1 = dot(l1[:], xr[a] + xi[a])
        t2 = dot(l2[:], xi[a])
        t3 = dot(l3[:], xr[a])
        vr.append(t1 - t2)
        vi.append(t1 + t3)
    yr, yi = [], []
    for a in range(x_top):
        accr = acci = None
        for b in range(x_top):
            er = etr_ref[a, b]
            ei = eti_ref[a, b]
            pr = er * vr[b] - ei * vi[b]
            pi = er * vi[b] + ei * vr[b]
            accr = pr if accr is None else accr + pr
            acci = pi if acci is None else acci + pi
        yr.append(accr)
        yi.append(acci)
    sh = yr_ref.shape[1:]
    yr_ref[0] = cm.store_as(jnp.stack(yr).reshape(sh), yr_ref.dtype)
    yi_ref[0] = cm.store_as(jnp.stack(yi).reshape(sh), yi_ref.dtype)


@functools.partial(jax.jit, static_argnames=("x_top", "m_blk", "dot_mode",
                                             "alias", "interpret"))
def merged_fact_apply_planes(xr, xi, el_r, el_i, et_r, et_i, *, x_top: int,
                             m_blk: int = 8, dot_mode: str = "f32",
                             alias: bool = True, interpret: bool = False):
    """Apply ``Et (x) El`` to the merged axis of plane view
    ``(A1, Xt*Xl, M, 128) x 2`` in one HBM pass, Kronecker-factorized
    (see ``_kernel_fact``). ``el_*``: (Xl, Xl) f32 planes of the low
    factor; ``et_*``: (Xt, Xt) f32 planes of the top factor (SMEM
    scalars)."""
    assert xr.ndim == 4 and xr.shape[-1] == 128
    A1, XX, M, _ = xr.shape
    Xl = el_r.shape[0]
    assert XX == x_top * Xl, (XX, x_top, Xl)
    if jnp.dtype(xr.dtype).itemsize == 2:
        m_blk = max(m_blk, 16)
    if M % m_blk:
        m_blk = M
    l1, l2, l3 = el_r, el_r + el_i, el_i - el_r
    kern = functools.partial(_kernel_fact, x_top, Xl, dot_mode)
    blk = (1, XX, m_blk, 128)
    big = pl.BlockSpec(blk, cm.blk4, memory_space=pltpu.VMEM)
    lsp = pl.BlockSpec((Xl, Xl), cm.fixed2, memory_space=pltpu.VMEM)
    # explicit shape + x64-proof index map: a bare memory_space-only spec
    # auto-generates an index map returning python-int zeros, which trace
    # as i64 under jax_enable_x64 and Mosaic fails to legalize its return
    tsp = pl.BlockSpec((x_top, x_top), cm.fixed2, memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct(xr.shape, xr.dtype),
                   jax.ShapeDtypeStruct(xr.shape, xr.dtype)),
        grid=(A1, M // m_blk),
        in_specs=[big, big, lsp, lsp, lsp, tsp, tsp],
        out_specs=(big, big),
        input_output_aliases={0: 0, 1: 1} if alias else {},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xr, xi, l1, l2, l3, et_r, et_i)


def _kernel_multi(x_dim, n_terms, dot_mode, conj, has_acc, xr_ref, xi_ref,
                  e1, e2, e3, k1, k2, k3, *rest):
    """Sum-of-terms high+lane sweep: ``y = sum_t (E_t on the X axis) x
    (El_t^T on the lane axis)`` in ONE pass — a dense cross-group gate
    between a high group and the lane group executes its whole Schmidt
    decomposition per tile (e*: (T, X, X); k*: (T, 128, 128))."""
    if has_acc:
        accr_ref, acci_ref, yr_ref, yi_ref = rest
    else:
        yr_ref, yi_ref = rest
    dot = make_dot(dot_mode)

    xr = cm.f32_of(xr_ref[0].reshape(x_dim, -1))
    xi = cm.f32_of(xi_ref[0].reshape(x_dim, -1))
    vr_tot = vi_tot = None
    for t in range(n_terms):
        t1 = dot(e1[t], xr + xi)
        t2 = dot(e2[t], xi)
        t3 = dot(e3[t], xr)
        vr = t1 - t2
        vi = t1 + t3
        # lane factor on the last axis of the (X, m_blk, 128) block
        v2r = vr.reshape(-1, 128)
        v2i = vi.reshape(-1, 128)
        u1 = dot(v2r + v2i, k1[t])
        u2 = dot(v2i, k2[t])
        u3 = dot(v2r, k3[t])
        wr, wi = u1 - u2, u1 + u3
        vr_tot = wr if vr_tot is None else vr_tot + wr
        vi_tot = wi if vi_tot is None else vi_tot + wi
    if conj:
        vi_tot = -vi_tot
    if has_acc:
        vr_tot = cm.f32_of(accr_ref[0].reshape(vr_tot.shape)) + vr_tot
        vi_tot = cm.f32_of(acci_ref[0].reshape(vi_tot.shape)) + vi_tot
    yr_ref[0] = cm.store_as(vr_tot.reshape(yr_ref.shape[1:]), yr_ref.dtype)
    yi_ref[0] = cm.store_as(vi_tot.reshape(yi_ref.shape[1:]), yi_ref.dtype)


@functools.partial(jax.jit, static_argnames=("m_blk", "dot_mode", "alias",
                                             "conj", "out_dtype",
                                             "interpret"))
def high_multi_apply_planes(xr, xi, e_r, e_i, el_r, el_i, *, m_blk: int = 8,
                            dot_mode: str = "f32", alias: bool = True,
                            conj: bool = False, acc=None, out_dtype=None,
                            interpret: bool = False):
    """Multi-term high+lane sweep over plane view ``(A1, X, M, 128)``:
    per-term high-group factors ``e_r/e_i`` are ``(T, X, X)``, lane factors
    ``el_r/el_i`` are ``(T, 128, 128)``; one HBM pass computes the full
    term sum (conj/acc/storage semantics as high_group_apply_planes)."""
    assert xr.ndim == 4 and xr.shape[-1] == 128
    assert e_r.ndim == 3 and el_r.shape[1:] == (128, 128)
    T = e_r.shape[0]
    A1, X, M, _ = xr.shape
    out_dt = acc[0].dtype if acc is not None else xr.dtype
    if out_dtype is not None and acc is None:
        out_dt = jnp.dtype(out_dtype)
        if jnp.dtype(out_dt) != jnp.dtype(xr.dtype):
            alias = False
    if jnp.dtype(xr.dtype).itemsize == 2 or jnp.dtype(out_dt).itemsize == 2:
        m_blk = max(m_blk, 16)
    if M % m_blk:
        m_blk = M
    e1, e2, e3 = e_r, e_r + e_i, e_i - e_r
    k1 = jnp.swapaxes(el_r, 1, 2)
    k2 = jnp.swapaxes(el_r + el_i, 1, 2)
    k3 = jnp.swapaxes(el_i - el_r, 1, 2)
    has_acc = acc is not None
    kern = functools.partial(_kernel_multi, X, T, dot_mode, conj, has_acc)
    blk = (1, X, m_blk, 128)
    big = pl.BlockSpec(blk, cm.blk4, memory_space=pltpu.VMEM)
    ehi = pl.BlockSpec((T, X, X), cm.fixed3, memory_space=pltpu.VMEM)
    lan = pl.BlockSpec((T, 128, 128), cm.fixed3, memory_space=pltpu.VMEM)
    in_specs = [big] * 2 + [ehi] * 3 + [lan] * 3
    args = (xr, xi, e1, e2, e3, k1, k2, k3)
    if has_acc:
        in_specs = in_specs + [big, big]
        args = args + (acc[0].reshape(xr.shape), acc[1].reshape(xr.shape))
        aliases = {8: 0, 9: 1}
    else:
        aliases = {0: 0, 1: 1} if alias else {}
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct(xr.shape, out_dt),
                   jax.ShapeDtypeStruct(xr.shape, out_dt)),
        grid=(A1, M // m_blk),
        in_specs=in_specs,
        out_specs=(big, big),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
