"""Pallas TPU kernels: fused diagonal-run sweep and its one-pass adjoint.

A run of consecutive commuting diagonal gates (in-group diagonal blocks and
cross-group diagonal tables — the entangler-ring pattern of every layered
ansatz, reference primitives.cu:649-686 does one full sweep per gate) is a
single elementwise multiply by a total diagonal that factors into at most
three pairwise tables over the plane-layout axes (a = merged high groups,
s = sublane group, l = lane group):

    ``D[a, s, l] = Tas[a, s] * Tal[a, l] * Tsl[s, l]``

(any in-group factor folds into one of the pair tables; any diagonal among
high groups only folds into the ``a`` dependence of Tas/Tal).

The XLA elementwise path materializes a fresh full-state temp per multiply
chain — at 29 qubits those 2 GB kLoop-fusion temps were the measured HBM-OOM
driver (BENCHMARKS.md). These kernels update the planes IN PLACE
(``input_output_aliases``) in exactly one HBM pass:

* ``diag_sweep_planes``: ``x *= D``.
* ``diag_backward_planes``: ``fwd *= D_inv``, ``bwd *= D`` (cotangent
  transport by ``D^T = D``), and — for var-gate gradients — the reductions
  of the order-invariant pair product ``Q = bwd * fwd`` (complex, no conj,
  taken BEFORE the updates):

      ``Qsl[s, l] = sum_a Q``, ``Qas[a, s] = sum_l Q``,
      ``Qal[a, l] = sum_s Q``.

  Every diagonal gate's gram in the run is a tiny restriction of these:
  uncomputing gate g divides fwd by ``d_g`` which lives on g's own (kept)
  axes, so ``W_g = reduce(Q) / d_g`` — see circuit/plane_scan.py.

Works under ``interpret=True`` on CPU for testing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dqc_tpu.ops.pallas import common as cm

F32 = jnp.float32


def _cmul(xr, xi, yr, yi):
    return xr * yr - xi * yi, xr * yi + xi * yr


def _total_diag(tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i):
    """In-kernel composed multiplier m[a, s, l] for one (a_blk, 128, 128)
    tile; the pair tables arrive as (a_blk, 128) / (128, 128) VMEM blocks."""
    # m = Tas[a,s] * Tal[a,l] * Tsl[s,l]
    mr, mi = _cmul(
        tas_r[:][:, :, None], tas_i[:][:, :, None],
        tal_r[:][:, None, :], tal_i[:][:, None, :],
    )
    return _cmul(mr, mi, tsl_r[:][None, :, :], tsl_i[:][None, :, :])


def _kernel_sweep(xr_ref, xi_ref,
                  tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i,
                  yr_ref, yi_ref):
    mr, mi = _total_diag(tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i)
    yr, yi = _cmul(cm.f32_of(xr_ref[:]), cm.f32_of(xi_ref[:]), mr, mi)
    yr_ref[:] = cm.store_as(yr, yr_ref.dtype)
    yi_ref[:] = cm.store_as(yi, yi_ref.dtype)


@functools.partial(jax.jit, static_argnames=("a_blk", "interpret"))
def diag_sweep_planes(xr, xi, tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i,
                      *, a_blk: int = 8, interpret: bool = False):
    """One in-place HBM pass applying the factored total diagonal.

    ``xr/xi``: (A, 128, 128) planes. ``tsl``: (128, 128) sublane x lane
    table; ``tas``/``tal``: (A, 128) a x sublane / a x lane tables.
    """
    assert xr.ndim == 3 and xr.shape[1:] == (128, 128)
    A = xr.shape[0]
    if A % a_blk:
        a_blk = A  # small A (n < 17): whole leading axis per cell (tile-legal)
    kern = _kernel_sweep
    big = pl.BlockSpec((a_blk, 128, 128), cm.blk3, memory_space=pltpu.VMEM)
    tab_sl = pl.BlockSpec((128, 128), cm.fixed2, memory_space=pltpu.VMEM)
    tab_a = pl.BlockSpec((a_blk, 128), cm.blk2, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct(xr.shape, xr.dtype),) * 2,
        grid=(A // a_blk,),
        in_specs=[big, big, tab_sl, tab_sl, tab_a, tab_a, tab_a, tab_a],
        out_specs=(big, big),
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xr, xi, tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i)


def _kernel_bwd(with_q,
                fr_ref, fi_ref, br_ref, bi_ref,
                isl_r, isl_i, ias_r, ias_i, ial_r, ial_i,   # D_inv tables
                tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i,   # D tables
                *out_refs):
    if with_q:
        (fnr_ref, fni_ref, bnr_ref, bni_ref,
         qsl_r_ref, qsl_i_ref, qas_r_ref, qas_i_ref,
         qal_r_ref, qal_i_ref) = out_refs
    else:
        fnr_ref, fni_ref, bnr_ref, bni_ref = out_refs

    fr, fi = cm.f32_of(fr_ref[:]), cm.f32_of(fi_ref[:])
    br, bi = cm.f32_of(br_ref[:]), cm.f32_of(bi_ref[:])

    if with_q:
        # order-invariant pair product BEFORE the updates (see module doc)
        qr, qi = _cmul(br, bi, fr, fi)
        qsl_r = jnp.sum(qr, axis=0)
        qsl_i = jnp.sum(qi, axis=0)
        qas_r = jnp.sum(qr, axis=2)
        qas_i = jnp.sum(qi, axis=2)
        qal_r = jnp.sum(qr, axis=1)
        qal_i = jnp.sum(qi, axis=1)

        @pl.when(pl.program_id(0) == 0)
        def _():
            qsl_r_ref[:] = jnp.zeros_like(qsl_r_ref)
            qsl_i_ref[:] = jnp.zeros_like(qsl_i_ref)

        qsl_r_ref[:] += qsl_r
        qsl_i_ref[:] += qsl_i
        qas_r_ref[:] = qas_r
        qas_i_ref[:] = qas_i
        qal_r_ref[:] = qal_r
        qal_i_ref[:] = qal_i

    mr, mi = _total_diag(isl_r, isl_i, ias_r, ias_i, ial_r, ial_i)
    fnr, fni = _cmul(fr, fi, mr, mi)
    fnr_ref[:] = cm.store_as(fnr, fnr_ref.dtype)
    fni_ref[:] = cm.store_as(fni, fni_ref.dtype)

    mr, mi = _total_diag(tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i)
    bnr, bni = _cmul(br, bi, mr, mi)
    bnr_ref[:] = cm.store_as(bnr, bnr_ref.dtype)
    bni_ref[:] = cm.store_as(bni, bni_ref.dtype)


@functools.partial(jax.jit, static_argnames=("a_blk", "with_q", "interpret"))
def diag_backward_planes(fr, fi, br, bi,
                         isl_r, isl_i, ias_r, ias_i, ial_r, ial_i,
                         tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i,
                         *, a_blk: int = 8, with_q: bool = True,
                         interpret: bool = False):
    """One in-place HBM pass rolling (fwd, bwd) back through a diagonal run:
    ``fwd *= D_inv``, ``bwd *= D``; with ``with_q`` also returns the Q pair
    reductions (Qsl (128,128) accumulated; Qas, Qal (A,128) per-tile).

    Returns ``(f_r, f_i, b_r, b_i[, qsl_r, qsl_i, qas_r, qas_i, qal_r,
    qal_i])``.
    """
    assert fr.ndim == 3 and fr.shape[1:] == (128, 128)
    A = fr.shape[0]
    if A % a_blk:
        a_blk = A  # small A (n < 17): whole leading axis per cell (tile-legal)
    kern = functools.partial(_kernel_bwd, with_q)
    big = pl.BlockSpec((a_blk, 128, 128), cm.blk3, memory_space=pltpu.VMEM)
    tab_sl = pl.BlockSpec((128, 128), cm.fixed2, memory_space=pltpu.VMEM)
    tab_a = pl.BlockSpec((a_blk, 128), cm.blk2, memory_space=pltpu.VMEM)
    acc_sl = pl.BlockSpec((128, 128), cm.fixed2, memory_space=pltpu.VMEM)
    fbig_sh = jax.ShapeDtypeStruct(fr.shape, fr.dtype)
    bbig_sh = jax.ShapeDtypeStruct(br.shape, br.dtype)
    sl_sh = jax.ShapeDtypeStruct((128, 128), F32)
    a_sh = jax.ShapeDtypeStruct((A, 128), F32)
    out_shape = (fbig_sh, fbig_sh, bbig_sh, bbig_sh)
    out_specs = (big, big, big, big)
    if with_q:
        out_shape = out_shape + (sl_sh, sl_sh, a_sh, a_sh, a_sh, a_sh)
        out_specs = out_specs + (acc_sl, acc_sl, tab_a, tab_a, tab_a, tab_a)
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(A // a_blk,),
        in_specs=[big] * 4 + [tab_sl, tab_sl, tab_a, tab_a, tab_a, tab_a] * 2,
        out_specs=out_specs,
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(fr, fi, br, bi,
      isl_r, isl_i, ias_r, ias_i, ial_r, ial_i,
      tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i)
