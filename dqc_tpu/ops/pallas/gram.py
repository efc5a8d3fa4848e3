"""Pallas TPU kernels: per-group state Gram in one HBM read.

The density epilogue computes, per qubit group ``j``, the complex Gram

    ``G[x, y] = sum_b t[x, b] conj(t[y, b])``

(groups.group_gram convention; every 1q/2q reduced density in the group is a
partial trace of ``G`` — reference primitives.cu:689-876 does one full-state
sweep *per density* instead). On planes ``G = S + i (C^T - C)`` with

    ``S = sum_b (xr[x,b] xr[y,b] + xi[x,b] xi[y,b])``   (real, symmetric)
    ``C[x, y] = sum_b xr[x, b] xi[y, b]``

The XLA path materializes the three real contractions as separate einsums —
~6 half-passes of the state per group. These kernels read the two planes
ONCE and accumulate (S, C) across the sequential TPU grid: 3 MXU dots per
tile, 2 half-passes of HBM per group. One variant per group axis, mirroring
ops/pallas/block_backward.py.

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


def _acc_out(first, s_ref, c_ref, s, c):
    @pl.when(first)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    s_ref[:] += s
    c_ref[:] += c


def _kernel_lane(dot_mode, xr_ref, xi_ref, s_ref, c_ref):
    dot = make_dot(dot_mode)
    xr = cm.f32_of(xr_ref[:].reshape(-1, 128))
    xi = cm.f32_of(xi_ref[:].reshape(-1, 128))
    s = dot(xr.T, xr) + dot(xi.T, xi)
    c = dot(xr.T, xi)
    _acc_out(pl.program_id(0) == 0, s_ref, c_ref, s, c)


@functools.partial(jax.jit, static_argnames=("a_blk", "dot_mode", "interpret"))
def gram_lane(xr, xi, *, a_blk: int = 8, dot_mode: str = "f32",
              interpret: bool = False):
    """(S, C) of the lane group (qubits 0..6) from plane-layout state
    ``(A, 128, 128) x 2`` in one HBM read."""
    assert xr.ndim == 3 and xr.shape[1:] == (128, 128)
    A = xr.shape[0]
    if A % a_blk:
        a_blk = 1
    bs = cm.blk3
    es = cm.fixed2
    kern = functools.partial(_kernel_lane, dot_mode)
    small = jax.ShapeDtypeStruct((128, 128), F32)
    return pl.pallas_call(
        kern,
        out_shape=(small, small),
        grid=(A // a_blk,),
        in_specs=[pl.BlockSpec((a_blk, 128, 128), bs, memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec((128, 128), es, memory_space=pltpu.VMEM),) * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xr, xi)


def _kernel_sub(a_blk, dot_mode, xr_ref, xi_ref, s_ref, c_ref):
    dot = make_dot(dot_mode)
    s = jnp.zeros((128, 128), F32)
    c = jnp.zeros((128, 128), F32)
    for a in range(a_blk):
        xr = cm.f32_of(xr_ref[a])
        xi = cm.f32_of(xi_ref[a])
        s += dot(xr, xr.T) + dot(xi, xi.T)
        c += dot(xr, xi.T)
    _acc_out(pl.program_id(0) == 0, s_ref, c_ref, s, c)


@functools.partial(jax.jit, static_argnames=("a_blk", "dot_mode", "interpret"))
def gram_sublane(xr, xi, *, a_blk: int = 8, dot_mode: str = "f32",
                 interpret: bool = False):
    """(S, C) of the sublane group (qubits 7..13): contracts the (a, lane)
    axes per slice."""
    assert xr.ndim == 3 and xr.shape[1:] == (128, 128)
    A = xr.shape[0]
    if A % a_blk:
        a_blk = 1
    bs = cm.blk3
    es = cm.fixed2
    kern = functools.partial(_kernel_sub, a_blk, dot_mode)
    small = jax.ShapeDtypeStruct((128, 128), F32)
    return pl.pallas_call(
        kern,
        out_shape=(small, small),
        grid=(A // a_blk,),
        in_specs=[pl.BlockSpec((a_blk, 128, 128), bs, memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec((128, 128), es, memory_space=pltpu.VMEM),) * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xr, xi)


def _kernel_high(x_dim, dot_mode, xr_ref, xi_ref, s_ref, c_ref):
    dot = make_dot(dot_mode)
    xr = cm.f32_of(xr_ref[0].reshape(x_dim, -1))
    xi = cm.f32_of(xi_ref[0].reshape(x_dim, -1))
    s = dot(xr, xr.T) + dot(xi, xi.T)
    c = dot(xr, xi.T)
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    _acc_out(first, s_ref, c_ref, s, c)


@functools.partial(jax.jit, static_argnames=("m_blk", "dot_mode", "interpret"))
def gram_high(xr, xi, *, m_blk: int = 8, dot_mode: str = "f32",
              interpret: bool = False):
    """(S, C) of a high group: state planes shaped ``(A1, X, M, 128)`` with
    ``X`` the group axis (8 <= X <= 128)."""
    assert xr.ndim == 4 and xr.shape[-1] == 128
    A1, X, M, _ = xr.shape
    if jnp.dtype(xr.dtype).itemsize == 2:
        m_blk = max(m_blk, 16)  # bf16 tiling: (16, 128) sublane x lane
    if M % m_blk:
        m_blk = M  # irregular M: whole axis per cell (tile-legal)
    bs = cm.blk4
    es = cm.fixed2
    kern = functools.partial(_kernel_high, X, dot_mode)
    small = jax.ShapeDtypeStruct((X, X), F32)
    blk = (1, X, m_blk, 128)
    return pl.pallas_call(
        kern,
        out_shape=(small, small),
        grid=(A1, M // m_blk),
        in_specs=[pl.BlockSpec(blk, bs, memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec((X, X), es, memory_space=pltpu.VMEM),) * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xr, xi)
