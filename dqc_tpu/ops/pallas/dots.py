"""In-kernel matmul strategies for the plane-layout Pallas kernels.

The kernels are MXU-bound, not HBM-bound (measured on v5e: a dual-group
sweep moves 1 GB in ~1.2 ms of HBM time but spends ~3-6 ms in f32 matmuls):
an f32 x f32 dot at ``Precision.HIGHEST`` decomposes into ~6 bf16 MXU
passes. Mosaic rejects ``Precision.HIGH`` (the 3-pass mode) as a flag, so
``bf16x3`` implements it manually: split each operand into a bf16 hi part
and a bf16 lo remainder and take the three significant cross terms —
~f32-grade accuracy (error ~2x a true f32 dot, the hi*lo terms carry the
next 8 mantissa bits) at half the MXU passes.

Select per process with ``config.set_kernel_dot_mode`` ("f32" | "bf16x3").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

F32 = jnp.float32
BF16 = jnp.bfloat16


def _dot_f32(a, b):
    return jnp.dot(a, b, preferred_element_type=F32,
                   precision=jax.lax.Precision.HIGHEST)


def _dot_bf16x3(a, b):
    ah = a.astype(BF16)
    al = (a - ah.astype(F32)).astype(BF16)
    bh = b.astype(BF16)
    bl = (b - bh.astype(F32)).astype(BF16)

    def d(x, y):
        return jnp.dot(x, y, preferred_element_type=F32)

    return d(ah, bh) + d(ah, bl) + d(al, bh)


def make_dot(mode: str):
    if mode == "f32":
        return _dot_f32
    if mode == "bf16x3":
        return _dot_bf16x3
    raise ValueError(f"unknown kernel dot mode {mode!r}")
