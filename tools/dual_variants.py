"""A/B harness: sublane-stage structure variants of the forward dual kernel.

The production dual sweep (ops/pallas/dual_apply.py) is latency-bound on
its 16-slice sublane small-dot loop (BENCHMARKS.md round-3 floor analysis:
bf16x3 is slower, a_blk/semantics sweeps are flat, ~230 GB/s vs the high
kernel's 327). Round 2 measured a batched-TRANSPOSE restructure slower.
This file holds the remaining untried structures as standalone kernels +
a serial-rep bench so the next TPU session can A/B them in minutes:

* v0  baseline — per-a python loop of (128,128)@(128,128) left-dots
  (the production structure).
* v1  batched dot_general — ONE ``jax.lax.dot_general`` with the a-axis
  as a batch dimension; tests whether Mosaic lowers a batched matmul to
  a pipelined MXU sequence instead of the loop's serialized small dots.
(Not implemented here: a layout-flipping "emit Y^T from the lane dots,
store the (s, l)-swapped tile" variant would make the sublane stage one
big right-dot, but every DOWNSTREAM sweep must then read the flipped
layout — an engine-wide change; only worth designing if v1 shows the
loop really is the bottleneck and batched lowering doesn't fix it.)

Usage:
  python tools/dual_variants.py check       # CPU interpret oracle check
  python tools/dual_variants.py bench [n] [reps]   # on TPU
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from dqc_tpu.ops.pallas import common as cm  # noqa: E402

F32 = jnp.float32
HI = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=F32, precision=HI)


def _kernel_v0(a_blk, xr_ref, xi_ref, k1, k2, k3, m1, m2, m3,
               yr_ref, yi_ref):
    xr = xr_ref[:].astype(F32)
    xi = xi_ref[:].astype(F32)
    x2r = xr.reshape(-1, 128)
    x2i = xi.reshape(-1, 128)
    t1 = _dot(x2r + x2i, k1[:])
    t2 = _dot(x2i, k2[:])
    t3 = _dot(x2r, k3[:])
    yr = (t1 - t2).reshape(a_blk, 128, 128)
    yi = (t1 + t3).reshape(a_blk, 128, 128)
    for a in range(a_blk):
        ar, ai = yr[a], yi[a]
        v1 = _dot(m1[:], ar + ai)
        v2 = _dot(m2[:], ai)
        v3 = _dot(m3[:], ar)
        yr_ref[a, :, :] = (v1 - v2).astype(yr_ref.dtype)
        yi_ref[a, :, :] = (v1 + v3).astype(yi_ref.dtype)


def _bdot(m, y):
    # one batched contraction: (s, k) x (a, k, l) -> (a, s, l) with the
    # a-axis as the rhs batch... dot_general wants batch dims on BOTH
    # operands, so broadcast-free form: contract k, keep a on the right:
    # ((k,), (k,)) contracting -> (s, a, l); transpose is NOT materialized
    # — instead express as lhs=y (a, k, l) contracting k with m^T (k, s)
    # batch a: dimension_numbers=(((1,), (0,)), ((), ())) on (y2, mT)
    # gives (a, l, s)?? Keep it simple: einsum, let Mosaic decide.
    return jnp.einsum("sk,akl->asl", m, y,
                      preferred_element_type=F32, precision=HI)


def _kernel_v1(a_blk, xr_ref, xi_ref, k1, k2, k3, m1, m2, m3,
               yr_ref, yi_ref):
    xr = xr_ref[:].astype(F32)
    xi = xi_ref[:].astype(F32)
    x2r = xr.reshape(-1, 128)
    x2i = xi.reshape(-1, 128)
    t1 = _dot(x2r + x2i, k1[:])
    t2 = _dot(x2i, k2[:])
    t3 = _dot(x2r, k3[:])
    yr = (t1 - t2).reshape(a_blk, 128, 128)
    yi = (t1 + t3).reshape(a_blk, 128, 128)
    v1 = _bdot(m1[:], yr + yi)
    v2 = _bdot(m2[:], yi)
    v3 = _bdot(m3[:], yr)
    yr_ref[:] = (v1 - v2).astype(yr_ref.dtype)
    yi_ref[:] = (v1 + v3).astype(yi_ref.dtype)


def _make(kernel, a_blk=16):
    @functools.partial(jax.jit, static_argnames=("interpret",))
    def run(xr, xi, el_r, el_i, em_r, em_i, interpret=False):
        A = xr.shape[0]
        ab = a_blk
        while A % ab:
            ab >>= 1
        k1 = el_r.T
        k2 = (el_r + el_i).T
        k3 = (el_i - el_r).T
        m1, m2, m3 = em_r, em_r + em_i, em_i - em_r
        big = pl.BlockSpec((ab, 128, 128), cm.blk3, memory_space=pltpu.VMEM)
        tab = pl.BlockSpec((128, 128), cm.fixed2, memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(kernel, ab),
            out_shape=(jax.ShapeDtypeStruct(xr.shape, xr.dtype),) * 2,
            grid=(A // ab,),
            in_specs=[big] * 2 + [tab] * 6,
            out_specs=(big, big),
            input_output_aliases={0: 0, 1: 1},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=interpret,
        )(xr, xi, k1, k2, k3, m1, m2, m3)
    return run


VARIANTS = {"v0_loop": _make(_kernel_v0), "v1_batched": _make(_kernel_v1)}


def _oracle(x, el, em):
    # y = Em @ x @ El^T per a-slice
    return np.einsum("sk,akl,ml->asm", em, x, el)


def check():
    rng = np.random.default_rng(0)
    A = 4
    x = (rng.standard_normal((A, 128, 128))
         + 1j * rng.standard_normal((A, 128, 128))).astype(np.complex64)
    el = (rng.standard_normal((128, 128))
          + 1j * rng.standard_normal((128, 128))).astype(np.complex64) / 11.3
    em = (rng.standard_normal((128, 128))
          + 1j * rng.standard_normal((128, 128))).astype(np.complex64) / 11.3
    want = _oracle(x.astype(np.complex128), el.astype(np.complex128),
                   em.astype(np.complex128))
    for name, fn in VARIANTS.items():
        yr, yi = fn(jnp.asarray(x.real), jnp.asarray(x.imag),
                    jnp.asarray(el.real), jnp.asarray(el.imag),
                    jnp.asarray(em.real), jnp.asarray(em.imag),
                    interpret=True)
        got = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)
        err = np.abs(got - want).max() / np.abs(want).max()
        print(f"{name}: rel err {err:.2e}")
        assert err < 1e-5, (name, err)
    print("CHECK OK")


def bench(n=26, reps=30):
    A = 1 << (n - 14)
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((A, 128, 128)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((A, 128, 128)).astype(np.float32))
    E = rng.standard_normal((128, 128, 4)).astype(np.float32) / 11.3
    ops = tuple(jnp.asarray(E[..., i]) for i in range(4))
    moved = 4 * xr.size * 4

    for name, fn in VARIANTS.items():
        def chained(*c0):
            return jax.lax.fori_loop(
                0, reps, lambda _, c: fn(*c, *ops), c0)
        j = jax.jit(chained)
        out = j(xr, xi)
        float(jnp.sum(out[0][0, 0]))  # compile + sync
        t0 = time.time()
        out = j(xr, xi)
        float(jnp.sum(out[0][0, 0]))
        dt = (time.time() - t0) / reps
        print(f"| {name} | {dt*1e3:7.2f} ms | {moved/dt/1e9:6.1f} GB/s |")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "check":
        jax.config.update("jax_platforms", "cpu")  # interpret-mode oracle
        check()
    else:
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 26
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 30
        bench(n, reps)
