"""Experiment: dual kernel with the per-a sublane loop replaced by one
big transposed dot. Measures both variants at 26q and 29q shapes."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from dqc_tpu.ops.pallas import common as cm
from dqc_tpu.ops.pallas.dual_apply import dual_group_apply_planes

F32 = jnp.float32
HI = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=F32, precision=HI)


def _kernel_v2(a_blk, xr_ref, xi_ref, k1, k2, k3, m1, m2, m3, yr_ref, yi_ref):
    # lane: batched big dot (as before)
    x2r = xr_ref[:].reshape(-1, 128)
    x2i = xi_ref[:].reshape(-1, 128)
    t1 = _dot(x2r + x2i, k1[:])
    t2 = _dot(x2i, k2[:])
    t3 = _dot(x2r, k3[:])
    yr = (t1 - t2).reshape(a_blk, 128, 128)
    yi = (t1 + t3).reshape(a_blk, 128, 128)

    # sublane: ONE transposed big dot per Karatsuba term
    ytr = jnp.transpose(yr, (1, 0, 2)).reshape(128, -1)   # (s, a*l)
    yti = jnp.transpose(yi, (1, 0, 2)).reshape(128, -1)
    v1 = _dot(m1[:], ytr + yti)
    v2 = _dot(m2[:], yti)
    v3 = _dot(m3[:], ytr)
    zr = (v1 - v2).reshape(128, a_blk, 128)
    zi = (v1 + v3).reshape(128, a_blk, 128)
    yr_ref[:] = jnp.transpose(zr, (1, 0, 2))
    yi_ref[:] = jnp.transpose(zi, (1, 0, 2))


@functools.partial(jax.jit, static_argnames=("a_blk",))
def dual_v2(xr, xi, el_r, el_i, em_r, em_i, *, a_blk: int = 16):
    A = xr.shape[0]
    k1, k2, k3 = el_r.T, (el_r + el_i).T, (el_i - el_r).T
    m1, m2, m3 = em_r, em_r + em_i, em_i - em_r
    big = pl.BlockSpec((a_blk, 128, 128), cm.blk3, memory_space=pltpu.VMEM)
    es = pl.BlockSpec((128, 128), cm.fixed2, memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel_v2, a_blk)
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct(xr.shape, F32),) * 2,
        grid=(A // a_blk,),
        in_specs=[big, big] + [es] * 6,
        out_specs=(big, big),
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(xr, xi, k1, k2, k3, m1, m2, m3)


def dev(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, F32)


def timeit(label, fn, *args, reps=4, **kw):
    try:
        out = fn(*args, **kw)
        float(jnp.sum(out[0][0]))
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args, **kw)
        float(jnp.sum(out[0][0]))
        print(f"{label}: {(time.time()-t0)/reps*1000:.1f} ms", flush=True)
    except Exception as e:
        print(f"{label}: FAIL {str(e)[:160]}", flush=True)


def main():
    import numpy as np
    ops = [dev(10 + i, (128, 128)) for i in range(4)]
    # correctness check at small A
    xr, xi = dev(0, (8, 128, 128)), dev(1, (8, 128, 128))
    a = dual_group_apply_planes(xr, xi, *ops, a_blk=8)
    b = dual_v2(xr, xi, *ops, a_blk=8)
    err = float(jnp.max(jnp.abs(a[0] - b[0])) + jnp.max(jnp.abs(a[1] - b[1])))
    print(f"parity err {err:.2e}", flush=True)

    for A in (4096, 1 << 15):
        xr, xi = dev(0, (A, 128, 128)), dev(1, (A, 128, 128))
        for a_blk in (8, 16, 32):
            timeit(f"A={A} loop a_blk={a_blk}", dual_group_apply_planes,
                   xr, xi, *ops, a_blk=a_blk)
            timeit(f"A={A} v2   a_blk={a_blk}", dual_v2, xr, xi, *ops,
                   a_blk=a_blk)


if __name__ == "__main__":
    main()
