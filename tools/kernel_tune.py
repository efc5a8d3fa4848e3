"""On-TPU tile-size sweep for the plane kernels at 26q shapes.

Times each kernel standalone (f32 dots) across a_blk/m_blk variants; prints
ms per call. One TPU job at a time.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from dqc_tpu.ops.pallas.dual_apply import dual_group_apply_planes
from dqc_tpu.ops.pallas.block_backward import (
    block_backward_dual,
    block_backward_high,
    block_backward_lane,
)

A = 4096  # 26 qubits


def mk(seed, shape):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape).astype(np.float32))


def timeit(fn, *args, reps=6, **kw):
    out = fn(*args, **kw)
    jax.tree_util.tree_map(lambda x: x, out)
    float(jnp.sum(out[0][0]))  # sync
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args, **kw)
    float(jnp.sum(out[0][0]))
    return (time.time() - t0) / reps * 1000


def main():
    xr, xi = mk(0, (A, 128, 128)), mk(1, (A, 128, 128))
    br, bi = mk(2, (A, 128, 128)), mk(3, (A, 128, 128))
    ops = [mk(10 + i, (128, 128)) for i in range(8)]

    for a_blk in (8, 16, 32):
        ms = timeit(dual_group_apply_planes, xr, xi, *ops[:4], a_blk=a_blk)
        print(f"dual_apply a_blk={a_blk}: {ms:.2f} ms", flush=True)

    for a_blk in (4, 8):
        ms = timeit(block_backward_lane, xr, xi, br, bi, *ops[:4], a_blk=a_blk)
        print(f"bwd_lane a_blk={a_blk}: {ms:.2f} ms", flush=True)

    for a_blk in (2, 4, 8):
        ms = timeit(block_backward_dual, xr, xi, br, bi, *ops, a_blk=a_blk)
        print(f"bwd_dual a_blk={a_blk}: {ms:.2f} ms", flush=True)

    # high-group shapes at 26q: group 2 (32,128,128,128)
    hr = xr.reshape(32, 128, 128, 128)
    hi_ = xi.reshape(32, 128, 128, 128)
    hbr = br.reshape(32, 128, 128, 128)
    hbi = bi.reshape(32, 128, 128, 128)
    for m_blk in (8, 16):
        try:
            ms = timeit(block_backward_high, hr, hi_, hbr, hbi, *ops[:4], m_blk=m_blk)
            print(f"bwd_high m_blk={m_blk}: {ms:.2f} ms", flush=True)
        except Exception as e:
            print(f"bwd_high m_blk={m_blk}: FAIL {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
