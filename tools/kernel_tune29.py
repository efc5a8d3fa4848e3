"""On-TPU tile-size sweep at 29-qubit shapes (A = 32768, planes 2 GB each).

Data is generated on device (the axon tunnel rejects large host->device
transfers). One TPU job at a time. HBM budget: 4 planes = 8 GB.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from dqc_tpu.ops.pallas.block_backward import block_backward_dual, block_backward_high
from dqc_tpu.ops.pallas.diag import diag_backward_planes, diag_sweep_planes
from dqc_tpu.ops.pallas.dual_apply import dual_group_apply_planes
from dqc_tpu.ops.pallas.high_apply import high_group_apply_planes

A = 1 << 15  # 29 qubits


def dev(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def timeit(label, fn, *args, reps=4, **kw):
    try:
        out = fn(*args, **kw)
        float(jnp.sum(out[0][0]))  # sync
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args, **kw)
        float(jnp.sum(out[0][0]))
        ms = (time.time() - t0) / reps * 1000
        gbps = 2 * 2 * A * 128 * 128 * 4 / (ms / 1e3) / 1e9  # rd+wr both planes
        print(f"{label}: {ms:.1f} ms ({gbps:.0f} GB/s rw)", flush=True)
    except Exception as e:
        print(f"{label}: FAIL {str(e)[:140]}", flush=True)


def main():
    xr, xi = dev(0, (A, 128, 128)), dev(1, (A, 128, 128))
    ops = [dev(10 + i, (128, 128)) for i in range(8)]

    for a_blk in (8, 16, 32, 64):
        timeit(f"dual_apply a_blk={a_blk}", dual_group_apply_planes,
               xr, xi, *ops[:4], a_blk=a_blk)

    # high group g3 view at 29q: (2, 128, 16384, 128)
    h3r = xr.reshape(2, 128, 16384, 128)
    h3i = xi.reshape(2, 128, 16384, 128)
    for m_blk in (8, 16, 32):
        timeit(f"high_apply g3 m_blk={m_blk}", high_group_apply_planes,
               h3r, h3i, *ops[:3], m_blk=m_blk)

    # merged g4+g3 view: (1, 256, 16384, 128) with a 256x256 operator
    m4r = xr.reshape(1, 256, 16384, 128)
    m4i = xi.reshape(1, 256, 16384, 128)
    ops256 = [dev(30 + i, (256, 256)) for i in range(4)]
    for m_blk in (8, 16, 32):
        timeit(f"high_apply merged256 m_blk={m_blk}", high_group_apply_planes,
               m4r, m4i, *ops256[:3], m_blk=m_blk)

    # diag-run kernels
    tabs = [dev(40, (128, 128)), dev(41, (128, 128)),
            dev(42, (A, 128)), dev(43, (A, 128)),
            dev(44, (A, 128)), dev(45, (A, 128))]
    for a_blk in (8, 16, 32):
        timeit(f"diag_sweep a_blk={a_blk}", diag_sweep_planes,
               xr, xi, *tabs, a_blk=a_blk)

    br, bi = dev(2, (A, 128, 128)), dev(3, (A, 128, 128))
    for a_blk in (4, 8, 16):
        timeit(f"bwd_dual a_blk={a_blk}", block_backward_dual,
               xr, xi, br, bi, *ops, a_blk=a_blk)
    for a_blk in (4, 8):
        timeit(f"diag_bwd a_blk={a_blk}", diag_backward_planes,
               xr, xi, br, bi, *tabs, *tabs, a_blk=a_blk)
    h3br = br.reshape(2, 128, 16384, 128)
    h3bi = bi.reshape(2, 128, 16384, 128)
    for m_blk in (8, 16):
        timeit(f"bwd_high g3 m_blk={m_blk}", block_backward_high,
               h3r, h3i, h3br, h3bi, *ops[:4], m_blk=m_blk)


if __name__ == "__main__":
    main()
