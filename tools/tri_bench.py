"""A/B microbench: tri-group fused sweep vs dual + high sweeps (TPU).

Usage: python tools/tri_bench.py [n_qubits] [reps]
Times `reps` serial in-jit iterations of each pipeline on the live chip
(host-fetch sync; see utils/profiling.synced) and prints ms/sweep.
"""

import sys
import time

import os
sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from dqc_tpu.ops.pallas.dual_apply import dual_group_apply_planes
from dqc_tpu.ops.pallas.high_apply import high_group_apply_planes
from tri_kernels import tri_group_apply_planes

n = int(sys.argv[1]) if len(sys.argv) > 1 else 26
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 30

if n < 21:
    raise SystemExit("tri_bench needs n >= 21 (a full 7-bit group-2 axis: "
                     "A = 2^(n-14) must hold X = 128 rows)")
A = 1 << (n - 14)
X = 128
A1 = A // X
rng = np.random.default_rng(0)


def randf(*s):
    return jnp.asarray(rng.standard_normal(s).astype(np.float32))


xr = randf(A, 128, 128)
xi = randf(A, 128, 128)
ops = [randf(128, 128) for _ in range(4)]
hops = [randf(X, X) for _ in range(2)]
tsl = [randf(128, 128) for _ in range(2)]
tas = [randf(A, 128) for _ in range(2)]
tal = [randf(A, 128) for _ in range(2)]


@jax.jit
def pipe_separate(xr, xi):
    for _ in range(reps):
        xr, xi = dual_group_apply_planes(xr, xi, *ops)
        vr = xr.reshape(A1, X, 128, 128)
        vi = xi.reshape(A1, X, 128, 128)
        vr, vi = high_group_apply_planes(vr, vi, *hops)
        xr, xi = vr.reshape(A, 128, 128), vi.reshape(A, 128, 128)
    return xr, xi


@jax.jit
def pipe_tri(xr, xi):
    for _ in range(reps):
        vr = xr.reshape(A1, X, 128, 128)
        vi = xi.reshape(A1, X, 128, 128)
        vr, vi = tri_group_apply_planes(vr, vi, *ops, *hops)
        xr, xi = vr.reshape(A, 128, 128), vi.reshape(A, 128, 128)
    return xr, xi


dtab = tuple(t for t in tsl) + tuple(t.reshape(A1, X, 128) for t in tas) \
    + tuple(t.reshape(A1, X, 128) for t in tal)
dtab_flat = tuple(t for t in tsl) + tuple(tas) + tuple(tal)


@jax.jit
def pipe_separate_diag(xr, xi):
    for _ in range(reps):
        xr, xi = dual_group_apply_planes(xr, xi, *ops,
                                         diag_tables=dtab_flat)
        vr = xr.reshape(A1, X, 128, 128)
        vi = xi.reshape(A1, X, 128, 128)
        vr, vi = high_group_apply_planes(vr, vi, *hops)
        xr, xi = vr.reshape(A, 128, 128), vi.reshape(A, 128, 128)
    return xr, xi


@jax.jit
def pipe_tri_diag(xr, xi):
    for _ in range(reps):
        vr = xr.reshape(A1, X, 128, 128)
        vi = xi.reshape(A1, X, 128, 128)
        vr, vi = tri_group_apply_planes(vr, vi, *ops, *hops,
                                        diag_tables=dtab)
        xr, xi = vr.reshape(A, 128, 128), vi.reshape(A, 128, 128)
    return xr, xi


def run(name, fn):
    r, i = fn(xr, xi)
    float(r[0, 0, 0])  # sync
    t0 = time.time()
    r, i = fn(xr, xi)
    float(r[0, 0, 0])
    dt = (time.time() - t0) / reps * 1000
    gb = 2 * 2 * A * 128 * 128 * 4 / 1e9
    print(f"{name}: {dt:.2f} ms/sweep-pair  ({gb/dt*1000:.0f} GB/s of pair IO)")
    return dt


print(f"n={n} A={A} reps={reps} backend={jax.default_backend()}")
a = run("dual+high (2 passes)", pipe_separate)
b = run("tri      (1 pass)  ", pipe_tri)
print(f"speedup {a/b:.2f}x")
c = run("ddual+high (2 passes)", pipe_separate_diag)
d = run("tri+diag   (1 pass)  ", pipe_tri_diag)
print(f"speedup {c/d:.2f}x")
if os.environ.get("DQC_TRIBENCH_FWD_ONLY"):
    sys.exit(0)


# ---- backward A/B ----
from dqc_tpu.ops.pallas.block_backward import (block_backward_dual,
                                               block_backward_high)
from tri_kernels import tri_block_backward

fr, fi, br, bi = (randf(A, 128, 128) for _ in range(4))
iops = [randf(128, 128) for _ in range(4)]


@jax.jit
def bwd_separate(fr, fi, br, bi):
    for _ in range(reps):
        vr, vi, wr, wi = (x.reshape(A1, X, 128, 128) for x in (fr, fi, br, bi))
        vr, vi, wr, wi, t0h_r, t0h_i = high_group_backward(vr, vi, wr, wi)
        fr, fi, br, bi = (x.reshape(A, 128, 128) for x in (vr, vi, wr, wi))
        fr, fi, br, bi, tl_r, tl_i, ts_r, ts_i = block_backward_dual(
            fr, fi, br, bi, *iops, *ops, g0_first=True)
    return fr, fi, br, bi, tl_r


def high_group_backward(vr, vi, wr, wi):
    return block_backward_high(vr, vi, wr, wi, *hops, *hops)


@jax.jit
def bwd_tri(fr, fi, br, bi):
    for _ in range(reps):
        vr, vi, wr, wi = (x.reshape(A1, X, 128, 128) for x in (fr, fi, br, bi))
        out = tri_block_backward(vr, vi, wr, wi, *iops, *ops, *hops, *hops,
                                 g0_first=True)
        fr, fi, br, bi = (x.reshape(A, 128, 128) for x in out[:4])
        tl_r = out[4]
    return fr, fi, br, bi, tl_r


def run_bwd(name, fn):
    o = fn(fr, fi, br, bi)
    float(o[0][0, 0, 0])
    t0 = time.time()
    o = fn(fr, fi, br, bi)
    float(o[0][0, 0, 0])
    dt = (time.time() - t0) / reps * 1000
    gb = 4 * 2 * A * 128 * 128 * 4 / 1e9
    print(f"{name}: {dt:.2f} ms  ({gb/dt*1000:.0f} GB/s of 2-pair IO)")
    return dt


e = run_bwd("bwd dual+high (2 kernels)", bwd_separate)
f = run_bwd("bwd tri       (1 kernel) ", bwd_tri)
print(f"bwd speedup {e/f:.2f}x")
