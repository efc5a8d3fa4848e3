"""Forward-dual floor attribution: WHERE do the missing GB/s go?

The production dual kernel (ops/pallas/dual_apply.py) measures ~240 GB/s
of the 819 GB/s v5e HBM ceiling, and the round-3 schedule analysis calls
it "latency-bound on the 16-slice sublane small-dot loop" — but that
claim rested on A/B sweeps (bf16x3 / a_blk / batched-sublane all flat),
never on a direct decomposition. This tool times, at the exact 26q bench
shape and with the production BlockSpec/grid structure:

  copy      read 2 (a_blk,128,128) f32 blocks, write 2 (aliased) — the
            pure DMA ceiling of this access pattern, zero compute
  lane      only the 3 big Karatsuba lane dots ((a_blk*128,128)@(128,128))
  sublane   only the per-a-slice small-dot loop (3 dots per slice)
  full      the production kernel (f32 and bf16x3 dot modes)

plus a_blk variants. Interpretation:
  copy ~800 GB/s  -> DMA overlaps fine; the gap is COMPUTE serialization
                     (the kernel is MXU/VPU-time-bound, not latency-bound)
  copy ~240 GB/s  -> the access pattern itself can't stream; fix the
                     pipeline (bigger blocks, explicit double buffering)
  lane+sublane ~= full -> the two stages do NOT overlap with each other's
                     DMA; whichever dominates is the target.

Usage:  python tools/dual_floor.py [n=26] [reps=10]
"""

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
from dqc_tpu.ops.pallas.dots import make_dot  # noqa: E402

F32 = jnp.float32
HBM_GBPS = 819.0


def _copy_kernel(xr_ref, xi_ref, yr_ref, yi_ref):
    yr_ref[:] = xr_ref[:]
    yi_ref[:] = xi_ref[:]


def _lane_kernel(a_blk, dot_mode, xr_ref, xi_ref, k1, k2, k3, yr_ref, yi_ref):
    dot = make_dot(dot_mode)
    x2r = xr_ref[:].astype(F32).reshape(-1, 128)
    x2i = xi_ref[:].astype(F32).reshape(-1, 128)
    t1 = dot(x2r + x2i, k1[:])
    t2 = dot(x2i, k2[:])
    t3 = dot(x2r, k3[:])
    yr_ref[:] = (t1 - t2).reshape(a_blk, 128, 128)
    yi_ref[:] = (t1 + t3).reshape(a_blk, 128, 128)


def _sub_kernel(a_blk, dot_mode, xr_ref, xi_ref, m1, m2, m3, yr_ref, yi_ref):
    dot = make_dot(dot_mode)
    xr = xr_ref[:].astype(F32)
    xi = xi_ref[:].astype(F32)
    for a in range(a_blk):
        ar, ai = xr[a], xi[a]
        v1 = dot(m1[:], ar + ai)
        v2 = dot(m2[:], ai)
        v3 = dot(m3[:], ar)
        yr_ref[a, :, :] = v1 - v2
        yi_ref[a, :, :] = v1 + v3


def _call(kern, n_tabs, a_blk, xr, xi, tabs, alias=True):
    A = xr.shape[0]
    big = pl.BlockSpec((a_blk, 128, 128), cm.blk3, memory_space=pltpu.VMEM)
    tab = pl.BlockSpec((128, 128), cm.fixed2, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct(xr.shape, xr.dtype),) * 2,
        grid=(A // a_blk,),
        in_specs=[big] * 2 + [tab] * n_tabs,
        out_specs=(big, big),
        input_output_aliases={0: 0, 1: 1} if alias else {},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(xr, xi, *tabs)


def synced(out):
    leaves = jax.tree_util.tree_leaves(out)
    jax.block_until_ready(leaves)
    float(jnp.sum(leaves[0][0, 0, :4]))
    return out


def bench(name, fn, args, reps, moved):
    def chained(*c0):
        return jax.lax.fori_loop(0, reps, lambda _, c: fn(*c), c0)

    j = jax.jit(chained)
    try:
        synced(j(*args))
        t0 = time.time()
        synced(j(*args))
        dt = (time.time() - t0) / reps
        gbps = moved / dt / 1e9
        print(f"| {name} | {dt * 1e3:8.2f} ms | {gbps:6.1f} GB/s "
              f"| {gbps / HBM_GBPS:5.1%} |")
    except Exception as e:
        print(f"| {name} | FAIL {type(e).__name__}: {str(e)[:90]} |")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 26
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    A = 1 << (n - 14)
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((A, 128, 128)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((A, 128, 128)).astype(np.float32))
    e = rng.standard_normal((128, 128, 4)).astype(np.float32) / 11.3
    el_r, el_i, em_r, em_i = (jnp.asarray(e[..., i]) for i in range(4))
    k1, k2, k3 = el_r.T, (el_r + el_i).T, (el_i - el_r).T
    m1, m2, m3 = em_r, em_r + em_i, em_i - em_r
    moved = 4 * xr.size * 4  # 2 read + 2 written f32 planes
    print(f"dual floor attribution: n={n}, A={A}, moved {moved / 1e9:.2f} "
          f"GB/pass, reps={reps}, SoL {HBM_GBPS} GB/s\n")
    print("| variant | time/pass | GB/s | of SoL |")
    print("|---|---|---|---|")

    # XLA's own elementwise pass on the same arrays: the backend's ceiling
    bench("xla add (2r+2w)",
          lambda a, b: (a + 1.0, b + 1.0), (xr, xi), reps, moved)

    for a_blk in (8, 16, 32, 64):
        if A % a_blk:
            continue
        bench(f"copy a_blk={a_blk}",
              lambda a, b, ab=a_blk: _call(_copy_kernel, 0, ab, a, b, ()),
              (xr, xi), reps, moved)
    for a_blk in (16, 32):
        if A % a_blk:
            continue
        bench(f"lane-only a_blk={a_blk}",
              lambda a, b, ab=a_blk: _call(
                  functools.partial(_lane_kernel, ab, "f32"), 3, ab, a, b,
                  (k1, k2, k3)),
              (xr, xi), reps, moved)
        bench(f"sublane-only a_blk={a_blk}",
              lambda a, b, ab=a_blk: _call(
                  functools.partial(_sub_kernel, ab, "f32"), 3, ab, a, b,
                  (m1, m2, m3)),
              (xr, xi), reps, moved)

    from dqc_tpu.ops.pallas.dual_apply import dual_group_apply_planes
    for dot_mode in ("f32", "bf16x3"):
        for a_blk in (16, 32):
            if A % a_blk:
                continue
            bench(f"full dual {dot_mode} a_blk={a_blk}",
                  lambda a, b, ab=a_blk, dm=dot_mode: dual_group_apply_planes(
                      a, b, el_r, el_i, em_r, em_i, a_blk=ab, dot_mode=dm),
                  (xr, xi), reps, moved)


if __name__ == "__main__":
    main()
