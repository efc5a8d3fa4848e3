"""Measured per-kernel HBM bandwidth at bench shapes (VERDICT r2 #2).

Times each production kernel directly on the TPU with exactly-known moved
bytes (block sizes x grid — no schedule model involved), giving MEASURED
achieved bandwidth per kernel class. Together with the engine's exact
per-item pass counts this replaces the unverifiable "estimate only" story:
 predicted step time = sum(counts x measured kernel time) is printed next
to the real measured step time of the same layer for validation.

Usage: python tools/kernel_bw.py [n] [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from dqc_tpu import config  # noqa: E402
from dqc_tpu.ops import planes as pl  # noqa: E402

F32 = jnp.float32
HBM_GBPS = 819.0


def synced(fn, *args):
    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    jax.block_until_ready(leaves)
    # host fetch forces true completion on the tunnel backend
    float(jnp.sum(leaves[0][(0,) * (leaves[0].ndim - 1)][0]
                  if leaves[0].ndim > 1 else leaves[0][0]))
    return out


def bench_op(name, fn, x, reps, moved_bytes):
    """``reps`` serial kernel applications inside ONE jit (lax.fori_loop:
    the body compiles once; the serial carry dependency measures true
    per-pass device time — per-call Python dispatch through the remote
    tunnel adds tens of ms of RTT per call and is useless for timing)."""
    def chained(*c0):
        return jax.lax.fori_loop(0, reps, lambda _, c: fn(*c), c0)

    j = jax.jit(chained)
    synced(j, *x)  # compile + warm
    t0 = time.time()
    out = synced(j, *x)
    dt = (time.time() - t0) / reps
    gbps = moved_bytes / dt / 1e9
    print(f"| {name} | {dt * 1e3:8.2f} ms | {moved_bytes / 1e9:6.2f} GB "
          f"| {gbps:7.1f} GB/s | {gbps / HBM_GBPS:5.1%} |")
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 26
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    A = 1 << (n - 14)
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((A, 128, 128)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((A, 128, 128)).astype(np.float32))
    E = rng.standard_normal((128, 128, 2)).astype(np.float32) / 11.3
    el_r, el_i = jnp.asarray(E[..., 0]), jnp.asarray(E[..., 1])
    plane_bytes = xr.size * 4  # one f32 plane
    rw_pair = 4 * plane_bytes  # read+write both planes of one state

    print(f"kernel bandwidth @ n={n} (A={A}), reps={reps}, "
          f"SoL {HBM_GBPS} GB/s\n")
    print("| kernel | time/pass | moved | achieved | of SoL |")
    print("|---|---|---|---|---|")

    dm = config.kernel_dot_mode()

    # one aliased dual sweep: read 2 planes + write 2 planes
    bench_op("dual (lane+sublane dense)", lambda a, b: pl.apply_dual(
        a, b, el_r + 1j * el_i, el_r - 1j * el_i), (xr, xi), reps, rw_pair)

    # high-axis sweep, X=128 (group 2)
    bench_op("high (X=128 dense)", lambda a, b: pl.apply_high(
        a, b, el_r + 1j * el_i, 2, n), (xr, xi), reps, rw_pair)

    # fused diagonal-run sweep
    tsl = np.exp(1j * rng.uniform(0, 2 * np.pi, (128, 128))).astype(np.complex64)
    ta = np.exp(1j * rng.uniform(0, 2 * np.pi, (A, 128))).astype(np.complex64)
    T = (tsl, ta, ta)  # host numpy: complex64 device_put fails on axon
    bench_op("diag run (fused tables)", lambda a, b: pl.apply_diag_run(
        a, b, T), (xr, xi), reps, rw_pair)

    # backward dual: reads fwd+bwd pairs, writes both = 2x the bytes
    from dqc_tpu.ops.pallas.block_backward import block_backward_dual

    br = jnp.asarray(rng.standard_normal((A, 128, 128)).astype(np.float32))
    bi = jnp.asarray(rng.standard_normal((A, 128, 128)).astype(np.float32))
    Ec = (E[..., 0] + 1j * E[..., 1]).astype(np.complex64)
    Einv = np.linalg.inv(Ec).astype(np.complex64)
    ir, ii = jnp.asarray(Einv.real), jnp.asarray(Einv.imag)

    def bwd_step(fr_, fi_, br_, bi_):
        out = block_backward_dual(
            fr_, fi_, br_, bi_, ir, ii, el_r, el_i,
            ir, ii, el_r, el_i, g0_first=True, dot_mode=dm)
        return (out[0], out[1], out[2], out[3])

    try:
        def chained_b(*c0):
            return jax.lax.fori_loop(0, reps, lambda _, c: bwd_step(*c), c0)
        j = jax.jit(chained_b)
        synced(j, xr, xi, br, bi)
        t0 = time.time()
        synced(j, xr, xi, br, bi)
        dt = (time.time() - t0) / reps
        gbps = 2 * rw_pair / dt / 1e9
        print(f"| backward dual (fwd+bwd pairs) | {dt * 1e3:8.2f} ms | "
              f"{2 * rw_pair / 1e9:6.2f} GB | {gbps:7.1f} GB/s | "
              f"{gbps / HBM_GBPS:5.1%} |")
    except Exception as e:
        print(f"| backward dual | skipped: {type(e).__name__} {str(e)[:80]} |")

    # gram: reads both planes once, writes 128x128
    def gram_fn(a, b):
        G = pl.gram_axis(a, b, 0, n)
        # keep the chain type-stable: fold G into a no-op on the planes
        return a + 0 * jnp.real(G[0, 0]).astype(a.dtype), b

    bench_op("gram (one read)", gram_fn, (xr, xi), reps, 2 * plane_bytes)

    print(f"\n(dot mode: {dm}; one 'pass' = read+write both planes = "
          f"{rw_pair / 1e9:.2f} GB except gram = read-only)")


if __name__ == "__main__":
    main()
