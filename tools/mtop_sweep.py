"""m_blk sweep for the merged-top X=512 backward kernel (STATUS limit 4).

The 30q plane state views its two top groups as one merged contracted
axis (X = 512, planes (1, 512, M, 128)); block_backward_high chunks the
m axis for VMEM but the chunk/block sizes were chosen for fit, not speed.
This sweep times the kernel at a REPRESENTATIVE M slice (the grid is
(A1, M // m_blk) of independent cells, so per-pass bandwidth at a small
M extrapolates linearly to the full 30q column, M = 2^30 / (512 * 128)
= 2^14) across m_blk and dot modes.

SIZE WARNING: per plane bytes = 512 * 2^M_log2 * 128 * 4; M_log2 = 12 is
1.07 GB/plane (8 live planes = 8.6 GB on a 15.75 GB chip — near the
ceiling). Anything above 12 exceeds the chip (13 -> 17.2 GB live without
donation); 14 would BE the full measured 30q column, not a slice of it.
The old default of 17 was wrong (34 GB/plane — minutes of host RNG, then
an OOM).

Usage:  python tools/mtop_sweep.py [M_log2=12] [reps=5]    (TPU)
        python tools/mtop_sweep.py check                    (CPU oracle)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

HBM_GBPS = 819.0


def _args(M, rng, *, on_device: bool = False):
    X = 512
    shp = (1, X, M, 128)
    if on_device:
        # TPU path: host RNG is ~42 s/plane and the 4x1 GB host->device
        # transfer rides a remote tunnel — generate ON the chip instead
        ks = jax.random.split(jax.random.PRNGKey(0), 5)
        mk = jax.jit(lambda k: jax.random.normal(k, shp, jnp.float32))
        fr, fi, br, bi = (mk(k) for k in ks[:4])
        e = jax.jit(lambda k: jax.random.normal(
            k, (X, X, 4), jnp.float32) / 22.6)(ks[4])
        ops = tuple(e[..., i] for i in range(4))
        return (fr, fi, br, bi) + ops
    fr = jnp.asarray(rng.standard_normal(shp).astype(np.float32))
    fi = jnp.asarray(rng.standard_normal(shp).astype(np.float32))
    br = jnp.asarray(rng.standard_normal(shp).astype(np.float32))
    bi = jnp.asarray(rng.standard_normal(shp).astype(np.float32))
    e = rng.standard_normal((X, X, 4)).astype(np.float32) / 22.6
    ops = tuple(jnp.asarray(e[..., i]) for i in range(4))
    return (fr, fi, br, bi) + ops


def sweep(m_log2=12, reps=5):
    from dqc_tpu.ops.pallas.block_backward import block_backward_high

    M = 1 << m_log2
    rng = np.random.default_rng(0)
    args = _args(M, rng, on_device=True)
    moved = 8 * args[0].size * 4  # 4 planes read + 4 written
    print(f"merged-top backward sweep: X=512, M=2^{m_log2}, reps={reps}, "
          f"moved {moved / 1e9:.2f} GB/pass, SoL {HBM_GBPS} GB/s\n")
    print("| m_blk | bwd_dot | time/pass | GB/s | of SoL |")
    print("|---|---|---|---|---|")
    for m_blk in (8, 16, 32, 64):
        for bdot in ("f32", "bf16x3"):
            def one(*c):
                out = block_backward_high(
                    *c[:4], *c[4:], m_blk=m_blk, dot_mode="f32",
                    bwd_dot_mode=bdot)
                return out[:4]

            def chained(*c0):
                return jax.lax.fori_loop(
                    0, reps, lambda _, c: one(*c, *args[4:]), c0)

            try:
                j = jax.jit(chained)
                out = j(*args[:4])
                float(jnp.sum(out[0][0, 0, 0]))
                t0 = time.time()
                out = j(*args[:4])
                float(jnp.sum(out[0][0, 0, 0]))
                dt = (time.time() - t0) / reps
                gbps = moved / dt / 1e9
                print(f"| {m_blk} | {bdot} | {dt * 1e3:8.2f} ms "
                      f"| {gbps:6.1f} | {gbps / HBM_GBPS:5.1%} |",
                      flush=True)
            except Exception as e:  # VMEM/compile: record and continue
                print(f"| {m_blk} | {bdot} | FAIL {type(e).__name__}: "
                      f"{str(e)[:80]} |", flush=True)


def check():
    from dqc_tpu.ops.pallas.block_backward import block_backward_high

    rng = np.random.default_rng(1)
    M = 256
    args = _args(M, rng)
    outs = []
    for m_blk in (8, 32):
        o = block_backward_high(*args[:4], *args[4:], m_blk=m_blk,
                                interpret=True)
        outs.append(tuple(np.asarray(x, np.float64) for x in o))
    for a, b in zip(*outs):
        err = np.abs(a - b).max() / (np.abs(b).max() + 1e-30)
        assert err < 1e-5, err
    print("CHECK OK (m_blk invariant)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "check":
        jax.config.update("jax_platforms", "cpu")
        check()
    else:
        m_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 12
        reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
        sweep(m_log2, reps)
