"""a_blk sweep for block_backward_dual at the 29q plane shape (slice).

The round-5 trace puts block_backward_dual at 88.1 ms/call = 86% of its
exact-f32 MXU roofline (75.3 ms) — the worst efficiency of the five
production kernels. Per-grid-step work: lane ops run on the full
(a_blk*128, 128) tile but sublane ops are per-a-slice 128^3 dots (MXU
fill-bound). Larger a_blk amortizes grid overhead and widens nothing else;
this sweeps it at a linear A-slice of the 29q shape (A=32768 full).

Usage:  python tools/dual_ablk_sweep.py [A=8192] [reps=20]  (TPU)
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def main(A=8192, reps=20):
    from dqc_tpu.ops.pallas.block_backward import block_backward_dual

    shp = (A, 128, 128)
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    mk = jax.jit(lambda k: jax.random.normal(k, shp, jnp.float32))
    fr, fi, br, bi = (mk(k) for k in ks[:4])
    e0 = jax.jit(lambda k: jax.random.normal(
        k, (128, 128, 4), jnp.float32) / 11.3)(ks[4])
    e1 = jax.jit(lambda k: jax.random.normal(
        k, (128, 128, 4), jnp.float32) / 11.3)(ks[5])
    moved = 8 * fr.size * 4
    print(f"dual bwd a_blk sweep: A={A} (29q full: 32768), reps={reps}; "
          f"{moved / 1e9:.2f} GB/pass")

    for a_blk in (2, 4, 8, 16):
        def fn(c, a_blk=a_blk):
            return block_backward_dual(
                c[0], c[1], c[2], c[3],
                e0[..., 2], e0[..., 3], e0[..., 0], e0[..., 1],
                e1[..., 2], e1[..., 3], e1[..., 0], e1[..., 1],
                a_blk=a_blk)[:4]

        def chained(*c0):
            return jax.lax.fori_loop(0, reps, lambda _, c: tuple(fn(c)) + c[4:],
                                     c0)

        try:
            j = jax.jit(chained)
            out = j(fr, fi, br, bi)
            float(jnp.sum(out[0][0, 0]))
            t0 = time.time()
            out = j(fr, fi, br, bi)
            float(jnp.sum(out[0][0, 0]))
            dt = (time.time() - t0) / reps
            print(f"| a_blk={a_blk:2d} | {dt * 1e3:8.2f} ms/pass | "
                  f"{moved / dt / 1e9:6.1f} GB/s |", flush=True)
        except Exception as e:
            print(f"| a_blk={a_blk:2d} | FAIL {type(e).__name__}: "
                  f"{str(e)[:120]} |", flush=True)


if __name__ == "__main__":
    A = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    main(A, reps)
