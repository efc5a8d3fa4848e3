"""A/B: pair-gram dot mode (f32 HIGHEST vs bf16x3) in the backward kernels.

The round-5 trace has the three backward kernels at 86-96% of their
exact-f32 MXU rooflines; the pair-gram contractions (T0 = bwd^T fwd_in)
are 3 of each kernel's 9 (dual: 6 of 18) six-pass dot sites, and — unlike
the uncompute and transport, whose rounding compounds into every earlier
layer — each gram is a per-gate LEAF output. config.set_gram_kernel_dot_mode
("bf16x3") runs ONLY those dots in the 3-pass hi/lo-split mode (~2x a true
f32 dot's error, dots.py), cutting the backward MXU pass count by 1/6
(dual: 1/6, high/fact: 1/6 of the six-pass sites -> 9/54 passes).

This harness times the three production backward kernels at 29q-slice
shapes with gram mode f32 vs bf16x3 (all other dots exact-f32 HIGHEST).

Usage:  python tools/gram_ab.py [reps=20]  (TPU)
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

COPY_GBPS = 490.0


def _time(j, carry, reps):
    out = j(*carry)
    float(jnp.sum(out[0].reshape(-1)[:4]))
    t0 = time.time()
    out = j(*carry)
    float(jnp.sum(out[0].reshape(-1)[:4]))
    return (time.time() - t0) / reps


def main(reps=20):
    from dqc_tpu.ops.pallas.block_backward import (
        block_backward_dual, block_backward_high, block_backward_merged_fact)

    key = jax.random.PRNGKey(0)

    # --- dual (lane+sublane pair), A=8192 slice of the 29q 32768 ---
    ks = jax.random.split(key, 6)
    shp = (8192, 128, 128)
    mk = jax.jit(lambda k: jax.random.normal(k, shp, jnp.float32))
    d_planes = tuple(mk(k) for k in ks[:4])
    e0 = jax.jit(lambda k: jax.random.normal(
        k, (128, 128, 4), jnp.float32) / 11.3)(ks[4])
    e1 = jax.jit(lambda k: jax.random.normal(
        k, (128, 128, 4), jnp.float32) / 11.3)(ks[5])
    d_moved = 8 * d_planes[0].size * 4

    def dual_fn(c, gram):
        return block_backward_dual(
            c[0], c[1], c[2], c[3],
            e0[..., 2], e0[..., 3], e0[..., 0], e0[..., 1],
            e1[..., 2], e1[..., 3], e1[..., 0], e1[..., 1],
            gram_dot_mode=gram)[:4]

    # --- high X=128, (1, 128, 4096, 128) slice (1/8 of 29q) ---
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    hshp = (1, 128, 4096, 128)
    mkh = jax.jit(lambda k: jax.random.normal(k, hshp, jnp.float32))
    h_planes = tuple(mkh(k) for k in ks[:4])
    eh = jax.jit(lambda k: jax.random.normal(
        k, (128, 128, 4), jnp.float32) / 11.3)(ks[4])
    h_moved = 8 * h_planes[0].size * 4

    def high_fn(c, gram):
        return block_backward_high(
            c[0], c[1], c[2], c[3],
            eh[..., 2], eh[..., 3], eh[..., 0], eh[..., 1],
            gram_dot_mode=gram)[:4]

    # --- merged fact Xt=2 (the 29q hpair), (1, 256, 4096, 128) = 1/4 ---
    ks = jax.random.split(jax.random.PRNGKey(2), 6)
    fshp = (1, 256, 4096, 128)
    mkf = jax.jit(lambda k: jax.random.normal(k, fshp, jnp.float32))
    f_planes = tuple(mkf(k) for k in ks[:4])
    el = jax.jit(lambda k: jax.random.normal(
        k, (128, 128, 4), jnp.float32) / 11.3)(ks[4])
    et = jax.jit(lambda k: jax.random.normal(
        k, (2, 2, 4), jnp.float32) / 1.41)(ks[5])
    f_moved = 8 * f_planes[0].size * 4

    def fact_fn(c, gram):
        return block_backward_merged_fact(
            c[0], c[1], c[2], c[3],
            el[..., 2], el[..., 3], el[..., 0], el[..., 1],
            et[..., 2], et[..., 3], et[..., 0], et[..., 1],
            x_top=2, gram_dot_mode=gram)[:4]

    cases = [("dual bwd (A=8192)", d_planes, d_moved, dual_fn),
             ("high bwd X=128 (1/8)", h_planes, h_moved, high_fn),
             ("fact bwd Xt=2 (1/4)", f_planes, f_moved, fact_fn)]

    print(f"gram dot A/B, reps={reps} (all other dots f32 HIGHEST)")
    print("\n| kernel | gram dot | time/pass | GB/s | of copy-ceiling |")
    print("|---|---|---|---|---|")
    for name, planes, moved, fn in cases:
        for gram in ("f32", "bf16x3"):
            def chained(*c0, fn=fn, gram=gram):
                return jax.lax.fori_loop(
                    0, reps, lambda _, c: tuple(fn(c, gram)), c0)

            try:
                j = jax.jit(chained)
                dt = _time(j, planes, reps)
                gbps = moved / dt / 1e9
                print(f"| {name} | {gram} | {dt * 1e3:8.2f} ms | {gbps:6.1f} "
                      f"| {gbps / COPY_GBPS:5.1%} |", flush=True)
            except Exception as e:
                print(f"| {name} | {gram} | FAIL {type(e).__name__}: "
                      f"{str(e)[:100]} |", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
