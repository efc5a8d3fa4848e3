"""A/B: Kronecker-factorized vs expanded merged-top (hpair) kernels.

The 29q/30q flagship step's slowest kernel is the merged-top backward
(X = Xt*Xl = 256/512): three X-wide MXU contractions per element on an
operator that is ALWAYS ``kron(Et, El)``. The factorized kernels
(ops/pallas/high_apply.merged_fact_apply_planes,
block_backward.block_backward_merged_fact) run the low factor as Xl-wide
contractions and the tiny top factor on the VPU — ~Xt x less MXU work.
This harness times both at a representative M slice (independent grid
cells: per-pass time extrapolates linearly to the full column).

SIZE WARNING (backward): 8 live planes = 8 * Xt * 128 * 2^M_log2 * 128 * 4 B;
at Xt=4, M_log2=12 that is 8.6 GB — near the 15.75 GB chip ceiling.

Usage:  python tools/hpair_fact_bench.py [Xt=4] [M_log2=12] [reps=20]  (TPU)
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

HBM_GBPS = 819.0
COPY_GBPS = 490.0  # measured streaming ceiling (tools/dual_floor.py)


def _mk(Xt, M):
    Xl = 128
    shp = (1, Xt * Xl, M, 128)
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    mk = jax.jit(lambda k: jax.random.normal(k, shp, jnp.float32))
    fr, fi, br, bi = (mk(k) for k in ks[:4])
    el = jax.jit(lambda k: jax.random.normal(
        k, (Xl, Xl, 4), jnp.float32) / 11.3)(ks[4])
    et = jax.jit(lambda k: jax.random.normal(
        k, (Xt, Xt, 4), jnp.float32) / (Xt ** 0.5))(ks[5])
    kr = jax.jit(lambda a, b: jnp.kron(a, b))
    em_r = kr(et[..., 0], el[..., 0]) - kr(et[..., 1], el[..., 1])
    em_i = kr(et[..., 0], el[..., 1]) + kr(et[..., 1], el[..., 0])
    # "inverse" operands need not be true inverses for timing
    return (fr, fi, br, bi,
            el[..., 0], el[..., 1], el[..., 2], el[..., 3],
            et[..., 0], et[..., 1], et[..., 2], et[..., 3],
            em_r, em_i, em_r * 0.5, em_i * 0.5)


def _time(j, carry, reps):
    out = j(*carry)
    float(jnp.sum(out[0][0, 0, 0]))
    t0 = time.time()
    out = j(*carry)
    float(jnp.sum(out[0][0, 0, 0]))
    return (time.time() - t0) / reps


def main(Xt=4, m_log2=12, reps=20):
    from dqc_tpu.ops.pallas.block_backward import (
        block_backward_high, block_backward_merged_fact)
    from dqc_tpu.ops.pallas.high_apply import (
        high_group_apply_planes, merged_fact_apply_planes)

    M = 1 << m_log2
    a = _mk(Xt, M)
    fr, fi, br, bi = a[:4]
    elr, eli, elr2, eli2 = a[4:8]
    etr, eti, etr2, eti2 = a[8:12]
    emr, emi, emr2, emi2 = a[12:16]
    fwd_moved = 4 * fr.size * 4
    bwd_moved = 8 * fr.size * 4
    print(f"hpair A/B: Xt={Xt}, Xl=128, M=2^{m_log2}, reps={reps}; "
          f"fwd {fwd_moved / 1e9:.2f} GB/pass, bwd {bwd_moved / 1e9:.2f}")
    print("\n| kernel | dot | time/pass | GB/s | of copy-ceiling |")
    print("|---|---|---|---|---|")

    for dot in ("f32", "bf16x3"):
        cases = [
            ("fwd merged", fwd_moved, 2,
             lambda c, d=dot: high_group_apply_planes(
                 c[0], c[1], emr, emi, dot_mode=d)),
            ("fwd fact", fwd_moved, 2,
             lambda c, d=dot: merged_fact_apply_planes(
                 c[0], c[1], elr, eli, etr, eti, x_top=Xt, dot_mode=d)),
            ("bwd merged", bwd_moved, 4,
             lambda c, d=dot: block_backward_high(
                 c[0], c[1], c[2], c[3], emr2, emi2, emr, emi,
                 dot_mode=d)[:4]),
            ("bwd fact", bwd_moved, 4,
             lambda c, d=dot: block_backward_merged_fact(
                 c[0], c[1], c[2], c[3], elr2, eli2, elr, eli,
                 etr2, eti2, etr, eti, x_top=Xt, dot_mode=d)[:4]),
        ]
        for name, moved, nc, fn in cases:
            def chained(*c0, fn=fn, nc=nc):
                return jax.lax.fori_loop(
                    0, reps, lambda _, c: tuple(fn(c)) + c[nc:], c0)

            try:
                j = jax.jit(chained)
                dt = _time(j, (fr, fi, br, bi), reps)
                gbps = moved / dt / 1e9
                print(f"| {name} | {dot} | {dt * 1e3:8.2f} ms | {gbps:6.1f} "
                      f"| {gbps / COPY_GBPS:5.1%} |", flush=True)
            except Exception as e:
                print(f"| {name} | {dot} | FAIL {type(e).__name__}: "
                      f"{str(e)[:100]} |", flush=True)


if __name__ == "__main__":
    Xt = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    m_log2 = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    main(Xt, m_log2, reps)
