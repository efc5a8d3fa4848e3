"""Gradient error of the bf16x3 pair-gram mode vs a complex128 oracle.

Companion to tools/gram_ab.py: the pair-gram contractions are per-gate
LEAF outputs (no compounding through the recursion), so running ONLY them
in the 3-pass bf16x3 mode (dots.py: error ~2x a true f32 dot) should sit
at the f32 engine's own roundoff floor. This pins that claim at the
shipping depth-100 structure (hardware-efficient cz, single-call and
segmented) before the mode is allowed anywhere near the default config.

Usage:  python tools/gram_accuracy.py [n=18] [L=100] [chunk=25]  (CPU)
"""

import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=1").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dqc_tpu import config  # noqa: E402
from dqc_tpu.models.hardware_efficient import HardwareEfficientAnsatz  # noqa: E402


def flat(g):
    return np.asarray(jax.tree_util.tree_leaves(g)[0], dtype=np.float64).ravel()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 25

    key = jax.random.PRNGKey(7)

    t0 = time.time()
    m64 = HardwareEfficientAnsatz(n, L, entangler="cz",
                                  dtype=jnp.complex128, scan=False)
    params = np.asarray(m64.init_params(key), dtype=np.float64)
    v0, g0 = jax.value_and_grad(m64.magnetization)(jnp.asarray(params))
    v0 = float(v0)
    f0 = flat(g0)
    scale = np.abs(f0).max()
    print(f"# oracle c128 done in {time.time() - t0:.0f}s  "
          f"(n={n}, L={L}, chunk={chunk})", flush=True)

    m32 = HardwareEfficientAnsatz(n, L, entangler="cz",
                                  dtype=jnp.complex64, scan=True)
    p32 = jnp.asarray(params, dtype=jnp.float32)

    print("| dot modes | execution | value rel err | grad max rel | grad rms rel |")
    print("|---|---|---|---|---|")
    from dqc_tpu.circuit import segmented

    # rows: exact 6-pass grams; the DEFAULT (bf16x3 grams only); the next
    # speed tier (cotangent transport AND grams bf16x3, uncompute exact)
    rows = (("gram=f32", "f32", "auto"),
            ("gram=bf16x3 (default)", "bf16x3", "auto"),
            ("transport+gram=bf16x3", "auto", "bf16x3"))
    for label0, gram, bwd in rows:
        for seg in (False, True):
            config.set_plane_engine(True)
            config.set_gram_kernel_dot_mode(gram)
            config.set_bwd_kernel_dot_mode(bwd)
            segmented.segmented_cache_clear()
            try:
                t0 = time.time()
                if seg:
                    v, g = m32.magnetization_value_and_grad_segmented(
                        p32, max_chunk=chunk)
                else:
                    v, g = jax.value_and_grad(m32.magnetization)(p32)
                f = flat(g)
                verr = abs(float(v) - v0) / abs(v0)
                gmax = np.abs(f - f0).max() / scale
                grms = np.sqrt(np.mean(np.abs(f - f0) ** 2)) / scale
                label = f"segmented({chunk})" if seg else "single-call"
                print(f"| {label0} | {label} | {verr:.2e} | {gmax:.2e} "
                      f"| {grms:.2e} |  # {time.time() - t0:.0f}s", flush=True)
            finally:
                config.set_plane_engine("auto")
                config.set_gram_kernel_dot_mode("auto")
                config.set_bwd_kernel_dot_mode("auto")


if __name__ == "__main__":
    main()
