"""Mixed-storage gradient error at the SHIPPING 30q structure (VERDICT r4 #6).

The 30q bench line runs depth-100, mixed state storage, segmented in
25-layer host-driven chunks (bench.py _run_30q). The accuracy table in
BENCHMARKS.md pinned mixed-storage error on SINGLE-CALL shallow runs; this
tool pins it at the exact shipping *structure* — depth 100, segmented
chunk 25, the bench.py hardware-efficient cz workload — at a qubit count
where a complex128 oracle is feasible on CPU. Storage error is a per-pass
rounding effect, flat in qubit count (BENCHMARKS.md round-4 f32 study), so
the depth/segmentation structure, not n, is what the number rides on.

Rows: plane-f32 and plane-mixed, each single-call and segmented(chunk) vs
the same-tape complex128 XLA-engine oracle.

Usage:  python tools/mixed_seg_accuracy.py [n=18] [L=100] [chunk=25]  (CPU)
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

    # complex128 oracle on the SAME params: XLA engine, no planes
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

    print("| storage | execution | value rel err | grad max rel | grad rms rel |")
    print("|---|---|---|---|---|")
    from dqc_tpu.circuit import segmented

    for storage in ("f32", "mixed", "f16"):
        for seg in (False, True):
            config.set_plane_engine(True)
            config.set_state_storage(storage)
            # the segmented driver caches jitted pieces per tape WITHOUT the
            # storage mode in the key — flipping config requires a clear or
            # the second storage mode silently reuses the first's programs
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
                print(f"| {storage} | {label} | {verr:.2e} | {gmax:.2e} "
                      f"| {grms:.2e} |  # {time.time() - t0:.0f}s", flush=True)
            finally:
                config.set_plane_engine("auto")
                config.set_state_storage("f32")


if __name__ == "__main__":
    main()
