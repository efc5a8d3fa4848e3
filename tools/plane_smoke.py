"""Real-TPU smoke + A/B of the plane-layout Pallas engine vs the XLA path.

Runs the 26q hardware-efficient CZ workload (the round-1 perf reference:
479 ms/step at 26q x 208 gates on v5e) with the plane engine on and off,
checks gradient parity, and prints timings. ONE TPU job at a time.

Usage: python tools/plane_smoke.py [qubits] [layers]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from dqc_tpu import config
from dqc_tpu.models.hardware_efficient import HardwareEfficientAnsatz

N = int(sys.argv[1]) if len(sys.argv) > 1 else 26
L = int(sys.argv[2]) if len(sys.argv) > 2 else 4
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def fetch(v, g):
    s = float(v)
    s += float(jnp.sum(jnp.abs(jax.tree_util.tree_leaves(g)[0])))
    return s


def run(mode):
    config.set_plane_engine(mode)
    m = HardwareEfficientAnsatz(N, L, entangler="cz", scan=True)
    params = m.init_params(jax.random.PRNGKey(0))
    step = jax.jit(lambda p: jax.value_and_grad(m.magnetization)(p))
    t0 = time.time()
    v, g = step(params)
    fetch(v, g)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(REPS):
        v, g = step(params)
    fetch(v, g)
    dt = (time.time() - t0) / REPS
    print(f"mode={mode}: compile {compile_s:.1f}s, step {dt*1000:.1f} ms, "
          f"E={float(v):.6f}", flush=True)
    return float(v), np.asarray(g), dt


def main():
    print(f"backend={jax.default_backend()} n={N} L={L}", flush=True)
    try:
        v1, g1, t1 = run(True)
    except Exception as e:
        with open("/tmp/plane_smoke_err.txt", "w") as f:
            f.write(str(e))
        print(f"PLANE ENGINE FAILED: {type(e).__name__}: {str(e)[:400]}")
        raise
    v0, g0, t0 = run(False)
    rel = np.linalg.norm(g1 - g0) / (np.linalg.norm(g0) + 1e-12)
    print(f"value diff {abs(v1-v0):.3e}; grad rel err {rel:.3e}; "
          f"speedup x{t0/t1:.2f}", flush=True)
    # post precision-fix bar: measured 2.5e-5 at 26q x 26L, 7.8e-5 at 8L
    assert rel < 3e-4, "plane-engine gradients diverge from XLA path"


if __name__ == "__main__":
    main()
