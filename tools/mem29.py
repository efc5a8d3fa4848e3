"""29-qubit single-chip feasibility probe (BASELINE asks for 30q; one v5e
has 15.75 GB — 2^29 complex64 = 4 GB/state).

Tries, in order: forward-only 29q, fwd+grad 29q; writes the full compile
error (the remote-compile service truncates HTTP 500 bodies) to
/tmp/mem29_err.txt.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from dqc_tpu.models.hardware_efficient import HardwareEfficientAnsatz


def fetch(x):
    return float(jnp.real(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def attempt(name, fn):
    try:
        t0 = time.time()
        out = fn()
        s = fetch(out)
        print(f"{name}: OK ({time.time()-t0:.1f}s, fetch={s:.4f})", flush=True)
        return True
    except Exception as e:
        with open("/tmp/mem29_err.txt", "a") as f:
            f.write(f"==== {name} ====\n{e}\n\n")
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
        return False


def main():
    n, L = 29, int(sys.argv[1]) if len(sys.argv) > 1 else 4
    m = HardwareEfficientAnsatz(n, L, entangler="cz", scan=True)
    params = m.init_params(jax.random.PRNGKey(0))

    fwd = jax.jit(m.magnetization)
    attempt("29q forward", lambda: fwd(params))

    step = jax.jit(jax.value_and_grad(m.magnetization))
    attempt("29q fwd+grad", lambda: step(params))


if __name__ == "__main__":
    main()
