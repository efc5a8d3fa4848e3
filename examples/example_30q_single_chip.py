"""30-qubit variational training on ONE 16 GB TPU chip.

The O(1)-memory adjoint keeps two full statevectors live; at 30 qubits
exact f32 needs 2 x 8 GB > 15.75 GB HBM — the same two-statevector floor
that caps the reference at 29 qubits on a 16 GB part (reference
README.md:17, circuit.rs:266-429). The opt-in ``mixed`` state-storage mode
(config.set_state_storage) stores the forward planes f32 — the loss value
stays bit-exact — and the cotangent planes bf16, so the adjoint fits in
8 + 4 GB and gradients carry ~bf16 rounding (measured error tables in
BENCHMARKS.md; fine for variational optimization).

Usage: python examples/example_30q_single_chip.py [--qubits 30]
       [--layers 8] [--iters 3]

Defaults are sized for a quick demonstration (~1 min/step at 30q after
the one-off compile; use --qubits 20 for a laptop-CPU dry run). Note the
first 30q compile takes several minutes through a remote-compile tunnel;
set DQC_COMPILE_CACHE for a persistent cache.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import optax

from dqc_tpu import config
from dqc_tpu.models.hardware_efficient import HardwareEfficientAnsatz


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qubits", type=int, default=30)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    # mixed storage: value exact-f32, cotangents bf16 -> 30q fits one chip
    config.set_state_storage("mixed")

    model = HardwareEfficientAnsatz(args.qubits, args.layers,
                                    entangler="cz", scan=True)
    params = model.init_params(jax.random.PRNGKey(0))

    solver = optax.adam(0.05)
    opt_state = solver.init(params)

    @jax.jit
    def step(params, opt_state):
        value, grad = jax.value_and_grad(model.magnetization)(params)
        updates, opt_state = solver.update(grad, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, value

    print(f"{args.qubits} qubits x {args.layers} layers "
          f"({model.num_gates} gates), mixed storage, "
          f"backend={jax.default_backend()}")
    t0 = time.time()
    params, opt_state, value = step(params, opt_state)
    print(f"compile+first step: {time.time() - t0:.1f} s, "
          f"loss={float(value):.6f}")  # host fetch = true sync
    for it in range(args.iters):
        t0 = time.time()
        params, opt_state, value = step(params, opt_state)
        v = float(value)  # host fetch = true sync on axon
        print(f"iter {it}: loss={v:.6f}  ({time.time() - t0:.2f} s/step)")


if __name__ == "__main__":
    main()
