"""Distributed VQE-Ising over a JAX device mesh (multi-chip or virtual).

The statevector's amplitude axis shards over a 1-D `jax.sharding.Mesh`
(top-k qubits = device bits); gates on device-bit qubits are relabeled
local by qubit-permutation `all_to_all`s placed by a static Belady planner,
observables finish with one `psum` per qubit group, and the whole
O(1)-memory adjoint runs inside one `shard_map` region
(dqc_tpu/parallel/). On a TPU pod slice the exchanges ride ICI; on a
laptop you can dry-run the SAME program on a virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python examples/example_distributed_vqe.py

Usage: python examples/example_distributed_vqe.py [--qubits 18]
       [--layers 4] [--iters 150] [--devices N]

(--devices defaults to every visible device; must be a power of two.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import numpy as np
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qubits", type=int, default=18)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--devices", type=int, default=0)
    args = ap.parse_args()

    from dqc_tpu.models.vqe_ising import VQEIsing
    from dqc_tpu.parallel import make_mesh

    n_dev = args.devices or len(jax.devices())
    if n_dev & (n_dev - 1):
        raise SystemExit(f"--devices must be a power of two, got {n_dev}")

    mesh = make_mesh(n_dev)
    model = VQEIsing(qubits_number=args.qubits, layers_number=args.layers,
                     scan=True)
    energy = model.build_distributed_energy(mesh, scan=True)
    params = model.init_params(jax.random.PRNGKey(0))

    solver = optax.adam(0.05)
    opt_state = solver.init(params)

    @jax.jit
    def step(params, opt_state):
        value, grad = jax.value_and_grad(energy)(params)
        updates, opt_state = solver.update(grad, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, value

    exact = model.exact_ground_energy()
    print(f"{args.qubits} qubits x {args.layers} layers over {n_dev} "
          f"devices ({jax.default_backend()}); exact E0 = {exact:.6f}")
    t0 = time.time()
    params, opt_state, value = step(params, opt_state)
    print(f"compile+first step: {time.time() - t0:.1f} s")
    t0 = time.time()
    for it in range(args.iters):
        params, opt_state, value = step(params, opt_state)
        if (it + 1) % 10 == 0:
            print(f"iter {it + 1}: E = {float(value):.6f}")
    dt = (time.time() - t0) / max(args.iters, 1)
    rel = abs(float(value) - exact) / abs(exact)
    print(f"final E = {float(value):.6f}  (rel err {rel:.2e}, "
          f"{dt * 1000:.0f} ms/step)")


if __name__ == "__main__":
    main()
