"""VQE for the transverse-field Ising model — the reference's headline example
(reference example_vqse_ising.py) on the TPU-native framework.

Differences from the reference:
* the entire loss (params -> gates -> circuit -> densities -> energy) is ONE
  jitted differentiable function — the reference must keep the circuit
  outside jit (reference README.md:15);
* runs on TPU/CPU/GPU, any dtype, no rebuild per precision;
* optimizer: L-BFGS via optax (scipy-free device-resident loop) with the
  same convergence target: exact ground energy -2/sin(pi/2n) at the
  phase-transition point (reference example_vqse_ising.py:127).

Usage:  python examples/example_vqse_ising.py [--qubits 26] [--layers 26]
        [--iters 300] [--dtype complex64]
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dqc_tpu.models.vqe_ising import VQEIsing


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qubits", type=int, default=26)
    ap.add_argument("--layers", type=int, default=26)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--dtype", default="complex64")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    model = VQEIsing(
        qubits_number=args.qubits,
        layers_number=args.layers,
        magnetic_field=1.0,  # the phase-transition point
        dtype=jnp.dtype(args.dtype),
    )

    key = jax.random.PRNGKey(args.seed)
    params = model.init_params(key)

    loss_and_grad = jax.jit(jax.value_and_grad(model.energy))

    solver = optax.lbfgs()
    opt_state = solver.init(params)

    @jax.jit
    def step(params, opt_state):
        value, grad = jax.value_and_grad(model.energy)(params)
        updates, opt_state = solver.update(
            grad, opt_state, params, value=value, grad=grad,
            value_fn=model.energy,
        )
        params = optax.apply_updates(params, updates)
        return params, opt_state, value

    # warm-up compile
    t0 = time.time()
    value, _ = loss_and_grad(params)
    value.block_until_ready()
    print(f"compile+first call: {time.time() - t0:.1f}s, E0={float(value):.4f}")

    t0 = time.time()
    nevals = 0
    for it in range(args.iters):
        params, opt_state, value = step(params, opt_state)
        nevals += 1
        if it % 20 == 0:
            print(f"iter {it:4d}  E = {float(value):.6f}")
    jax.block_until_ready(params)
    elapsed = time.time() - t0

    # jitted: eager complex ops fail on backends that cannot execute
    # complex64 outside a compiled program (axon host-boundary restriction)
    e = float(loss_and_grad(params)[0])
    exact = model.exact_ground_energy()
    print(f"Exact energy: {exact}")
    print(f"Found energy: {e}")
    print(f"Relative error: {abs(e - exact) / abs(exact)}")
    print(f"Time per optimization step: {elapsed / max(nevals,1):.4f}s")


if __name__ == "__main__":
    main()
