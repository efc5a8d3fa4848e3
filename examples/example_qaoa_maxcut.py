"""QAOA MaxCut on a random 3-regular-ish graph, end-to-end on TPU/CPU.

Usage: python examples/example_qaoa_maxcut.py [--qubits 16] [--layers 6]
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import numpy as np
import optax

from dqc_tpu.models.qaoa import QAOAMaxCut


def random_graph(n, extra_edges, seed):
    rng = np.random.default_rng(seed)
    edges = [(i, (i + 1) % n) for i in range(n)]  # ring backbone
    while len(edges) < n + extra_edges:
        a, b = rng.integers(0, n, 2)
        if a != b and (min(a, b), max(a, b)) not in [tuple(sorted(e)) for e in edges]:
            edges.append((int(min(a, b)), int(max(a, b))))
    return edges


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qubits", type=int, default=14)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    edges = random_graph(args.qubits, args.qubits // 2, args.seed)
    model = QAOAMaxCut(args.qubits, edges, layers_number=args.layers)
    params = model.init_params(jax.random.PRNGKey(args.seed))

    solver = optax.adam(0.05)
    opt_state = solver.init(params)

    @jax.jit
    def step(params, opt_state):
        value, grad = jax.value_and_grad(model.loss)(params)
        updates, opt_state = solver.update(grad, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, value

    for it in range(args.iters):
        params, opt_state, value = step(params, opt_state)
        if it % 25 == 0:
            print(f"iter {it:4d}  expected cut = {-float(value):.4f}")

    cut = float(model.expected_cut(params))
    print(f"Final expected cut: {cut:.4f} over {len(edges)} edges")
    if args.qubits <= 18:
        best = model.exact_maxcut()
        print(f"Exact MaxCut: {best}  (approx ratio {cut / best:.3f})")


if __name__ == "__main__":
    main()
