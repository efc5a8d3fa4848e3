"""Debug probe: per-bond density parity between the scan/plane path and the
unrolled XLA path for VQEIsing, plus an optimization run that hunts for the
unphysical below-ground-energy minimum seen at 26q x 26L on TPU.

Usage: python tools/debug_vqe_densities.py [n] [L] [iters]
Runs on CPU (interpret-mode kernels) unless DQC_DEBUG_TPU=1.
"""

import os
import sys

if os.environ.get("DQC_DEBUG_TPU", "0") != "1":
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dqc_tpu import config
from dqc_tpu.models.vqe_ising import VQEIsing

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
L = int(sys.argv[2]) if len(sys.argv) > 2 else 26
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 120


def densities_of(model, params):
    """All bond densities through the model's active path; the scan model
    runs with the plane engine FORCED ON, the unrolled reference with it
    FORCED OFF (config is read at trace time; the two models have distinct
    tapes so their traces never share a cache entry)."""
    config.set_plane_engine(bool(model.scan))
    if model.scan:
        from dqc_tpu.circuit.plane_scan import std_scan_with_epilogue
        return std_scan_with_epilogue(
            model._pro_ftape, model._layer_ftape, model._epi_ftape,
            tuple(model._const_gates), model._stacked_gates(params), (),
            dtype=model.dtype)
    return model._autodiff_run(model.params2gates(params), model._const_gates)


def _fetch_densities(model, params):
    """complex64 cannot cross the axon host<->device boundary: fetch real
    and imag planes separately from inside one jitted call."""
    def packed(p):
        ds = densities_of(model, p)
        return [(d.real, d.imag) for d in ds]
    out = jax.jit(packed)(params)
    return [np.asarray(r) + 1j * np.asarray(i) for r, i in out]


def check(tag, m_scan, m_ref, params):
    ds = _fetch_densities(m_scan, params)
    dr = _fetch_densities(m_ref, params)
    print(f"--- {tag}")
    worst = 0.0
    for b, (a, r) in enumerate(zip(ds, dr)):
        diff = np.abs(a - r).max()
        herm = np.abs(a - a.conj().T).max()
        tr = abs(np.trace(a) - 1.0)
        worst = max(worst, diff)
        flag = "  <-- BAD" if (diff > 1e-3 or herm > 1e-3 or tr > 1e-3) else ""
        if diff > 1e-4 or herm > 1e-4 or tr > 1e-4 or b < 2:
            print(f"bond {b:2d}: |scan-ref| {diff:.3e}  herm {herm:.3e}  "
                  f"tr-1 {tr:.3e}{flag}")
    e_s = float(sum(np.einsum("ij,ji->", d, np.asarray(m_scan.h)) for d in ds).real)
    e_r = float(sum(np.einsum("ij,ji->", d, np.asarray(m_scan.h)) for d in dr).real)
    print(f"E scan={e_s:.6f} ref={e_r:.6f} diff={abs(e_s-e_r):.3e} "
          f"worst-bond {worst:.3e}")
    return worst


def main():
    print(f"backend={jax.default_backend()} n={N} L={L}")
    m_scan = VQEIsing(N, L, scan=True)
    m_ref = VQEIsing(N, L, scan=False)
    key = jax.random.PRNGKey(0)
    params = m_scan.init_params(key)

    check("random init", m_scan, m_ref, params)

    # hunt: optimize THROUGH the scan path and watch for E < exact ground
    exact = m_scan.exact_ground_energy()
    print(f"exact ground: {exact:.6f}; per-bond decoupled floor: "
          f"{-np.sqrt(2)*N:.6f}")
    solver = optax.lbfgs()
    opt_state = solver.init(params)
    config.set_plane_engine(True)  # the hunt drives the PLANE engine

    @jax.jit
    def step(params, opt_state):
        value, grad = jax.value_and_grad(m_scan.energy)(params)
        updates, opt_state = solver.update(
            grad, opt_state, params, value=value, grad=grad,
            value_fn=m_scan.energy)
        params = optax.apply_updates(params, updates)
        return params, opt_state, value

    below = None
    for it in range(ITERS):
        params, opt_state, value = step(params, opt_state)
        v = float(value)
        if it % 10 == 0 or v < exact - 1e-3:
            print(f"iter {it:4d}  E = {v:.6f}")
        if v < exact - 1e-2 and below is None:
            below = it
            print(f"*** UNPHYSICAL: E={v:.6f} < exact {exact:.6f} at iter {it}")
            np.save(f"/tmp/broken_params_n{N}_L{L}.npy", np.asarray(params))
            print(f"params saved to /tmp/broken_params_n{N}_L{L}.npy")
            break
    print("final check at optimized params:")
    check("optimized", m_scan, m_ref, params)
    if below is None:
        print("no unphysical minimum found (scan path bounded by exact ground)")


if __name__ == "__main__":
    main()
