"""QAOA and GHZ model-family tests."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from dqc_tpu.models.qaoa import QAOAMaxCut
from dqc_tpu.models.ghz import GHZ


def ring_edges(n):
    return [(i, i + 1) for i in range(n - 1)] + [(n - 1, 0)]


def test_ghz_fidelity_and_densities():
    m = GHZ(10, dtype=jnp.complex128)
    assert abs(m.fidelity() - 1.0) < 1e-10
    for d in m.densities():
        np.testing.assert_allclose(d, np.eye(2) / 2, atol=1e-10)


def test_qaoa_scan_matches_unrolled():
    n = 6
    q_scan = QAOAMaxCut(n, ring_edges(n), layers_number=3, dtype=jnp.complex128, scan=True)
    q_flat = QAOAMaxCut(n, ring_edges(n), layers_number=3, dtype=jnp.complex128, scan=False)
    p = q_scan.init_params(jax.random.PRNGKey(0))
    v1, g1 = jax.value_and_grad(q_scan.loss)(p)
    v2, g2 = jax.value_and_grad(q_flat.loss)(p)
    np.testing.assert_allclose(v1, v2, rtol=1e-10)
    np.testing.assert_allclose(g1, g2, rtol=1e-8, atol=1e-12)


def test_qaoa_optimizes_toward_maxcut():
    n = 6
    edges = ring_edges(n)
    model = QAOAMaxCut(n, edges, layers_number=4, dtype=jnp.complex128)
    params = model.init_params(jax.random.PRNGKey(3))
    solver = optax.adam(0.1)
    opt_state = solver.init(params)

    @jax.jit
    def step(params, opt_state):
        value, grad = jax.value_and_grad(model.loss)(params)
        updates, opt_state = solver.update(grad, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, value

    for _ in range(60):
        params, opt_state, _ = step(params, opt_state)
    cut = float(model.expected_cut(params))
    best = model.exact_maxcut()
    assert cut > 0.7 * best, f"QAOA cut {cut} too far from optimum {best}"


def test_qaoa_weighted():
    n = 5
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 4), (1, 3)]
    weights = [1.0, 2.0, 0.5, 1.5, 1.0, 0.8]
    model = QAOAMaxCut(n, edges, weights, layers_number=2, dtype=jnp.complex128)
    p = model.init_params(jax.random.PRNGKey(1))
    v, g = jax.jit(jax.value_and_grad(model.loss))(p)
    assert np.isfinite(v)
    assert np.all(np.isfinite(np.asarray(g)))
    assert model.exact_maxcut() > 0


def test_qft_matches_closed_form():
    from dqc_tpu.models.qft import QFT
    m = QFT(9, dtype=jnp.complex128)
    for x in (0, 1, 137, 2**9 - 1):
        got = np.asarray(m.apply_to_basis_state(x))
        want = m.exact(x)
        np.testing.assert_allclose(got, want, atol=1e-10)
