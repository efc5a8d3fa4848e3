"""Model-family tests: VQE-Ising convergence (the reference's end-to-end
example contract, example_vqse_ising.py:127-131) and the hardware-efficient
ansatz loss/grad path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from dqc_tpu.models.vqe_ising import VQEIsing
from dqc_tpu.models.hardware_efficient import HardwareEfficientAnsatz
from dqc_tpu.parallel import make_mesh


@pytest.mark.slow
def test_vqe_ising_converges():
    model = VQEIsing(qubits_number=6, layers_number=6, dtype=jnp.complex128)
    params = model.init_params(jax.random.PRNGKey(42))
    solver = optax.lbfgs()
    opt_state = solver.init(params)

    @jax.jit
    def step(params, opt_state):
        value, grad = jax.value_and_grad(model.energy)(params)
        updates, opt_state = solver.update(
            grad, opt_state, params, value=value, grad=grad, value_fn=model.energy
        )
        return optax.apply_updates(params, updates), opt_state, value

    for _ in range(100):
        params, opt_state, value = step(params, opt_state)
    e = float(model.energy(params))
    exact = model.exact_ground_energy()
    rel = abs(e - exact) / abs(exact)
    assert rel < 1e-4, f"VQE failed to converge: E={e}, exact={exact}, rel={rel}"


@pytest.mark.slow
def test_vqe_distributed_matches_single():
    mesh = make_mesh(8)
    model = VQEIsing(qubits_number=8, layers_number=2, dtype=jnp.complex128, scan=False)
    params = model.init_params(jax.random.PRNGKey(1))
    e_dist = model.build_distributed_energy(mesh)

    v1, g1 = jax.value_and_grad(model.energy)(params)
    v2, g2 = jax.value_and_grad(e_dist)(params)
    np.testing.assert_allclose(v2, v1, rtol=1e-10)
    np.testing.assert_allclose(g2, g1, rtol=1e-8, atol=1e-11)


def test_hardware_efficient_grad():
    model = HardwareEfficientAnsatz(6, 3, entangler="cz", dtype=jnp.complex128)
    params = model.init_params(jax.random.PRNGKey(0))
    v, g = jax.jit(jax.value_and_grad(model.magnetization))(params)
    assert np.isfinite(v)
    assert g.shape == params.shape
    assert np.all(np.isfinite(np.asarray(g)))
    # gradient should be nontrivial
    assert np.linalg.norm(np.asarray(g)) > 1e-6

    # unitarity of params2gates
    gates = model.params2gates(params)
    for gt in gates[:4]:
        m = np.asarray(gt).reshape(2, 2)
        np.testing.assert_allclose(m @ m.conj().T, np.eye(2), atol=1e-12)


def test_hardware_efficient_cnot_variant():
    model = HardwareEfficientAnsatz(5, 2, entangler="cnot", dtype=jnp.complex128)
    params = model.init_params(jax.random.PRNGKey(3))
    v = model.magnetization(params)
    assert np.isfinite(v)
    # |<Z_i>| <= 1 each, n qubits
    assert abs(float(v)) <= model.n + 1e-9
