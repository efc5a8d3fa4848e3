"""Observable/measurement layer: Pauli-sum expectations from density
requests, sampling, fidelity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dqc_tpu import AutoGradCircuit
from dqc_tpu.ops import gates as G
from dqc_tpu.ops import statevector as sv
from dqc_tpu.ops.observables import (
    PauliSum,
    expval_from_density,
    fidelity,
    pauli_matrix,
    sample,
    sample_counts,
)

C128 = jnp.complex128


def test_pauli_matrix_basics():
    np.testing.assert_array_equal(pauli_matrix("Z", C128),
                                  np.diag([1, -1]).astype(np.complex128))
    zz = pauli_matrix("ZZ", C128)
    np.testing.assert_array_equal(np.diag(zz), [1, -1, -1, 1])
    with pytest.raises(KeyError):
        pauli_matrix("Q")


def test_pauli_sum_tfim_matches_exact():
    """<H> of a small TFIM Hamiltonian via PauliSum densities equals the
    dense-matrix expectation."""
    n = 5
    rng = np.random.default_rng(0)
    c = AutoGradCircuit(n, dtype=C128)
    gates = []
    for i in range(n):
        c.add_q1_var_gate(i)
        import oracles
        gates.append(jnp.asarray(oracles.random_unitary(rng, 1).reshape(-1), C128))
    for i in range(n - 1):
        c.add_q2_const_gate(i, i + 1)
    cx = jnp.asarray(G.cnot(C128).reshape(-1))

    h = PauliSum([(-1.0, {i: "Z", i + 1: "Z"}) for i in range(n - 1)]
                 + [(-0.7, {i: "X"}) for i in range(n)])
    h.attach(c)
    _, run = c.build()
    dens = run(gates, [cx] * (n - 1))
    got = float(h.expval(dens))

    # dense oracle
    psi = jnp.asarray(c.initial_state())
    for i, g in enumerate(gates):
        psi = sv.apply_gate(psi, g, (i,))
    for i in range(n - 1):
        psi = sv.apply_gate(psi, cx, (i, i + 1))
    psi_np = np.asarray(psi)
    H = np.zeros((1 << n, 1 << n), dtype=np.complex128)

    def embed(op_str, qubits):
        full = np.eye(1, dtype=np.complex128)
        for q in range(n - 1, -1, -1):
            if q in qubits:
                full = np.kron(full, np.asarray(pauli_matrix(qubits[q], C128)))
            else:
                full = np.kron(full, np.eye(2))
        return full

    for i in range(n - 1):
        H += -1.0 * embed("ZZ", {i + 1: "Z", i: "Z"})
    for i in range(n):
        H += -0.7 * embed("X", {i: "X"})
    want = float(np.real(psi_np.conj() @ H @ psi_np))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_pauli_sum_differentiable():
    n = 4
    c = AutoGradCircuit(n, dtype=C128)
    for i in range(n):
        c.add_q1_var_gate(i)
    h = PauliSum([(1.0, {0: "Z"}), (0.5, {2: "X", 1: "Y"})])
    h.attach(c)
    _, run = c.build()

    def loss(theta):
        g = jnp.stack([jnp.cos(theta), -jnp.sin(theta),
                       jnp.sin(theta), jnp.cos(theta)]).astype(C128)
        return h.expval(run([g] * n, []))

    g = jax.grad(loss)(jnp.asarray(0.3, jnp.float64))
    # d<Z>/dtheta of RY rotation: -2 sin(2*theta)... just require a real,
    # finite, nonzero derivative matching finite differences
    eps = 1e-6
    fd = (float(loss(jnp.asarray(0.3 + eps))) - float(loss(jnp.asarray(0.3 - eps)))) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=1e-5)


def test_sampling_statistics():
    # |psi> = H|0> on 1 of 3 qubits: qubit 2 uniform, others fixed at 0
    n = 3
    psi = sv.standard_state(n, C128)
    psi = sv.apply_gate(psi, jnp.asarray(G.hadamard(C128).reshape(-1)), (2,))
    key = jax.random.PRNGKey(0)
    idx = sample(psi, 4000, key)
    assert set(np.unique(np.asarray(idx))) <= {0, 4}
    counts = np.asarray(sample_counts(psi, 4000, key))
    assert counts.sum() == 4000
    assert abs(counts[0] - 2000) < 200  # ~sqrt(1000) tolerance

    # sampling is jit-compatible
    jitted = jax.jit(lambda s, k: sample_counts(s, 100, k))
    assert int(jnp.sum(jitted(psi, key))) == 100


def test_fidelity():
    n = 4
    psi = sv.standard_state(n, C128)
    phi = sv.apply_gate(psi, jnp.asarray(G.hadamard(C128).reshape(-1)), (0,))
    np.testing.assert_allclose(float(fidelity(psi, psi)), 1.0, rtol=1e-12)
    np.testing.assert_allclose(float(fidelity(psi, phi)), 0.5, rtol=1e-10)
