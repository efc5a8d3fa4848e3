"""Kernel <-> oracle parity tests (the reference's test tier at
src/quantized_tensor.rs:242-610, rebuilt against dense-operator numpy
oracles)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dqc_tpu.ops import statevector as sv
from dqc_tpu.ops import gates as G

import oracles


N = 6
POSITIONS_1Q = [0, 2, N - 1]
POSITIONS_2Q = [(1, 0), (0, 1), (N - 1, 0), (2, 4), (N - 1, N - 2)]
POSITIONS_3Q = [(5, 2, 0), (0, 3, 4)]


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def to_c128(x):
    return jnp.asarray(x, dtype=jnp.complex128)


# ---------------------------------------------------------------------------
# gate application
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("pos", POSITIONS_1Q)
def test_apply_1q(rng, pos):
    psi = oracles.random_state(rng, N)
    g = oracles.random_gate(rng, 1)  # non-unitary on purpose
    got = sv.apply_1q(to_c128(psi), to_c128(g), pos)
    want = oracles.apply_oracle(psi, g, (pos,))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("pos", POSITIONS_1Q)
def test_apply_1q_flat_gate(rng, pos):
    psi = oracles.random_state(rng, N)
    g = oracles.random_gate(rng, 1)
    got = sv.apply_1q(to_c128(psi), to_c128(g.reshape(-1)), pos)
    want = oracles.apply_oracle(psi, g, (pos,))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("pos2,pos1", POSITIONS_2Q)
def test_apply_2q(rng, pos2, pos1):
    psi = oracles.random_state(rng, N)
    g = oracles.random_gate(rng, 2)
    got = sv.apply_2q(to_c128(psi), to_c128(g), pos2, pos1)
    want = oracles.apply_oracle(psi, g, (pos2, pos1))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("positions", POSITIONS_3Q)
def test_apply_3q_generic(rng, positions):
    psi = oracles.random_state(rng, N)
    g = oracles.random_gate(rng, 3)
    got = sv.apply_gate(to_c128(psi), to_c128(g), positions)
    want = oracles.apply_oracle(psi, g, positions)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("pos2,pos1", POSITIONS_2Q)
def test_apply_2q_diag(rng, pos2, pos1):
    psi = oracles.random_state(rng, N)
    d = rng.normal(size=4) + 1j * rng.normal(size=4)
    got = sv.apply_2q_diag(to_c128(psi), to_c128(d), pos2, pos1)
    want = oracles.apply_diag_oracle(psi, d, (pos2, pos1))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_apply_inverse_roundtrip(rng):
    psi = oracles.random_state(rng, N)
    g = oracles.random_gate(rng, 2)
    out = sv.apply_2q(to_c128(psi), to_c128(g), 3, 1)
    back = sv.apply_gate_inverse(out, to_c128(g), (3, 1))
    np.testing.assert_allclose(back, psi, rtol=1e-9, atol=1e-9)


def test_apply_adjoint_uncomputes_unitary(rng):
    psi = oracles.random_state(rng, N)
    u = oracles.random_unitary(rng, 2)
    out = sv.apply_2q(to_c128(psi), to_c128(u), 4, 2)
    back = sv.apply_gate_adjoint(out, to_c128(u), (4, 2))
    np.testing.assert_allclose(back, psi, rtol=1e-12, atol=1e-12)


def test_cnot_truth_table():
    # |10> on (pos2=1 control, pos1=0 target) -> |11>
    psi = sv.standard_state(2, jnp.complex128)
    psi = sv.apply_1q(psi, G.pauli_x(jnp.complex128), 1)   # set qubit 1
    out = sv.apply_2q(psi, G.cnot(jnp.complex128), 1, 0)
    np.testing.assert_allclose(out, [0, 0, 0, 1], atol=1e-12)
    # control at pos2=0: |01> (qubit0 set) -> |11>
    psi = sv.standard_state(2, jnp.complex128)
    psi = sv.apply_1q(psi, G.pauli_x(jnp.complex128), 0)
    out = sv.apply_2q(psi, G.cnot(jnp.complex128), 0, 1)
    np.testing.assert_allclose(out, [0, 0, 0, 1], atol=1e-12)


# ---------------------------------------------------------------------------
# densities / observables
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("pos", POSITIONS_1Q)
def test_density_1q(rng, pos):
    psi = oracles.random_state(rng, N)
    got = sv.density_1q(to_c128(psi), pos)
    want = oracles.density_oracle(psi, (pos,))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("pos2,pos1", POSITIONS_2Q)
def test_density_2q(rng, pos2, pos1):
    psi = oracles.random_state(rng, N)
    got = sv.density_2q(to_c128(psi), pos2, pos1)
    want = oracles.density_oracle(psi, (pos2, pos1))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_density_3q_generic(rng):
    psi = oracles.random_state(rng, N)
    got = sv.density(to_c128(psi), (4, 1, 3))
    want = oracles.density_oracle(psi, (4, 1, 3))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_expectation_matches_density_trace(rng):
    psi = oracles.random_state(rng, N)
    h = oracles.random_gate(rng, 2)
    got = sv.expectation(to_c128(psi), to_c128(h), (3, 0))
    rho = oracles.density_oracle(psi, (3, 0))
    want = np.trace(rho @ h)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_norm_fidelity(rng):
    psi = oracles.random_state(rng, N)
    np.testing.assert_allclose(sv.norm(to_c128(psi)), np.linalg.norm(psi), rtol=1e-12)
    phi = oracles.random_state(rng, N)
    np.testing.assert_allclose(
        sv.fidelity(to_c128(psi), to_c128(phi)),
        abs(np.vdot(psi, phi)) ** 2,
        rtol=1e-12,
    )


# ---------------------------------------------------------------------------
# adjoint contractions: must equal jax.vjp of the forward application
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("positions", [(2,), (4, 1), (1, 3)])
def test_gate_grad_matches_vjp(rng, positions):
    psi = to_c128(oracles.random_state(rng, N))
    ct = to_c128(oracles.random_state(rng, N))
    g = to_c128(oracles.random_gate(rng, len(positions)))
    _, vjp = jax.vjp(lambda gg: sv.apply_gate(psi, gg, positions), g)
    want = vjp(ct)[0]
    got = sv.gate_grad(psi, ct, positions)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_diag_gate_grad_matches_vjp(rng):
    positions = (3, 0)
    psi = to_c128(oracles.random_state(rng, N))
    ct = to_c128(oracles.random_state(rng, N))
    d = to_c128(rng.normal(size=4) + 1j * rng.normal(size=4))
    _, vjp = jax.vjp(lambda dd: sv.apply_diag(psi, dd, positions), d)
    want = vjp(ct)[0]
    got = sv.diag_gate_grad(psi, ct, positions)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_transport_matches_vjp(rng):
    positions = (2, 5)
    psi = to_c128(oracles.random_state(rng, N))
    ct = to_c128(oracles.random_state(rng, N))
    g = to_c128(oracles.random_gate(rng, 2))
    _, vjp = jax.vjp(lambda s: sv.apply_gate(s, g, positions), psi)
    want = vjp(ct)[0]
    got = sv.apply_gate_transpose(ct, g, positions)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

def test_standard_state():
    psi = sv.standard_state(4)
    assert psi.shape == (16,)
    np.testing.assert_allclose(psi[0], 1.0)
    np.testing.assert_allclose(jnp.sum(jnp.abs(psi)), 1.0)


def test_errors():
    psi = sv.standard_state(3, jnp.complex128)
    with pytest.raises(ValueError):
        sv.apply_1q(psi, jnp.eye(2, dtype=jnp.complex128), 3)  # out of range
    with pytest.raises(ValueError):
        sv.apply_2q(psi, jnp.eye(4, dtype=jnp.complex128), 1, 1)  # duplicate
    with pytest.raises(ValueError):
        sv.apply_1q(psi, jnp.eye(4, dtype=jnp.complex128), 0)  # wrong size
    with pytest.raises(ValueError):
        sv.num_qubits(jnp.zeros(5, dtype=jnp.complex128))


def test_jit_and_vmap_compose(rng):
    psi = to_c128(oracles.random_state(rng, N))
    gs = to_c128(np.stack([oracles.random_gate(rng, 1) for _ in range(3)]))
    f = jax.jit(jax.vmap(lambda g: sv.apply_1q(psi, g, 2)))
    out = f(gs)
    for i in range(3):
        np.testing.assert_allclose(
            out[i], oracles.apply_oracle(np.asarray(psi), np.asarray(gs[i]), (2,)),
            rtol=1e-12, atol=1e-12,
        )


def test_sampling():
    # GHZ: outcomes must be all-zeros or all-ones, ~50/50
    n = 8
    psi = sv.standard_state(n, jnp.complex128)
    psi = sv.apply_1q(psi, G.hadamard(jnp.complex128), 0)
    for i in range(n - 1):
        psi = sv.apply_2q(psi, G.cnot(jnp.complex128), i, i + 1)
    samples = np.asarray(sv.sample_bitstrings(psi, jax.random.PRNGKey(0), 4096))
    allzero = int((samples == 0).sum())
    allone = int((samples == (1 << n) - 1).sum())
    assert allzero + allone == 4096
    assert 1500 < allzero < 2600

    probs = np.asarray(sv.probabilities(psi))
    np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-10)
    np.testing.assert_allclose(probs[0], 0.5, rtol=1e-10)
