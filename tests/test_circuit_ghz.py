"""GHZ integration test — the reference's algorithm-level functional test
(reference src/test_ghz.py) rebuilt on the TPU-native API, plus the
simple_run/autodiff_run contract checks (test_ghz.py:34-37)."""

import numpy as np
import jax.numpy as jnp

from dqc_tpu import AutoGradCircuit
from dqc_tpu.ops import gates as G


def build_ghz_circuit(n):
    c = AutoGradCircuit(n, dtype=jnp.complex128)
    c.add_q1_const_gate(0)
    for i in range(n - 1):
        c.get_q2_dens_op_with_grad(i, i + 1)
    for i in range(n):
        c.get_q1_dens_op_with_grad(i)
    for i in range(n - 1):
        c.add_q2_const_gate(i, i + 1)
    for i in range(n):
        c.get_q1_dens_op(i)
    for i in range(n - 1):
        c.get_q2_dens_op(i, i + 1)
    return c


def ghz_gates(n):
    h = G.hadamard(jnp.complex128).reshape(-1)
    cx = G.cnot(jnp.complex128).reshape(-1)
    return [h] + (n - 1) * [cx]


def test_ghz_contract_and_densities():
    n = 12
    c = build_ghz_circuit(n)
    simple_run, autodiff_run = c.build()

    all_dens = simple_run([], ghz_gates(n))
    diff_dens = autodiff_run([], ghz_gates(n))

    # contract: run returns every density, forward only the diff ones
    assert len(all_dens) == 2 * n + 2 * (n - 1)
    assert len(diff_dens) == n + (n - 1)
    for lhs, rhs in zip(all_dens[: n + (n - 1)], diff_dens):
        np.testing.assert_allclose(lhs, rhs, atol=1e-12)

    # pre-CNOT stage: qubit0 in |+>, others |0>
    plus_q0 = np.zeros(4, dtype=complex)
    plus_q0[0] = plus_q0[1] = 1 / np.sqrt(2)  # qubit0 is the LOW bit of (i, i+1)=(pos2,pos1)
    # density on (pos2=0, pos1=1): msb-first index (q0 q1); qubit0=+, qubit1=0
    # basis (q0 q1): |00>,|01>,|10>,|11> -> amplitudes (1/sqrt2, 0, 1/sqrt2, 0)
    psi01 = np.array([1 / np.sqrt(2), 0, 1 / np.sqrt(2), 0])
    first = np.outer(psi01, psi01.conj())
    np.testing.assert_allclose(all_dens[0], first, atol=1e-12)

    # remaining pre-CNOT 2q densities: |00><00|
    zero2 = np.zeros((4, 4))
    zero2[0, 0] = 1
    for dens in all_dens[1 : n - 1]:
        np.testing.assert_allclose(dens, zero2, atol=1e-12)

    # pre-CNOT 1q densities: qubit0 in |+><+|, the rest |0><0|
    superpos = np.full((2, 2), 0.5)
    np.testing.assert_allclose(all_dens[n - 1], superpos, atol=1e-12)
    up = np.array([[1.0, 0.0], [0.0, 0.0]])
    for dens in all_dens[n : 2 * n - 1]:
        np.testing.assert_allclose(dens, up, atol=1e-12)

    # post-CNOT-chain: every 1q density maximally mixed
    mixed = np.eye(2) / 2
    for dens in all_dens[2 * n - 1 : 3 * n - 1]:
        np.testing.assert_allclose(dens, mixed, atol=1e-12)

    # post-chain 2q densities: (|00><00| + |11><11|)/2
    ghz2 = np.zeros((4, 4))
    ghz2[0, 0] = ghz2[3, 3] = 0.5
    for dens in all_dens[3 * n - 1 :]:
        np.testing.assert_allclose(dens, ghz2, atol=1e-12)


def test_ghz_final_state():
    n = 10
    c = AutoGradCircuit(n, dtype=jnp.complex128)
    c.add_q1_const_gate(0)
    for i in range(n - 1):
        c.add_q2_const_gate(i, i + 1)
    c.get_q1_dens_op_with_grad(0)  # tape must not be empty of outputs
    state_fn = c.build_state_fn()
    psi = state_fn([], ghz_gates(n))
    want = np.zeros(1 << n, dtype=complex)
    want[0] = want[-1] = 1 / np.sqrt(2)
    np.testing.assert_allclose(psi, want, atol=1e-12)


def test_arity_validation():
    n = 3
    c = build_ghz_circuit(n)
    simple_run, autodiff_run = c.build()
    import pytest

    with pytest.raises(ValueError):
        simple_run([], ghz_gates(n)[:-1])  # too few const gates
    with pytest.raises(ValueError):
        simple_run([jnp.zeros(4, jnp.complex128)], ghz_gates(n))  # extra var gate
    with pytest.raises(ValueError):
        simple_run([], ghz_gates(n)[:-1] + [jnp.zeros(3, jnp.complex128)])  # bad shape


def test_ghz_reference_scale():
    """The reference's original scale: 21 qubits (src/test_ghz.py:10)."""
    n = 21
    c = AutoGradCircuit(n, dtype=jnp.complex64)
    c.add_q1_const_gate(0)
    for i in range(n - 1):
        c.add_q2_const_gate(i, i + 1)
    for i in range(n):
        c.get_q1_dens_op_with_grad(i)
    _, run = c.build()
    dens = run([], ghz_gates(n))
    mixed = np.eye(2) / 2
    for d in dens:
        np.testing.assert_allclose(d, mixed, atol=1e-6)
