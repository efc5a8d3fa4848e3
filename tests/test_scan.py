"""Scan-mode parity: scanned layered execution must match the unrolled path
in value and gradient; VQE scan vs no-scan energies/grads identical."""

import numpy as np
import jax
import jax.numpy as jnp

from dqc_tpu import AutoGradCircuit
from dqc_tpu.circuit.fused_autograd import fused_tape_forward
from dqc_tpu.circuit.fusion import fuse_tape
from dqc_tpu.circuit.scan import fuse_layer, scanned_layers
from dqc_tpu.models.vqe_ising import VQEIsing

import oracles

C128 = jnp.complex128


def test_scanned_layers_matches_unrolled():
    n, L = 8, 4
    rng = np.random.default_rng(5)

    layer = AutoGradCircuit(n, dtype=C128)
    for i in range(n):
        layer.add_q1_var_gate(i)
    for i in range(0, n - 1, 2):
        layer.add_q2_var_gate(i + 1, i)
    for i in range(n - 1):
        layer.add_q2_const_gate_diag(i, i + 1)
    lft = fuse_layer(layer.tape)

    const_gates = tuple(
        jnp.asarray(oracles.random_diag_unitary(rng, 2), C128) for _ in range(n - 1)
    )
    # stacked var gates: n 1q slots + n/2 2q slots, each (L, ...)
    stacked = tuple(
        jnp.stack([jnp.asarray(oracles.random_unitary(rng, 1).reshape(-1), C128)
                   for _ in range(L)])
        for _ in range(n)
    ) + tuple(
        jnp.stack([jnp.asarray(oracles.random_unitary(rng, 2).reshape(-1), C128)
                   for _ in range(L)])
        for _ in range(len(range(0, n - 1, 2)))
    )

    # unrolled full tape
    full = AutoGradCircuit(n, dtype=C128)
    for _ in range(L):
        for i in range(n):
            full.add_q1_var_gate(i)
        for i in range(0, n - 1, 2):
            full.add_q2_var_gate(i + 1, i)
        for i in range(n - 1):
            full.add_q2_const_gate_diag(i, i + 1)
    for i in range(n):
        full.get_q1_dens_op_with_grad(i)
    fft = fuse_tape(full.tape)

    epi = AutoGradCircuit(n, dtype=C128)
    for i in range(n):
        epi.get_q1_dens_op_with_grad(i)
    eft = fuse_tape(epi.tape)

    init = jnp.zeros(1 << n, C128).at[0].set(1.0)

    def loss_scan(stacked):
        state = scanned_layers(lft, init, stacked, const_gates)
        dens = fused_tape_forward(eft, state, (), ())
        return sum((1 - jnp.einsum("ij,ji->", d, d)).real for d in dens)

    def loss_unrolled(stacked):
        flat_vars = []
        for l in range(L):
            for s in stacked:
                flat_vars.append(s[l])
        dens = fused_tape_forward(fft, init, tuple(flat_vars), const_gates * L)
        return sum((1 - jnp.einsum("ij,ji->", d, d)).real for d in dens)

    v1, g1 = jax.value_and_grad(loss_scan)(stacked)
    v2, g2 = jax.value_and_grad(loss_unrolled)(stacked)
    np.testing.assert_allclose(v1, v2, rtol=1e-10)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-10)


def test_vqe_scan_matches_unrolled():
    params_key = jax.random.PRNGKey(7)
    m_scan = VQEIsing(8, 4, dtype=C128, scan=True)
    m_flat = VQEIsing(8, 4, dtype=C128, scan=False)
    params = m_scan.init_params(params_key)

    v1, g1 = jax.value_and_grad(m_scan.energy)(params)
    v2, g2 = jax.value_and_grad(m_flat.energy)(params)
    np.testing.assert_allclose(v1, v2, rtol=1e-10)
    np.testing.assert_allclose(g1, g2, rtol=1e-8, atol=1e-12)


def test_vqe_scan_jit():
    m = VQEIsing(7, 5, dtype=C128, scan=True)
    params = m.init_params(jax.random.PRNGKey(0))
    v1, g1 = jax.jit(jax.value_and_grad(m.energy))(params)
    v2, g2 = jax.value_and_grad(m.energy)(params)
    np.testing.assert_allclose(v1, v2, rtol=1e-10)
    np.testing.assert_allclose(g1, g2, rtol=1e-9)


def test_hardware_efficient_scan_matches_unrolled():
    from dqc_tpu.models.hardware_efficient import HardwareEfficientAnsatz
    m_scan = HardwareEfficientAnsatz(7, 4, entangler="cz", dtype=C128, scan=True)
    m_flat = HardwareEfficientAnsatz(7, 4, entangler="cz", dtype=C128, scan=False)
    params = m_scan.init_params(jax.random.PRNGKey(2))
    v1, g1 = jax.value_and_grad(m_scan.magnetization)(params)
    v2, g2 = jax.value_and_grad(m_flat.magnetization)(params)
    np.testing.assert_allclose(v1, v2, rtol=1e-10)
    np.testing.assert_allclose(g1, g2, rtol=1e-8, atol=1e-12)


def test_hardware_efficient_scan_cnot_entangler():
    from dqc_tpu.models.hardware_efficient import HardwareEfficientAnsatz
    m_scan = HardwareEfficientAnsatz(6, 3, entangler="cnot", dtype=C128, scan=True)
    m_flat = HardwareEfficientAnsatz(6, 3, entangler="cnot", dtype=C128, scan=False)
    params = m_scan.init_params(jax.random.PRNGKey(4))
    v1, g1 = jax.value_and_grad(m_scan.magnetization)(params)
    v2, g2 = jax.value_and_grad(m_flat.magnetization)(params)
    np.testing.assert_allclose(v1, v2, rtol=1e-10)
    np.testing.assert_allclose(g1, g2, rtol=1e-8, atol=1e-12)
