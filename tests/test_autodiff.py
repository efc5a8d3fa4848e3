"""The gradient gauntlet.

Port of the reference's adversarial autodiff test (src/test_autodiff.py): a
tape mixing *every* instruction kind — var/const x 1q/2q x unitary/non-unitary
/diagonal gates, interleaved diff and non-diff density ops — with the
directional derivative from jax.grad checked against an 8th-order central
finite difference to rel. err < 1e-9 in f64 (src/test_autodiff.py:152-165).

Plus stronger checks the reference cannot do:
* exact-match of the O(1)-memory custom_vjp against plain JAX AD of the
  identical jnp program (same convention by construction),
* jit/vmap over the whole differentiable circuit (reference README.md:15
  forbids jit), and gradients w.r.t. the initial state.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dqc_tpu import AutoGradCircuit
from dqc_tpu.circuit.autograd import run_tape, tape_forward

import oracles

C128 = jnp.complex128


def build_gauntlet(n, layers):
    """Tape exercising every instruction kind (cf. src/test_autodiff.py:48-81)."""
    c = AutoGradCircuit(n, dtype=C128)
    for _ in range(layers):
        for i in range(n):
            c.get_q1_dens_op_with_grad(i)
        for i in range(0, n - 1, 2):
            c.get_q2_dens_op_with_grad(i + 1, i)
        for i in range(n):
            c.add_q1_var_gate(i)
        for i in range(0, n - 1, 2):
            c.add_q2_var_gate(i + 1, i)
        for i in range(0, n - 1, 2):
            c.add_q2_var_gate_diag(i + 1, i)
        for i in range(n):
            c.add_q1_const_gate(i)
        for i in range(1, n - 1, 2):
            c.add_q2_const_gate(i + 1, i)
        for i in range(1, n - 1, 2):
            c.add_q2_const_gate_diag(i + 1, i)
        for i in range(n):
            c.add_q1_var_gate_nonu(i)
        for i in range(0, n - 1, 2):
            c.add_q2_var_gate_nonu(i + 1, i)
        for i in range(n):
            c.add_q1_const_gate_nonu(i)
        for i in range(1, n - 1, 2):
            c.add_q2_const_gate_nonu(i + 1, i)
        for i in range(n):
            c.get_q1_dens_op(i)
    for i in range(n):
        c.get_q1_dens_op(i)
    return c


def gauntlet_gates(rng, n, layers, var):
    """Gate values for one queue of the gauntlet tape, in consumption order."""
    gates = []
    npairs_even = len(range(0, n - 1, 2))
    npairs_odd = len(range(1, n - 1, 2))
    for _ in range(layers):
        if var:
            gates += [oracles.random_unitary(rng, 1).reshape(-1) for _ in range(n)]
            gates += [oracles.random_unitary(rng, 2).reshape(-1) for _ in range(npairs_even)]
            gates += [oracles.random_diag_unitary(rng, 2) for _ in range(npairs_even)]
            # non-unitary: unitary + small perturbation (well-conditioned inverse,
            # cf. src/test_autodiff.py:104-106)
            gates += [
                (oracles.random_unitary(rng, 1) + 0.01 * oracles.random_gate(rng, 1)).reshape(-1)
                for _ in range(n)
            ]
            gates += [
                (oracles.random_unitary(rng, 2) + 0.01 * oracles.random_gate(rng, 2)).reshape(-1)
                for _ in range(npairs_even)
            ]
        else:
            gates += [oracles.random_unitary(rng, 1).reshape(-1) for _ in range(n)]
            gates += [oracles.random_unitary(rng, 2).reshape(-1) for _ in range(npairs_odd)]
            gates += [oracles.random_diag_unitary(rng, 2) for _ in range(npairs_odd)]
            gates += [
                (oracles.random_unitary(rng, 1) + 0.01 * oracles.random_gate(rng, 1)).reshape(-1)
                for _ in range(n)
            ]
            gates += [
                (oracles.random_unitary(rng, 2) + 0.01 * oracles.random_gate(rng, 2)).reshape(-1)
                for _ in range(npairs_odd)
            ]
    return [jnp.asarray(g, dtype=C128) for g in gates]


def perturbations(rng, gates):
    out = []
    for g in gates:
        p = rng.normal(size=g.shape) + 1j * rng.normal(size=g.shape)
        out.append(jnp.asarray(p, dtype=C128))
    return out


def av_tsallis(fwd_circ):
    def loss(var_gates, const_gates):
        dens = fwd_circ(var_gates, const_gates)
        s = 0.0
        for dm in dens:
            s += (1 - jnp.einsum("ij,ji->", dm, dm)).real
        return s / len(dens)
    return loss


def test_finite_difference_gauntlet():
    n, layers = 7, 2
    eta = 1e-6
    rng = np.random.default_rng(42)

    c = build_gauntlet(n, layers)
    _, fwd_circ = c.build()
    loss = av_tsallis(fwd_circ)

    const_gates = gauntlet_gates(rng, n, layers, var=False)
    var_gates = gauntlet_gates(rng, n, layers, var=True)
    pert = perturbations(rng, var_gates)

    def at(t):
        shifted = [g + t * p for g, p in zip(var_gates, pert)]
        return loss(shifted, const_gates)

    # 8th-order central finite difference (src/test_autodiff.py:152-156)
    coeffs = {4: -1 / 280, 3: 4 / 105, 2: -1 / 5, 1: 4 / 5}
    ds_fd = sum(c8 * (at(m * eta) - at(-m * eta)) for m, c8 in coeffs.items()) / eta

    grads = jax.grad(loss, argnums=0)(var_gates, const_gates)
    ds_ad = sum(jnp.tensordot(g, p, axes=1).real for g, p in zip(grads, pert))

    rel = abs(ds_ad - ds_fd) / min(abs(ds_ad), abs(ds_fd))
    assert rel < 1e-9, f"relative error {rel}"


def test_custom_vjp_matches_plain_ad():
    """The O(1)-memory adjoint must agree with checkpointing JAX AD exactly."""
    n, layers = 5, 1
    rng = np.random.default_rng(3)
    c = build_gauntlet(n, layers)
    tape = c.tape
    init = c.initial_state()
    const_gates = tuple(gauntlet_gates(rng, n, layers, var=False))
    var_gates = tuple(gauntlet_gates(rng, n, layers, var=True))

    def loss_custom(state, vg):
        dens = tape_forward(tape, state, vg, const_gates)
        return sum((1 - jnp.einsum("ij,ji->", d, d)).real for d in dens)

    def loss_plain(state, vg):
        dens, _ = run_tape(tape, state, vg, const_gates, only_diff=True)
        return sum((1 - jnp.einsum("ij,ji->", d, d)).real for d in dens)

    gs_c, gv_c = jax.grad(loss_custom, argnums=(0, 1))(init, var_gates)
    gs_p, gv_p = jax.grad(loss_plain, argnums=(0, 1))(init, var_gates)

    np.testing.assert_allclose(gs_c, gs_p, rtol=1e-10, atol=1e-10)
    for a, b in zip(gv_c, gv_p):
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-10)


def test_trailing_var_gates_zero_grad():
    """Var gates after the last diff density get exactly zero gradient
    (reference circuit.rs:327-332 bwd_option=None branches)."""
    n = 4
    rng = np.random.default_rng(11)
    c = AutoGradCircuit(n, dtype=C128)
    c.add_q1_var_gate(0)
    c.get_q1_dens_op_with_grad(0)
    c.add_q1_var_gate(1)          # trailing: no diff density after it
    c.add_q2_var_gate(2, 1)       # trailing
    _, fwd = c.build()

    var_gates = [
        jnp.asarray(oracles.random_unitary(rng, 1).reshape(-1), C128),
        jnp.asarray(oracles.random_unitary(rng, 1).reshape(-1), C128),
        jnp.asarray(oracles.random_unitary(rng, 2).reshape(-1), C128),
    ]

    def loss(vg):
        dens = fwd(vg, [])
        return jnp.einsum("ij,ji->", dens[0], dens[0]).real

    g = jax.grad(loss)(var_gates)
    assert np.any(np.abs(np.asarray(g[0])) > 1e-3)
    np.testing.assert_array_equal(np.asarray(g[1]), 0)
    np.testing.assert_array_equal(np.asarray(g[2]), 0)


def test_jit_value_and_grad():
    """The whole circuit is jittable (removes reference README.md:15)."""
    n = 5
    rng = np.random.default_rng(5)
    c = AutoGradCircuit(n, dtype=C128)
    for i in range(n):
        c.add_q1_var_gate(i)
    for i in range(n - 1):
        c.add_q2_const_gate(i, i + 1)
    for i in range(n):
        c.get_q1_dens_op_with_grad(i)
    _, fwd = c.build()

    var_gates = tuple(jnp.asarray(oracles.random_unitary(rng, 1).reshape(-1), C128) for _ in range(n))
    const_gates = tuple(jnp.asarray(oracles.random_unitary(rng, 2).reshape(-1), C128) for _ in range(n - 1))

    def loss(vg):
        dens = fwd(vg, const_gates)
        return sum((1 - jnp.einsum("ij,ji->", d, d)).real for d in dens)

    vag = jax.jit(jax.value_and_grad(loss))
    v1, g1 = vag(var_gates)
    v2, g2 = jax.value_and_grad(loss)(var_gates)
    np.testing.assert_allclose(v1, v2, rtol=1e-10)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-12)


def test_vmap_over_parameters():
    """vmap over gate parameters — impossible in the reference."""
    n = 4
    c = AutoGradCircuit(n, dtype=C128)
    for i in range(n):
        c.add_q1_var_gate(i)
    c.get_q1_dens_op_with_grad(0)
    _, fwd = c.build()

    def loss(thetas):
        gs = tuple(
            jnp.array(
                [[jnp.cos(t), -1j * jnp.sin(t)], [-1j * jnp.sin(t), jnp.cos(t)]],
                dtype=C128,
            )
            for t in thetas
        )
        dens = fwd(gs, [])
        return jnp.einsum("ij,ji->", dens[0], dens[0]).real

    batch = jnp.linspace(0.0, 1.0, 6).reshape(3, 2).repeat(2, axis=1)
    vals = jax.vmap(loss)(batch)
    for i in range(3):
        np.testing.assert_allclose(vals[i], loss(batch[i]), rtol=1e-10)
    grads = jax.vmap(jax.grad(loss))(batch)
    for i in range(3):
        np.testing.assert_allclose(grads[i], jax.grad(loss)(batch[i]), rtol=1e-9)


def test_initial_state_gradient():
    """d(loss)/d(initial_state) — a capability beyond the reference."""
    n = 3
    rng = np.random.default_rng(9)
    c = AutoGradCircuit(n, dtype=C128)
    c.add_q1_const_gate(0)
    c.get_q1_dens_op_with_grad(2)
    tape = c.tape
    const_gates = (jnp.asarray(oracles.random_unitary(rng, 1).reshape(-1), C128),)

    psi0 = jnp.asarray(oracles.random_state(rng, n), C128)
    psi0 = psi0 / jnp.linalg.norm(psi0)

    def loss_custom(state):
        dens = tape_forward(tape, state, (), const_gates)
        return jnp.einsum("ij,ji->", dens[0], dens[0]).real

    def loss_plain(state):
        dens, _ = run_tape(tape, state, (), const_gates, only_diff=True)
        return jnp.einsum("ij,ji->", dens[0], dens[0]).real

    np.testing.assert_allclose(
        jax.grad(loss_custom)(psi0), jax.grad(loss_plain)(psi0), rtol=1e-10, atol=1e-12
    )


@pytest.mark.slow
def test_finite_difference_gauntlet_full_scale():
    """The reference's gauntlet at its original scale: 15 qubits, 10 layers,
    every instruction kind (reference src/test_autodiff.py:12-14)."""
    n, layers = 15, 10
    eta = 1e-6
    rng = np.random.default_rng(1)

    c = build_gauntlet(n, layers)
    _, fwd_circ = c.build()
    loss = av_tsallis(fwd_circ)

    const_gates = gauntlet_gates(rng, n, layers, var=False)
    var_gates = gauntlet_gates(rng, n, layers, var=True)
    pert = perturbations(rng, var_gates)

    shifted = {}
    def at(t):
        if t not in shifted:
            sg = [g + t * p for g, p in zip(var_gates, pert)]
            shifted[t] = loss(sg, const_gates)
        return shifted[t]

    coeffs = {4: -1 / 280, 3: 4 / 105, 2: -1 / 5, 1: 4 / 5}
    ds_fd = sum(c8 * (at(m * eta) - at(-m * eta)) for m, c8 in coeffs.items()) / eta

    grads = jax.grad(loss, argnums=0)(var_gates, const_gates)
    ds_ad = sum(jnp.tensordot(g, p, axes=1).real for g, p in zip(grads, pert))

    rel = abs(ds_ad - ds_fd) / min(abs(ds_ad), abs(ds_fd))
    assert rel < 1e-9, f"relative error {rel}"
