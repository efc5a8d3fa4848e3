"""Singular non-unitary gates must produce an actionable error, not NaN
gradients (the reference reports cuBLAS "U(i,i) is zero",
primitives.cu:128-132; here the diagnosis names the offending gate)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dqc_tpu import config
from dqc_tpu.circuit.builder import AutoGradCircuit
from dqc_tpu.ops import inversion

C64 = jnp.complex64

SINGULAR_2x2 = np.array([[1, 1], [1, 1]], dtype=np.complex64)
SINGULAR_DIAG = np.array([1, 0, 1, 1], dtype=np.complex64)


def build(n=6, diag=False):
    c = AutoGradCircuit(n, dtype=C64)
    c.add_q1_const_gate(0)
    if diag:
        # non-unitary diagonal: a generic-builder extension over the
        # reference's enum (which has no non-unitary diag variant)
        c.add_diag_gate((1, 2), var=True, unitary=False)
    else:
        c.add_q1_var_gate_nonu(1)
    c.get_q1_dens_op_with_grad(1)
    _, autodiff = c.build()
    return autodiff


def loss_of(autodiff, var_gates, const_gates):
    dens = autodiff(var_gates, const_gates)
    return sum(jnp.sum(jnp.abs(d) ** 2) for d in dens).real


def test_singular_dense_var_gate_raises():
    autodiff = build(diag=False)
    h = (1 / np.sqrt(2)) * np.array([1, 1, 1, -1], dtype=np.complex64)
    with pytest.raises(ValueError, match="singular non-unitary gate"):
        jax.grad(lambda: None)  # placeholder so jax is initialized
        # eager gradient: gates are concrete -> host-side diagnosis
        v, g = jax.value_and_grad(
            lambda vg: loss_of(autodiff, [vg], [h])
        )(jnp.asarray(SINGULAR_2x2.reshape(-1)))


def test_singular_diag_var_gate_raises():
    autodiff = build(diag=True)
    h = (1 / np.sqrt(2)) * np.array([1, 1, 1, -1], dtype=np.complex64)
    with pytest.raises(ValueError, match="singular non-unitary gate"):
        jax.value_and_grad(
            lambda vg: loss_of(autodiff, [vg], [h])
        )(jnp.asarray(SINGULAR_DIAG))


def test_error_names_the_gate():
    autodiff = build(diag=False)
    h = (1 / np.sqrt(2)) * np.array([1, 1, 1, -1], dtype=np.complex64)
    with pytest.raises(ValueError, match="queue index 0"):
        jax.value_and_grad(
            lambda vg: loss_of(autodiff, [vg], [h])
        )(jnp.asarray(SINGULAR_2x2.reshape(-1)))


def test_well_conditioned_nonu_still_works():
    autodiff = build(diag=False)
    h = (1 / np.sqrt(2)) * np.array([1, 1, 1, -1], dtype=np.complex64)
    g = (np.linalg.qr(np.random.default_rng(0).normal(size=(2, 2)))[0]
         + 0.01 * np.eye(2)).astype(np.complex64)
    v, grads = jax.value_and_grad(
        lambda vg: loss_of(autodiff, [vg], [h])
    )(jnp.asarray(g.reshape(-1)))
    assert np.all(np.isfinite(np.asarray(grads)))


def test_traced_debug_mode_does_not_crash():
    """Under jit (traced gates) the 'debug' mode flags at runtime and grads
    are NaN — but execution completes (no trace-time error)."""
    config.set_singularity_checks("debug")
    try:
        autodiff = build(diag=False)
        h = (1 / np.sqrt(2)) * np.array([1, 1, 1, -1], dtype=np.complex64)

        @jax.jit
        def f(vg):
            return jax.value_and_grad(
                lambda x: loss_of(autodiff, [x], [h])
            )(vg)

        v, g = f(jnp.asarray(SINGULAR_2x2.reshape(-1)))
        assert not np.all(np.isfinite(np.asarray(g)))
    finally:
        config.set_singularity_checks("host")


def test_off_mode_reference_parity():
    config.set_singularity_checks("off")
    try:
        assert np.all(np.isinf(np.abs(
            inversion.invert_diag(SINGULAR_DIAG, unitary=False))[1:2]))
    finally:
        config.set_singularity_checks("host")


def test_invert_gate_unitary_path():
    u = (1 / np.sqrt(2)) * np.array([[1, 1], [1, -1]], dtype=np.complex64)
    np.testing.assert_allclose(inversion.invert_gate(u, unitary=True),
                               u.conj().T)
