"""Pallas dual-group kernel vs the grouped-engine reference (interpret mode
on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dqc_tpu.ops import groups as gr
from dqc_tpu.ops.pallas.dual_apply import dual_group_apply_planes

import oracles


def test_dual_group_apply_matches_engine():
    n = 15  # dims (2, 128, 128)
    rng = np.random.default_rng(0)
    psi = oracles.random_state(rng, n).astype(np.complex64)
    el = oracles.random_unitary(rng, 7).astype(np.complex64)
    em = oracles.random_unitary(rng, 7).astype(np.complex64)

    t = gr.to_grouped(jnp.asarray(psi), n)
    want = gr.apply_group_matrix(gr.apply_group_matrix(t, jnp.asarray(el), 0),
                                 jnp.asarray(em), 1)

    xr = jnp.asarray(psi.real.reshape(2, 128, 128))
    xi = jnp.asarray(psi.imag.reshape(2, 128, 128))
    yr, yi = dual_group_apply_planes(
        xr, xi,
        jnp.asarray(el.real), jnp.asarray(el.imag),
        jnp.asarray(em.real), jnp.asarray(em.imag),
        a_blk=2, interpret=True,
    )
    got = np.asarray(yr) + 1j * np.asarray(yi)
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-5, atol=2e-5)
