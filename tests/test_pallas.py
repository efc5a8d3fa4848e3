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


def test_block_backward_lane_matches_engine():
    from dqc_tpu.ops.pallas.block_backward import block_backward_lane
    n = 15
    rng = np.random.default_rng(4)
    fwd_out = oracles.random_state(rng, n).astype(np.complex64)
    bwd = oracles.random_state(rng, n).astype(np.complex64)
    E = oracles.random_unitary(rng, 7).astype(np.complex64)
    Einv = np.linalg.inv(E).astype(np.complex64)

    t_f = gr.to_grouped(jnp.asarray(fwd_out), n)
    t_b = gr.to_grouped(jnp.asarray(bwd), n)
    want_fi = gr.apply_group_matrix(t_f, jnp.asarray(Einv), 0)
    want_bn = gr.apply_group_matrix(t_b, jnp.asarray(E).T, 0)
    want_t0 = gr.group_pair_gram(want_fi, t_b, 0)

    shape = (2, 128, 128)
    fir, fii, bnr, bni, t0r, t0i = block_backward_lane(
        jnp.asarray(fwd_out.real.reshape(shape)), jnp.asarray(fwd_out.imag.reshape(shape)),
        jnp.asarray(bwd.real.reshape(shape)), jnp.asarray(bwd.imag.reshape(shape)),
        jnp.asarray(Einv.real), jnp.asarray(Einv.imag),
        jnp.asarray(E.real), jnp.asarray(E.imag),
        a_blk=2, interpret=True,
    )
    got_fi = np.asarray(fir) + 1j * np.asarray(fii)
    got_bn = np.asarray(bnr) + 1j * np.asarray(bni)
    got_t0 = np.asarray(t0r) + 1j * np.asarray(t0i)
    np.testing.assert_allclose(got_fi.reshape(-1), np.asarray(want_fi).reshape(-1),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(got_bn.reshape(-1), np.asarray(want_bn).reshape(-1),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(got_t0, np.asarray(want_t0), rtol=2e-4, atol=2e-3)


def test_block_backward_sublane_matches_engine():
    from dqc_tpu.ops.pallas.block_backward import block_backward_sublane
    n = 15
    rng = np.random.default_rng(6)
    fwd_out = oracles.random_state(rng, n).astype(np.complex64)
    bwd = oracles.random_state(rng, n).astype(np.complex64)
    E = oracles.random_unitary(rng, 7).astype(np.complex64)
    Einv = np.linalg.inv(E).astype(np.complex64)

    t_f = gr.to_grouped(jnp.asarray(fwd_out), n)
    t_b = gr.to_grouped(jnp.asarray(bwd), n)
    want_fi = gr.apply_group_matrix(t_f, jnp.asarray(Einv), 1)
    want_bn = gr.apply_group_matrix(t_b, jnp.asarray(E).T, 1)
    want_t0 = gr.group_pair_gram(want_fi, t_b, 1)

    shape = (2, 128, 128)
    fir, fii, bnr, bni, t0r, t0i = block_backward_sublane(
        jnp.asarray(fwd_out.real.reshape(shape)), jnp.asarray(fwd_out.imag.reshape(shape)),
        jnp.asarray(bwd.real.reshape(shape)), jnp.asarray(bwd.imag.reshape(shape)),
        jnp.asarray(Einv.real), jnp.asarray(Einv.imag),
        jnp.asarray(E.real), jnp.asarray(E.imag),
        a_blk=2, interpret=True,
    )
    got_fi = np.asarray(fir) + 1j * np.asarray(fii)
    got_bn = np.asarray(bnr) + 1j * np.asarray(bni)
    got_t0 = np.asarray(t0r) + 1j * np.asarray(t0i)
    np.testing.assert_allclose(got_fi.reshape(-1), np.asarray(want_fi).reshape(-1),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(got_bn.reshape(-1), np.asarray(want_bn).reshape(-1),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(got_t0, np.asarray(want_t0), rtol=2e-4, atol=2e-3)


def test_block_backward_high_matches_engine():
    from dqc_tpu.ops.pallas.block_backward import block_backward_high
    n = 16  # groups (7,7,2): dims (4,128,128); group 2 axis X=4 at the front
    rng = np.random.default_rng(9)
    fwd_out = oracles.random_state(rng, n).astype(np.complex64)
    bwd = oracles.random_state(rng, n).astype(np.complex64)
    E = oracles.random_unitary(rng, 2).astype(np.complex64)
    Einv = np.linalg.inv(E).astype(np.complex64)

    t_f = gr.to_grouped(jnp.asarray(fwd_out), n)
    t_b = gr.to_grouped(jnp.asarray(bwd), n)
    want_fi = gr.apply_group_matrix(t_f, jnp.asarray(Einv), 2)
    want_bn = gr.apply_group_matrix(t_b, jnp.asarray(E).T, 2)
    want_t0 = gr.group_pair_gram(want_fi, t_b, 2)

    shape = (1, 4, 128, 128)  # (A1, X, M, 128)
    fir, fii, bnr, bni, t0r, t0i = block_backward_high(
        jnp.asarray(fwd_out.real.reshape(shape)), jnp.asarray(fwd_out.imag.reshape(shape)),
        jnp.asarray(bwd.real.reshape(shape)), jnp.asarray(bwd.imag.reshape(shape)),
        jnp.asarray(Einv.real), jnp.asarray(Einv.imag),
        jnp.asarray(E.real), jnp.asarray(E.imag),
        m_blk=8, interpret=True,
    )
    got_fi = np.asarray(fir) + 1j * np.asarray(fii)
    got_bn = np.asarray(bnr) + 1j * np.asarray(bni)
    got_t0 = np.asarray(t0r) + 1j * np.asarray(t0i)
    np.testing.assert_allclose(got_fi.reshape(-1), np.asarray(want_fi).reshape(-1),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(got_bn.reshape(-1), np.asarray(want_bn).reshape(-1),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(got_t0, np.asarray(want_t0), rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("j", [0, 1, 2])
def test_gram_axis_matches_engine(j):
    """gram kernels (one HBM read) vs the dense group Gram oracle."""
    from dqc_tpu.ops import planes as pln

    n = 16  # groups (7, 7, 2): lane/sublane kernels + X=4 einsum fallback
    rng = np.random.default_rng(11)
    psi = oracles.random_state(rng, n).astype(np.complex64)
    t = gr.to_grouped(jnp.asarray(psi), n)
    want = np.asarray(gr.group_gram(t, j))

    xr = jnp.asarray(psi.real.reshape(4, 128, 128))
    xi = jnp.asarray(psi.imag.reshape(4, 128, 128))
    got = np.asarray(pln.gram_axis(xr, xi, j, n, interpret=True))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


def test_gram_axis_high_kernel_path():
    """X >= 8 high-group gram goes through the Pallas kernel."""
    from dqc_tpu.ops import planes as pln

    n = 17  # groups (7, 7, 3): X = 8 -> kernel path
    rng = np.random.default_rng(12)
    psi = oracles.random_state(rng, n).astype(np.complex64)
    t = gr.to_grouped(jnp.asarray(psi), n)
    want = np.asarray(gr.group_gram(t, 2))

    xr = jnp.asarray(psi.real.reshape(8, 128, 128))
    xi = jnp.asarray(psi.imag.reshape(8, 128, 128))
    got = np.asarray(pln.gram_axis(xr, xi, 2, n, interpret=True))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


def test_diag_sweep_planes_matches_oracle():
    """Fused diagonal-run sweep: x *= Tas[a,s]*Tal[a,l]*Tsl[s,l] in one pass."""
    from dqc_tpu.ops import planes as pln

    n = 16  # A = 4
    rng = np.random.default_rng(21)
    psi = oracles.random_state(rng, n).astype(np.complex64)
    A = 4
    tsl = (rng.standard_normal((128, 128)) + 1j * rng.standard_normal((128, 128))).astype(np.complex64)
    tas = (rng.standard_normal((A, 128)) + 1j * rng.standard_normal((A, 128))).astype(np.complex64)
    tal = (rng.standard_normal((A, 128)) + 1j * rng.standard_normal((A, 128))).astype(np.complex64)
    D = tas[:, :, None] * tal[:, None, :] * tsl[None, :, :]
    want = psi.reshape(A, 128, 128) * D

    xr = jnp.asarray(psi.real.reshape(A, 128, 128))
    xi = jnp.asarray(psi.imag.reshape(A, 128, 128))
    yr, yi = pln.apply_diag_run(
        xr, xi, (jnp.asarray(tsl), jnp.asarray(tas), jnp.asarray(tal)),
        interpret=True)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("with_q", [False, True])
def test_diag_backward_planes_matches_oracle(with_q):
    """One-pass diag-run adjoint: fwd *= D_inv, bwd *= D, and the Q pair
    reductions (taken before the updates)."""
    from dqc_tpu.ops import planes as pln

    n = 16
    rng = np.random.default_rng(22)
    A = 4
    fwd = oracles.random_state(rng, n).astype(np.complex64).reshape(A, 128, 128)
    bwd = oracles.random_state(rng, n).astype(np.complex64).reshape(A, 128, 128)

    def rnd(shape):
        # well-conditioned diagonal factors (unit-modulus phases + noise)
        ph = np.exp(1j * rng.uniform(0, 2 * np.pi, shape))
        return (ph * (1.0 + 0.1 * rng.standard_normal(shape))).astype(np.complex64)

    tsl, tas, tal = rnd((128, 128)), rnd((A, 128)), rnd((A, 128))
    D = tas[:, :, None] * tal[:, None, :] * tsl[None, :, :]
    Dinv = 1.0 / D
    # factored inverse tables (what the engine passes)
    isl, ias, ial = 1.0 / tsl, 1.0 / tas, 1.0 / tal

    Q = bwd * fwd
    want_f, want_b = fwd * Dinv, bwd * D
    fr, fi_, br, bi, Qk = pln.backward_diag_run(
        jnp.asarray(fwd.real), jnp.asarray(fwd.imag),
        jnp.asarray(bwd.real), jnp.asarray(bwd.imag),
        (jnp.asarray(isl), jnp.asarray(ias), jnp.asarray(ial)),
        (jnp.asarray(tsl), jnp.asarray(tas), jnp.asarray(tal)),
        with_q=with_q, interpret=True)
    got_f = np.asarray(fr) + 1j * np.asarray(fi_)
    got_b = np.asarray(br) + 1j * np.asarray(bi)
    np.testing.assert_allclose(got_f, want_f, rtol=4e-5, atol=4e-5)
    np.testing.assert_allclose(got_b, want_b, rtol=4e-5, atol=4e-5)
    if with_q:
        np.testing.assert_allclose(np.asarray(Qk[0]), Q.sum(axis=0), rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(Qk[1]), Q.sum(axis=2), rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(Qk[2]), Q.sum(axis=1), rtol=1e-4, atol=1e-3)
    else:
        assert Qk is None


def test_merged_tiny_top_dispatch():
    """n=22 -> groups (7,7,7,1): a dense op on the 1-bit top group must
    DISPATCH to the merged-axis kernel (kron(E, I) on a 256 axis), not the
    slice-and-stack fallback (the 29q OOM driver). Pure dispatch check —
    the kernel is stubbed out; numerics live in the slow tier
    (test_merged_tiny_top_group_paths)."""
    from dqc_tpu.ops import planes as pln

    n = 22
    j = 3
    seen = {}

    def stub(vxr, vxi, er, ei, **kw):
        seen["X"] = vxr.shape[1]
        seen["op"] = er.shape
        return vxr, vxi

    orig = pln.high_group_apply_planes
    pln.high_group_apply_planes = stub
    try:
        shape = (1 << (n - 14), 128, 128)
        xr = jnp.zeros(shape, jnp.float32)
        E = jnp.eye(2, dtype=jnp.complex64)
        pln.apply_high(xr, xr, E, j, n, interpret=True)
    finally:
        pln.high_group_apply_planes = orig
    # merged view: the 1-bit top group rides on the 128-dim group below it
    assert seen["X"] == 256 and seen["op"] == (256, 256), seen


@pytest.mark.slow
def test_merged_tiny_top_group_paths():
    """n=22 -> groups (7,7,7,1): dense apply / backward / Gram on the 1-bit
    top group must take the merged-axis kernel (kron(E, I) on a 256 axis),
    not the slice-and-stack fallback (the 29q OOM driver). Slow tier: the
    n=22 interpret-mode kernels are the heaviest default-suite item
    (~56 s); the fast dispatch assertion above runs by default."""
    from dqc_tpu.ops import planes as pln

    n = 22
    j = 3
    rng = np.random.default_rng(31)
    psi = oracles.random_state(rng, n).astype(np.complex64)
    bwd = oracles.random_state(rng, n).astype(np.complex64)
    E = oracles.random_unitary(rng, 1).astype(np.complex64)
    Einv = np.linalg.inv(E).astype(np.complex64)

    t = gr.to_grouped(jnp.asarray(psi), n)
    want_apply = gr.apply_group_matrix(t, jnp.asarray(E), j)
    want_gram = gr.group_gram(t, j)

    shape = (1 << (n - 14), 128, 128)
    xr = jnp.asarray(psi.real.reshape(shape))
    xi = jnp.asarray(psi.imag.reshape(shape))

    yr, yi = pln.apply_high(xr, xi, jnp.asarray(E), j, n, interpret=True)
    got = (np.asarray(yr) + 1j * np.asarray(yi)).reshape(-1)
    np.testing.assert_allclose(got, np.asarray(want_apply).reshape(-1),
                               rtol=3e-5, atol=3e-5)

    got_gram = np.asarray(pln.gram_axis(xr, xi, j, n, interpret=True))
    np.testing.assert_allclose(got_gram, np.asarray(want_gram),
                               rtol=3e-5, atol=2e-3)


@pytest.mark.slow
def test_merged_tiny_top_backward():
    """Backward/T0 on the merged (top, top-1) axis (slow tier: the n=22
    interpret-mode adjoint is the heaviest single kernel test)."""
    from dqc_tpu.ops import planes as pln

    n = 22
    j = 3
    rng = np.random.default_rng(31)
    psi = oracles.random_state(rng, n).astype(np.complex64)
    bwd = oracles.random_state(rng, n).astype(np.complex64)
    E = oracles.random_unitary(rng, 1).astype(np.complex64)
    Einv = np.linalg.inv(E).astype(np.complex64)

    t = gr.to_grouped(jnp.asarray(psi), n)
    shape = (1 << (n - 14), 128, 128)
    xr = jnp.asarray(psi.real.reshape(shape))
    xi = jnp.asarray(psi.imag.reshape(shape))

    # backward: fwd_in = Einv fwd_out; bwd' = E^T bwd; T0 = pair-gram
    t_b = gr.to_grouped(jnp.asarray(bwd), n)
    want_fi = gr.apply_group_matrix(t, jnp.asarray(Einv), j)
    want_bn = gr.apply_group_matrix(t_b, jnp.asarray(E).T, j)
    want_t0 = gr.group_pair_gram(want_fi, t_b, j)

    br = jnp.asarray(bwd.real.reshape(shape))
    bi = jnp.asarray(bwd.imag.reshape(shape))
    fr, fi_, bnr, bni, T0 = pln.backward_block(
        xr, xi, br, bi, jnp.asarray(Einv), jnp.asarray(E), j, n,
        interpret=True)
    np.testing.assert_allclose(
        (np.asarray(fr) + 1j * np.asarray(fi_)).reshape(-1),
        np.asarray(want_fi).reshape(-1), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(
        (np.asarray(bnr) + 1j * np.asarray(bni)).reshape(-1),
        np.asarray(want_bn).reshape(-1), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(T0), np.asarray(want_t0),
                               rtol=2e-4, atol=5e-3)


@pytest.mark.parametrize("x_top", [2, 4])
def test_merged_fact_kernels_match_expanded(x_top):
    """Kronecker-factorized hpair kernels vs the expanded merged sweep on
    synthetic plane shapes: forward apply, adjoint planes, and the
    T0_top/T0_low pair-gram restrictions (the exact quantities
    plane_scan._backward_hpair extracts from the merged gram T0m)."""
    from dqc_tpu.ops.pallas.block_backward import (
        block_backward_high, block_backward_merged_fact)
    from dqc_tpu.ops.pallas.high_apply import (
        high_group_apply_planes, merged_fact_apply_planes)

    rng = np.random.default_rng(5 + x_top)
    Xl, A1, M = 16, 2, 128
    XX = x_top * Xl
    Et = oracles.random_unitary(rng, x_top.bit_length() - 1)
    El = oracles.random_unitary(rng, 4).astype(np.complex64)
    Et = Et.astype(np.complex64)
    Em = np.kron(Et, El)
    Eti = np.linalg.inv(Et).astype(np.complex64)
    Eli = np.linalg.inv(El).astype(np.complex64)
    Emi = np.kron(Eti, Eli)

    def planes(c):
        return (jnp.asarray(np.ascontiguousarray(c.real).astype(np.float32)),
                jnp.asarray(np.ascontiguousarray(c.imag).astype(np.float32)))

    x = (rng.normal(size=(A1, XX, M, 128))
         + 1j * rng.normal(size=(A1, XX, M, 128))).astype(np.complex64)
    b = (rng.normal(size=(A1, XX, M, 128))
         + 1j * rng.normal(size=(A1, XX, M, 128))).astype(np.complex64)
    xr, xi = planes(x)
    br, bi = planes(b)

    yr1, yi1 = merged_fact_apply_planes(xr, xi, *planes(El), *planes(Et),
                                        x_top=x_top, alias=False,
                                        interpret=True)
    yr2, yi2 = high_group_apply_planes(xr, xi, *planes(Em), alias=False,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(yr1), np.asarray(yr2),
                               rtol=1e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(yi1), np.asarray(yi2),
                               rtol=1e-5, atol=2e-5)

    f1 = block_backward_merged_fact(yr1, yi1, br, bi, *planes(Eli),
                                    *planes(El), *planes(Eti), *planes(Et),
                                    x_top=x_top, interpret=True)
    f2 = block_backward_high(yr2, yi2, br, bi, *planes(Emi), *planes(Em),
                             interpret=True)
    for a, c in zip(f1[:4], f2[:4]):  # fwd_in / bwd_out planes
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=5e-5)
    T0m = (np.asarray(f2[4]) + 1j * np.asarray(f2[5])).reshape(
        x_top, Xl, x_top, Xl)
    want_top = np.einsum("ab,xayb->xy", El, T0m)
    want_low = np.einsum("ed,exdy->xy", Et, T0m)
    got_top = np.asarray(f1[4]) + 1j * np.asarray(f1[5])
    got_low = np.asarray(f1[6]) + 1j * np.asarray(f1[7])
    np.testing.assert_allclose(got_top, want_top, rtol=2e-5,
                               atol=2e-5 * np.abs(want_top).max())
    np.testing.assert_allclose(got_low, want_low, rtol=2e-5,
                               atol=2e-5 * np.abs(want_low).max())


def test_apply_conj_acc_modes():
    """conj/acc kernel modes: acc' = acc + conj(E x), acc aliased in place,
    x preserved — the one-accumulator density-seed pattern."""
    from dqc_tpu.ops import planes as pln

    n = 16
    rng = np.random.default_rng(41)
    psi = oracles.random_state(rng, n).astype(np.complex64)
    acc0 = oracles.random_state(rng, n).astype(np.complex64)
    shape = (4, 128, 128)
    xr = jnp.asarray(psi.real.reshape(shape))
    xi = jnp.asarray(psi.imag.reshape(shape))
    t = gr.to_grouped(jnp.asarray(psi), n)

    for j, gbits in ((0, 7), (1, 7), (2, 2)):
        E = oracles.random_unitary(rng, gbits).astype(np.complex64)
        want = np.asarray(acc0).reshape(shape) + np.conj(
            np.asarray(gr.apply_group_matrix(t, jnp.asarray(E), j))
        ).reshape(shape)
        ar = jnp.asarray(acc0.real.reshape(shape))
        ai = jnp.asarray(acc0.imag.reshape(shape))
        yr, yi = pln.apply_block(xr, xi, jnp.asarray(E), j, n,
                                 alias=False, conj=True, acc=(ar, ai),
                                 interpret=True)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)
        # conj without acc
        yr2, yi2 = pln.apply_block(xr, xi, jnp.asarray(E), j, n,
                                   alias=False, conj=True, interpret=True)
        got2 = np.asarray(yr2) + 1j * np.asarray(yi2)
        np.testing.assert_allclose(got2, want - np.asarray(acc0).reshape(shape),
                                   rtol=3e-5, atol=3e-5)


def _rnd_tabs(rng, A):
    def rnd(shape):
        ph = np.exp(1j * rng.uniform(0, 2 * np.pi, shape))
        return (ph * (1.0 + 0.1 * rng.standard_normal(shape))).astype(np.complex64)
    return rnd((128, 128)), rnd((A, 128)), rnd((A, 128))


def _tab_planes(ts):
    out = []
    for t in ts:
        out.append(jnp.asarray(t.real.copy()))
        out.append(jnp.asarray(t.imag.copy()))
    return tuple(out)


def test_dual_apply_with_fused_diag_run():
    """Forward fold: y = Dual(D o x) in one kernel pass."""
    from dqc_tpu.ops.pallas.dual_apply import dual_group_apply_planes

    n = 16
    A = 4
    rng = np.random.default_rng(51)
    psi = oracles.random_state(rng, n).astype(np.complex64).reshape(A, 128, 128)
    el = oracles.random_unitary(rng, 7).astype(np.complex64)
    em = oracles.random_unitary(rng, 7).astype(np.complex64)
    tsl, tas, tal = _rnd_tabs(rng, A)
    D = tas[:, :, None] * tal[:, None, :] * tsl[None, :, :]

    want = np.einsum("xy,ayc->axc", em,
                     np.einsum("amy,xy->amx", psi * D, el))
    yr, yi = dual_group_apply_planes(
        jnp.asarray(psi.real), jnp.asarray(psi.imag),
        jnp.asarray(el.real), jnp.asarray(el.imag),
        jnp.asarray(em.real), jnp.asarray(em.imag),
        a_blk=2, diag_tables=_tab_planes((tsl, tas, tal)), interpret=True)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("diag_q", [False, True])
def test_block_backward_dual_with_fused_diag(diag_q):
    """Backward fold: reverse the dual pair, then roll (fwd, bwd) through
    the preceding diagonal run with Q reductions — one kernel pass."""
    from dqc_tpu.ops.pallas.block_backward import block_backward_dual

    n = 16
    A = 4
    rng = np.random.default_rng(52)
    fwd = oracles.random_state(rng, n).astype(np.complex64).reshape(A, 128, 128)
    bwd = oracles.random_state(rng, n).astype(np.complex64).reshape(A, 128, 128)
    E0 = oracles.random_unitary(rng, 7).astype(np.complex64)
    E1 = oracles.random_unitary(rng, 7).astype(np.complex64)
    E0inv = np.linalg.inv(E0).astype(np.complex64)
    E1inv = np.linalg.inv(E1).astype(np.complex64)
    tsl, tas, tal = _rnd_tabs(rng, A)
    D = tas[:, :, None] * tal[:, None, :] * tsl[None, :, :]

    # sequential oracle, tape order [diag, lane, sublane] reversed:
    f1 = np.einsum("xy,ayc->axc", E1inv, fwd)       # sublane uncompute
    t0s = np.einsum("axc,ayc->xy", bwd, f1)
    b1 = np.einsum("xy,ayc->axc", E1.T, bwd)
    f0 = np.einsum("amy,xy->amx", f1, E0inv)        # lane uncompute
    t0l = np.einsum("amx,amy->xy", b1, f0)
    b0 = np.einsum("amy,xy->amx", b1, E0.T)         # lane transport E0^T
    Q = b0 * f0
    f_fin = f0 / D
    b_fin = b0 * D

    def sp(m):
        return jnp.asarray(m.real.copy()), jnp.asarray(m.imag.copy())

    out = block_backward_dual(
        jnp.asarray(fwd.real), jnp.asarray(fwd.imag),
        jnp.asarray(bwd.real), jnp.asarray(bwd.imag),
        *sp(E0inv), *sp(E0), *sp(E1inv), *sp(E1),
        g0_first=True, a_blk=2,
        diag_inv_tables=_tab_planes((1 / tsl, 1 / tas, 1 / tal)),
        diag_tables=_tab_planes((tsl, tas, tal)),
        diag_q=diag_q, interpret=True)
    got_f = np.asarray(out[0]) + 1j * np.asarray(out[1])
    got_b = np.asarray(out[2]) + 1j * np.asarray(out[3])
    got_t0l = np.asarray(out[4]) + 1j * np.asarray(out[5])
    got_t0s = np.asarray(out[6]) + 1j * np.asarray(out[7])
    np.testing.assert_allclose(got_f, f_fin, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got_b, b_fin, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got_t0l, t0l, rtol=2e-4, atol=5e-3)
    np.testing.assert_allclose(got_t0s, t0s, rtol=2e-4, atol=5e-3)
    if diag_q:
        np.testing.assert_allclose(np.asarray(out[8]) + 1j * np.asarray(out[9]),
                                   Q.sum(axis=0), rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(np.asarray(out[10]) + 1j * np.asarray(out[11]),
                                   Q.sum(axis=2), rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(np.asarray(out[12]) + 1j * np.asarray(out[13]),
                                   Q.sum(axis=1), rtol=1e-3, atol=1e-2)


def test_multi_term_cross_kernels():
    """One-pass dense cross-group sweeps (dual multi-term + high+lane
    multi-term) vs the dense-operator oracle, incl. conj/acc seed mode."""
    from dqc_tpu.circuit.plane_scan import (
        _apply_dense_cross, _dense_cross_expanded_terms)
    from dqc_tpu.ops import planes as pln

    rng = np.random.default_rng(53)

    # (0, 1) minor-minor pair at n=16; (0, 2) lane-high pairs at n=17
    # (n=17 -> X=8 meets the kernel minimum; tiny-X pairs fall back)
    for positions, n in (((7, 3), 16), ((3, 14), 17), ((14, 3), 17)):
        psi = oracles.random_state(rng, n).astype(np.complex64)
        shape = (1 << (n - 14), 128, 128)
        xr = jnp.asarray(psi.real.reshape(shape))
        xi = jnp.asarray(psi.imag.reshape(shape))
        G = oracles.random_unitary(rng, 2).astype(np.complex64)
        terms = _dense_cross_expanded_terms(jnp.asarray(G), positions, n)
        fused = pln.apply_cross_terms(xr, xi, terms, n, alias=False,
                                      interpret=True)
        assert fused is not None, positions
        t = gr.to_grouped(jnp.asarray(psi), n)
        want = gr.from_grouped(gr.apply_dense(t, jnp.asarray(G), positions, n))
        got = (np.asarray(fused[0]) + 1j * np.asarray(fused[1])).reshape(-1)
        np.testing.assert_allclose(got, np.asarray(want).reshape(-1),
                                   rtol=4e-5, atol=4e-5)

        # seed mode: acc + conj(G x), acc aliased, x preserved
        acc0 = oracles.random_state(rng, n).astype(np.complex64)
        ar = jnp.asarray(acc0.real.reshape(shape))
        ai = jnp.asarray(acc0.imag.reshape(shape))
        sr, si = pln.apply_cross_terms(xr, xi, terms, n, conj=True,
                                       acc=(ar, ai), interpret=True)
        want_seed = acc0 + np.conj(np.asarray(want).reshape(-1))
        got_seed = (np.asarray(sr) + 1j * np.asarray(si)).reshape(-1)
        np.testing.assert_allclose(got_seed, want_seed, rtol=4e-5, atol=4e-5)

    # CNOT: pruned Schmidt (2 terms), via the _apply_dense_cross dispatcher
    n = 16
    psi = oracles.random_state(rng, n).astype(np.complex64)
    xr = jnp.asarray(psi.real.reshape(4, 128, 128))
    xi = jnp.asarray(psi.imag.reshape(4, 128, 128))
    cx = np.asarray(
        np.eye(4, dtype=np.complex64)[[0, 1, 3, 2]], np.complex64)
    yr, yi = _apply_dense_cross(xr, xi, jnp.asarray(cx), (7, 6), n, True,
                                alias=False)
    t = gr.to_grouped(jnp.asarray(psi), n)
    want = gr.from_grouped(gr.apply_dense(t, jnp.asarray(cx), (7, 6), n))
    got = (np.asarray(yr) + 1j * np.asarray(yi)).reshape(-1)
    np.testing.assert_allclose(got, np.asarray(want).reshape(-1),
                               rtol=4e-5, atol=4e-5)


def test_cross_span_shapes():
    """One-pass span-view dense cross gates (pl.apply_cross_span) vs the
    grouped-engine reference: (sublane, high), (high, high), all-high
    3-bit spans, (lane, A-bit), order swaps, and the conj/acc seed and
    out_dtype storage modes."""
    from dqc_tpu.ops import planes as pln

    rng = np.random.default_rng(77)
    cases = [
        (15, (13, 14)),     # sublane-high (the qubit 13-14 ladder boundary)
        (15, (14, 13)),     # positions order swap
        (15, (3, 14)),      # lane + A bit
        (16, (15, 14)),     # two A bits
        (17, (16, 14)),     # A bits with a gap
        (17, (16, 15, 14)),  # 3-bit all-high span (>2 groups at scale)
        (16, (15, 14, 9)),  # 2 A bits + sublane
        (16, (15, 14, 3)),  # 2 A bits + lane
        (15, (14, 8, 9)),   # A bit + 2 sublane bits (sub-8 M tile)
    ]
    for n, pos in cases:
        psi = oracles.random_state(rng, n).astype(np.complex64)
        shape = (1 << (n - 14), 128, 128)
        xr = jnp.asarray(psi.real.reshape(shape))
        xi = jnp.asarray(psi.imag.reshape(shape))
        G = oracles.random_gate(rng, len(pos)).astype(np.complex64)
        assert pln.cross_span_eligible(pos, n), (n, pos)
        got = pln.apply_cross_span(xr, xi, G, pos, n, alias=False,
                                   interpret=True)
        t = gr.to_grouped(jnp.asarray(psi), n)
        want = np.asarray(
            gr.from_grouped(gr.apply_dense(t, jnp.asarray(G), pos, n)))
        gc = (np.asarray(got[0]) + 1j * np.asarray(got[1])).reshape(-1)
        np.testing.assert_allclose(gc, want, rtol=4e-5, atol=4e-5 * np.abs(want).max())

    # ineligible shapes fall through to the other paths
    assert not pln.cross_span_eligible((6, 7), 16)        # minor-minor
    assert not pln.cross_span_eligible((13, 14), 14)      # no A axis
    assert not pln.cross_span_eligible((7, 22), 23)       # span > 8 bits

    # seed mode: acc + conj(G x), acc aliased, x preserved; and a fresh
    # reduced-storage accumulator (out_dtype)
    n, pos = 15, (13, 14)
    psi = oracles.random_state(rng, n).astype(np.complex64)
    shape = (2, 128, 128)
    xr = jnp.asarray(psi.real.reshape(shape))
    xi = jnp.asarray(psi.imag.reshape(shape))
    G = oracles.random_gate(rng, 2).astype(np.complex64)
    t = gr.to_grouped(jnp.asarray(psi), n)
    want = np.asarray(
        gr.from_grouped(gr.apply_dense(t, jnp.asarray(G), pos, n)))
    acc0 = oracles.random_state(rng, n).astype(np.complex64)
    sr, si = pln.apply_cross_span(
        xr, xi, G, pos, n, conj=True,
        acc=(jnp.asarray(acc0.real.reshape(shape)),
             jnp.asarray(acc0.imag.reshape(shape))), interpret=True)
    got_seed = (np.asarray(sr) + 1j * np.asarray(si)).reshape(-1)
    np.testing.assert_allclose(got_seed, acc0 + np.conj(want), rtol=4e-5,
                               atol=4e-5 * np.abs(want).max())

    br, bi = pln.apply_cross_span(xr, xi, G, pos, n, conj=True,
                                  out_dtype=jnp.bfloat16, interpret=True)
    assert br.dtype == jnp.bfloat16
    got_b = (np.asarray(br, np.float32) + 1j * np.asarray(bi, np.float32)).reshape(-1)
    np.testing.assert_allclose(got_b, np.conj(want), rtol=3e-2,
                               atol=3e-2 * np.abs(want).max())


def test_backward_cross_span():
    """One-pass fused adjoint for span-eligible dense cross gates
    (pl.backward_cross_span) vs the separate uncompute / pair-grad /
    transport reference on the grouped engine."""
    from dqc_tpu.ops import planes as pln

    rng = np.random.default_rng(99)
    cases = [
        (15, (13, 14)),
        (15, (14, 13)),     # order swap exercises the W un-permute
        (16, (15, 14)),
        (17, (16, 14)),
        (17, (16, 15, 14)),
        (15, (14, 8, 9)),
    ]
    for n, pos in cases:
        k = len(pos)
        psi_f = oracles.random_state(rng, n).astype(np.complex64)
        psi_b = oracles.random_state(rng, n).astype(np.complex64)
        G = oracles.random_unitary(rng, k).astype(np.complex64)
        Ginv = np.conj(G.T)
        assert pln.backward_span_eligible(pos, n), (n, pos)

        shape = (1 << (n - 14), 128, 128)
        fxr = jnp.asarray(psi_f.real.reshape(shape))
        fxi = jnp.asarray(psi_f.imag.reshape(shape))
        bxr = jnp.asarray(psi_b.real.reshape(shape))
        bxi = jnp.asarray(psi_b.imag.reshape(shape))
        out = pln.backward_cross_span(fxr, fxi, bxr, bxi, G, Ginv, pos, n,
                                      interpret=True)
        assert out is not None
        fr, fi, br, bi, W = out

        # reference: grouped-engine uncompute + transport; dense pair-grad
        t = gr.to_grouped(jnp.asarray(psi_f), n)
        f_in = np.asarray(
            gr.from_grouped(gr.apply_dense(t, jnp.asarray(Ginv), pos, n)))
        tb = gr.to_grouped(jnp.asarray(psi_b), n)
        b_out = np.asarray(
            gr.from_grouped(gr.apply_dense(tb, jnp.asarray(G.T), pos, n)))
        # W[p, q] = sum_b bwd[p, b] fwd_in[q, b] over subblocks
        F = np.asarray(gr.subblocks(
            jnp.asarray(f_in.reshape(gr.group_dims(n))), pos, n))
        B = np.asarray(gr.subblocks(
            jnp.asarray(psi_b.reshape(gr.group_dims(n))), pos, n))
        W_want = B @ F.T

        got_f = (np.asarray(fr) + 1j * np.asarray(fi)).reshape(-1)
        got_b = (np.asarray(br) + 1j * np.asarray(bi)).reshape(-1)
        tol = dict(rtol=4e-5, atol=4e-5)
        np.testing.assert_allclose(got_f, f_in, **tol)
        np.testing.assert_allclose(got_b, b_out, **tol)
        np.testing.assert_allclose(np.asarray(W), W_want, rtol=2e-4,
                                   atol=2e-4 * np.abs(W_want).max())

    # lane shapes have no fused adjoint (multi-term backward not built)
    assert not pln.backward_span_eligible((3, 14), 15)
    assert pln.backward_cross_span(
        jnp.zeros((2, 128, 128)), jnp.zeros((2, 128, 128)),
        jnp.zeros((2, 128, 128)), jnp.zeros((2, 128, 128)),
        np.eye(4, dtype=np.complex64), np.eye(4, dtype=np.complex64),
        (3, 14), 15) is None


def _dh_synth(rng, A1, X, post):
    """Synthetic diag-run tables + view tables for a (A1, X, post*128, 128)
    high-view block (no real qubit count needed — the kernel only sees the
    view geometry)."""
    A = A1 * X * post
    tsl = (rng.standard_normal((128, 128))
           + 1j * rng.standard_normal((128, 128))).astype(np.complex64)
    tas = (rng.standard_normal((A, 128))
           + 1j * rng.standard_normal((A, 128))).astype(np.complex64)
    tal = (rng.standard_normal((A, 128))
           + 1j * rng.standard_normal((A, 128))).astype(np.complex64)
    v = (A1, X, post, 128)
    view = (jnp.asarray(tsl.real), jnp.asarray(tsl.imag),
            jnp.asarray(tas.real.reshape(v)), jnp.asarray(tas.imag.reshape(v)),
            jnp.asarray(tal.real.reshape(v)), jnp.asarray(tal.imag.reshape(v)))
    # dense D[a, s, l] for the numpy oracle, on the (A1, X, post, 128, 128)
    # element view (a = (i*X + x)*post + p)
    D = (tas[:, :, None] * tal[:, None, :] * tsl[None, :, :]).reshape(
        A1, X, post, 128, 128)
    return view, D


@pytest.mark.parametrize("diag_first", [True, False])
def test_high_apply_with_fused_diag(diag_first):
    """dhigh forward kernel (diag run folded into a high-group sweep) vs a
    numpy oracle on a view with pre > 1 and post > 1 — exercises the
    per-cell a-table BlockSpec indexing (common.dh_table_specs)."""
    from dqc_tpu.ops.pallas.high_apply import high_group_apply_planes

    rng = np.random.default_rng(5)
    A1, X, post = 2, 8, 2
    M = post * 128
    x = (rng.standard_normal((A1, X, M, 128))
         + 1j * rng.standard_normal((A1, X, M, 128))).astype(np.complex64)
    E = oracles.random_unitary(rng, 3).astype(np.complex64)
    view, D = _dh_synth(rng, A1, X, post)

    x5 = x.reshape(A1, X, post, 128, 128).astype(np.complex128)
    if diag_first:
        want = np.einsum("xy,iypsl->ixpsl", E.astype(np.complex128),
                         D * x5)
    else:
        want = D * np.einsum("xy,iypsl->ixpsl", E.astype(np.complex128), x5)
    want = want.reshape(x.shape)

    yr, yi = high_group_apply_planes(
        jnp.asarray(x.real), jnp.asarray(x.imag),
        jnp.asarray(E.real), jnp.asarray(E.imag),
        diag=view, diag_first=diag_first, interpret=True)
    got = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("diag_first_fwd,m_blk", [(True, 8), (False, 8),
                                                  (True, 128)])
def test_block_backward_high_with_fused_diag(diag_first_fwd, m_blk):
    """dhigh one-pass adjoint vs numpy: uncompute, transport, the dense T0
    pair-gram and the run's Q reductions (diag.py semantics). m_blk=128 at
    X=32 forces the chunked in-kernel path (n_chunks > 1)."""
    from dqc_tpu.ops.pallas.block_backward import block_backward_high

    rng = np.random.default_rng(7)
    if m_blk == 128:
        A1, X, post = 1, 32, 1
        kq = 5
    else:
        A1, X, post = 2, 8, 2
        kq = 3
    M = post * 128
    shp = (A1, X, M, 128)
    f = (rng.standard_normal(shp) + 1j * rng.standard_normal(shp)).astype(
        np.complex64)
    b = (rng.standard_normal(shp) + 1j * rng.standard_normal(shp)).astype(
        np.complex64)
    E = oracles.random_unitary(rng, kq).astype(np.complex64)
    Einv = np.conj(E.T)
    view, D = _dh_synth(rng, A1, X, post)
    # inverse view tables: invert each factor table elementwise
    tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i = view

    def inv_pair(r, i):
        c = 1.0 / (np.asarray(r, np.complex128) + 1j * np.asarray(i))
        return (jnp.asarray(c.real.astype(np.float32)),
                jnp.asarray(c.imag.astype(np.float32)))

    isl_r, isl_i = inv_pair(tsl_r, tsl_i)
    ias_r, ias_i = inv_pair(tas_r, tas_i)
    ial_r, ial_i = inv_pair(tal_r, tal_i)
    view_inv = (isl_r, isl_i, ias_r, ias_i, ial_r, ial_i)

    out = block_backward_high(
        jnp.asarray(f.real), jnp.asarray(f.imag),
        jnp.asarray(b.real), jnp.asarray(b.imag),
        jnp.asarray(Einv.real), jnp.asarray(Einv.imag),
        jnp.asarray(E.real), jnp.asarray(E.imag),
        m_blk=m_blk, diag_inv_tables=view_inv, diag_tables=view,
        diag_first_fwd=diag_first_fwd, diag_q=True, interpret=True)

    f5 = f.reshape(A1, X, post, 128, 128).astype(np.complex128)
    b5 = b.reshape(A1, X, post, 128, 128).astype(np.complex128)
    Ec = E.astype(np.complex128)

    def app(op, t):
        return np.einsum("xy,iypsl->ixpsl", op, t)

    if diag_first_fwd:
        # forward was y = E (D x): dense stage first on the way back
        fir = app(np.conj(Ec.T), f5)          # = D x
        bn = app(Ec.T, b5)                    # transported
        T0 = np.einsum("ixpsl,iypsl->xy", b5, fir)
        Q = bn * fir
        f_out = fir / D
        b_out = bn * D
    else:
        # forward was y = D (E x): diag stage first
        Q = b5 * f5
        fp = f5 / D
        bp = b5 * D
        fir = app(np.conj(Ec.T), fp)
        T0 = np.einsum("ixpsl,iypsl->xy", bp, fir)
        f_out = fir
        b_out = app(Ec.T, bp)

    got_f = (np.asarray(out[0], np.float64)
             + 1j * np.asarray(out[1], np.float64))
    got_b = (np.asarray(out[2], np.float64)
             + 1j * np.asarray(out[3], np.float64))
    got_t0 = np.asarray(out[4], np.float64) + 1j * np.asarray(out[5],
                                                              np.float64)
    np.testing.assert_allclose(got_f, f_out.reshape(shp), rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(got_b, b_out.reshape(shp), rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(got_t0, T0, rtol=2e-3, atol=2e-3)

    A = A1 * X * post
    qsl = np.asarray(out[6], np.float64) + 1j * np.asarray(out[7], np.float64)
    # raw kernel layouts (common.dh_table_views): qas (A1, post, k, X,
    # m_blk), qal (A1, post, X, 128) -> canonical (A, 128)
    qas = (np.asarray(out[8], np.float64)
           + 1j * np.asarray(out[9], np.float64)).transpose(
               0, 3, 1, 2, 4).reshape(A, 128)
    qal = (np.asarray(out[10], np.float64)
           + 1j * np.asarray(out[11], np.float64)).transpose(
               0, 2, 1, 3).reshape(A, 128)
    Qa = Q.reshape(A, 128, 128)
    np.testing.assert_allclose(qsl, Qa.sum(axis=0), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(qas, Qa.sum(axis=2), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(qal, Qa.sum(axis=1), rtol=2e-3, atol=2e-3)


def test_block_backward_high_fused_diag_bf16_storage():
    """dhigh adjoint with REDUCED-storage plane refs (bf16 in/out, f32
    in-kernel compute — the 30q mixed-storage mode): matches the same
    kernel on f32 refs to bf16 rounding."""
    from dqc_tpu.ops.pallas.block_backward import block_backward_high

    rng = np.random.default_rng(9)
    A1, X, post = 1, 8, 1
    M = post * 128
    shp = (A1, X, M, 128)
    f = (rng.standard_normal(shp) + 1j * rng.standard_normal(shp)).astype(
        np.complex64)
    b = (rng.standard_normal(shp) + 1j * rng.standard_normal(shp)).astype(
        np.complex64)
    E = oracles.random_unitary(rng, 3).astype(np.complex64)
    Einv = np.conj(E.T)
    view, _ = _dh_synth(rng, A1, X, post)
    tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i = view

    def inv_pair(r, i):
        c = 1.0 / (np.asarray(r, np.complex128) + 1j * np.asarray(i))
        return (jnp.asarray(c.real.astype(np.float32)),
                jnp.asarray(c.imag.astype(np.float32)))

    view_inv = (*inv_pair(tsl_r, tsl_i), *inv_pair(tas_r, tas_i),
                *inv_pair(tal_r, tal_i))
    view_inv = (view_inv[0], view_inv[1], view_inv[2], view_inv[3],
                view_inv[4], view_inv[5])

    def run(dtype_b):
        return block_backward_high(
            jnp.asarray(f.real), jnp.asarray(f.imag),
            jnp.asarray(b.real).astype(dtype_b),
            jnp.asarray(b.imag).astype(dtype_b),
            jnp.asarray(Einv.real), jnp.asarray(Einv.imag),
            jnp.asarray(E.real), jnp.asarray(E.imag),
            diag_inv_tables=view_inv, diag_tables=view,
            diag_first_fwd=True, diag_q=True, interpret=True)

    ref = run(jnp.float32)
    red = run(jnp.bfloat16)
    # bwd refs stay bf16 on the way out; fwd refs f32
    assert red[2].dtype == jnp.bfloat16 and red[0].dtype == jnp.float32
    for i in (0, 1):   # fwd uncompute: inputs identical, rounding only via
        np.testing.assert_allclose(          # the bf16 b-side ops -> none
            np.asarray(red[i]), np.asarray(ref[i]), rtol=1e-5, atol=1e-5)
    for i in (2, 3, 4, 5):  # transported bwd + T0: bf16-rounded inputs
        r = np.asarray(ref[i], np.float32)
        np.testing.assert_allclose(
            np.asarray(red[i], np.float32), r,
            rtol=0.1, atol=0.02 * np.abs(r).max())
