"""On-hardware Pallas kernel regression tests (marked ``tpu``).

The default CPU suite exercises these kernels in interpret mode only
(tests/test_pallas.py, test_plane_scan.py); a Mosaic lowering regression
would surface only in bench runs. This module runs each kernel compiled on
the real chip against numpy oracles. Run with:

    DQC_TEST_TPU=1 python -m pytest tests/test_tpu_kernels.py -m tpu -q

(one TPU job at a time; first compile ~30-90 s).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


def _tpu_available():
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


skip_no_tpu = pytest.mark.skipif(not _tpu_available(), reason="no TPU backend")


def rand_planes(rng, a=2):
    xr = rng.normal(size=(a, 128, 128)).astype(np.float32)
    xi = rng.normal(size=(a, 128, 128)).astype(np.float32)
    return jnp.asarray(xr), jnp.asarray(xi)


def rand_op(rng, d=128):
    m = (rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))) / np.sqrt(d)
    return m.astype(np.complex64)


def as_c(xr, xi):
    return np.asarray(xr).astype(np.complex64) + 1j * np.asarray(xi)


@skip_no_tpu
@pytest.mark.parametrize("dot_mode,tol", [("f32", 2e-5), ("bf16x3", 5e-4)])
def test_dual_apply_on_hardware(dot_mode, tol):
    from dqc_tpu.ops.pallas.dual_apply import dual_group_apply_planes

    rng = np.random.default_rng(0)
    xr, xi = rand_planes(rng)
    E0, E1 = rand_op(rng), rand_op(rng)
    yr, yi = dual_group_apply_planes(
        xr, xi,
        jnp.asarray(E0.real), jnp.asarray(E0.imag),
        jnp.asarray(E1.real), jnp.asarray(E1.imag),
        dot_mode=dot_mode)
    x = as_c(xr, xi)
    want = np.einsum("xy,ayc->axc", E1, np.einsum("amy,xy->amx", x, E0))
    got = as_c(yr, yi)
    np.testing.assert_allclose(got, want, rtol=0, atol=tol * np.abs(want).max())


@skip_no_tpu
def test_high_apply_on_hardware():
    from dqc_tpu.ops.pallas.high_apply import high_group_apply_planes

    rng = np.random.default_rng(1)
    xr = jnp.asarray(rng.normal(size=(2, 32, 256, 128)).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=(2, 32, 256, 128)).astype(np.float32))
    E = rand_op(rng, 32)
    yr, yi = high_group_apply_planes(xr, xi, jnp.asarray(E.real),
                                     jnp.asarray(E.imag), dot_mode="f32")
    x = as_c(xr, xi)
    want = np.einsum("xy,pymc->pxmc", E, x)
    np.testing.assert_allclose(as_c(yr, yi), want, rtol=0,
                               atol=2e-5 * np.abs(want).max())


@skip_no_tpu
@pytest.mark.parametrize("which", ["lane", "sublane", "high", "dual"])
def test_block_backward_on_hardware(which):
    from dqc_tpu.ops.pallas import block_backward as bb

    rng = np.random.default_rng(2)
    fr, fi = rand_planes(rng)
    br, bi = rand_planes(rng)
    E = rand_op(rng)
    Einv = np.linalg.inv(E)
    f = as_c(fr, fi)
    b = as_c(br, bi)

    def split(m):
        return jnp.asarray(m.real.copy()), jnp.asarray(m.imag.copy())

    if which == "lane":
        out = bb.block_backward_lane(fr, fi, br, bi, *split(Einv), *split(E),
                                     dot_mode="f32")
        f_in = np.einsum("xy,amy->amx", Einv, f)
        b_new = np.einsum("xy,amy->amx", E.T, b)
        t0 = np.einsum("amx,amy->xy", b, f_in)
    elif which == "sublane":
        out = bb.block_backward_sublane(fr, fi, br, bi, *split(Einv), *split(E),
                                        dot_mode="f32")
        f_in = np.einsum("xy,ayc->axc", Einv, f)
        b_new = np.einsum("xy,ayc->axc", E.T, b)
        t0 = np.einsum("axc,ayc->xy", b, f_in)
    elif which == "high":
        f4 = fr.reshape(1, 128, 2, 128)
        out = bb.block_backward_high(
            fr.reshape(1, 128, 2, 128), fi.reshape(1, 128, 2, 128),
            br.reshape(1, 128, 2, 128), bi.reshape(1, 128, 2, 128),
            *split(Einv), *split(E), dot_mode="f32")
        fh = f.reshape(1, 128, 2, 128)
        bh = b.reshape(1, 128, 2, 128)
        f_in = np.einsum("xy,pymc->pxmc", Einv, fh)
        b_new = np.einsum("xy,pymc->pxmc", E.T, bh)
        t0 = np.einsum("pxmc,pymc->xy", bh, f_in)
        # the kernel returns the (A1, X, M, 128) view it was given
    else:  # dual
        E1 = rand_op(rng)
        E1inv = np.linalg.inv(E1)
        out = bb.block_backward_dual(
            fr, fi, br, bi, *split(Einv), *split(E), *split(E1inv), *split(E1),
            g0_first=True, dot_mode="f32")
        # tape order [lane, sublane]: sublane uncomputed first
        f1 = np.einsum("xy,ayc->axc", E1inv, f)
        t0s = np.einsum("axc,ayc->xy", b, f1)
        b1 = np.einsum("xy,ayc->axc", E1.T, b)
        f_in = np.einsum("xy,amy->amx", Einv, f1)
        t0l = np.einsum("amx,amy->xy", b1, f_in)
        b_new = np.einsum("xy,amy->amx", E.T, b1)
        got_f = as_c(out[0], out[1])
        got_b = as_c(out[2], out[3])
        tol = 3e-5
        np.testing.assert_allclose(got_f, f_in, rtol=0, atol=tol * np.abs(f_in).max())
        np.testing.assert_allclose(got_b, b_new, rtol=0, atol=tol * np.abs(b_new).max())
        np.testing.assert_allclose(as_c(out[4], out[5]), t0l, rtol=0,
                                   atol=tol * np.abs(t0l).max())
        np.testing.assert_allclose(as_c(out[6], out[7]), t0s, rtol=0,
                                   atol=tol * np.abs(t0s).max())
        return

    tol = 3e-5
    np.testing.assert_allclose(as_c(out[0], out[1]), f_in, rtol=0,
                               atol=tol * np.abs(f_in).max())
    np.testing.assert_allclose(as_c(out[2], out[3]), b_new, rtol=0,
                               atol=tol * np.abs(b_new).max())
    np.testing.assert_allclose(as_c(out[4], out[5]), t0, rtol=0,
                               atol=tol * np.abs(t0).max())


@skip_no_tpu
@pytest.mark.parametrize("which", ["lane", "sublane", "high"])
def test_gram_on_hardware(which):
    from dqc_tpu.ops.pallas import gram as gk

    rng = np.random.default_rng(3)
    xr, xi = rand_planes(rng, a=4)
    x = as_c(xr, xi)

    if which == "lane":
        S, C = gk.gram_lane(xr, xi, dot_mode="f32")
        A = np.einsum("amx,amy->xy", np.asarray(xr), np.asarray(xr))
        B = np.einsum("amx,amy->xy", np.asarray(xi), np.asarray(xi))
        Cw = np.einsum("amx,amy->xy", np.asarray(xr), np.asarray(xi))
    elif which == "sublane":
        S, C = gk.gram_sublane(xr, xi, dot_mode="f32")
        A = np.einsum("axc,ayc->xy", np.asarray(xr), np.asarray(xr))
        B = np.einsum("axc,ayc->xy", np.asarray(xi), np.asarray(xi))
        Cw = np.einsum("axc,ayc->xy", np.asarray(xr), np.asarray(xi))
    else:
        x4r = xr.reshape(1, 16, 32, 128)
        x4i = xi.reshape(1, 16, 32, 128)
        S, C = gk.gram_high(x4r, x4i, dot_mode="f32")
        A = np.einsum("pxmc,pymc->xy", np.asarray(x4r), np.asarray(x4r))
        B = np.einsum("pxmc,pymc->xy", np.asarray(x4i), np.asarray(x4i))
        Cw = np.einsum("pxmc,pymc->xy", np.asarray(x4r), np.asarray(x4i))

    scale = np.abs(A + B).max()
    np.testing.assert_allclose(np.asarray(S), A + B, rtol=0, atol=3e-5 * scale)
    np.testing.assert_allclose(np.asarray(C), Cw, rtol=0, atol=3e-5 * scale)


def _dev_planes(key, shape):
    """Random planes generated ON DEVICE (the axon tunnel rejects host->
    device transfers of complex arrays and of large f32 buffers)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    return (jax.random.normal(k1, shape, jnp.float32),
            jax.random.normal(k2, shape, jnp.float32))


def _max_err(got, want):
    """max |got - want| fetched as ONE scalar (no big host fetches)."""
    return float(jnp.max(jnp.abs(got - want)))


@skip_no_tpu
def test_diag_run_kernels_on_hardware():
    """ONE jitted program (eager per-op remote compiles blow the budget);
    only scalar errors are fetched."""
    from dqc_tpu.ops import planes as pln

    rng = np.random.default_rng(5)
    A = 4

    def rnd(shape):
        ph = np.exp(1j * rng.uniform(0, 2 * np.pi, shape))
        return (ph * (1.0 + 0.1 * rng.standard_normal(shape))).astype(np.complex64)

    tsl, tas, tal = rnd((128, 128)), rnd((A, 128)), rnd((A, 128))
    cpx = jax.lax.complex  # x64-proof: 1j* promotes to C128 (no TPU support)

    @jax.jit
    def check():
        xr, xi = _dev_planes(5, (A, 128, 128))
        br, bi = _dev_planes(7, (A, 128, 128))

        def dev_c(t):
            return cpx(jnp.asarray(t.real.copy()), jnp.asarray(t.imag.copy()))

        Dj = dev_c(tas)[:, :, None] * dev_c(tal)[:, None, :] \
            * dev_c(tsl)[None, :, :]
        x = cpx(xr, xi)
        b = cpx(br, bi)
        Q = b * x
        yr, yi = pln.apply_diag_run(xr, xi, (tsl, tas, tal))
        fr, fi_, bnr, bni, Qk = pln.backward_diag_run(
            xr, xi, br, bi, (1 / tsl, 1 / tas, 1 / tal), (tsl, tas, tal),
            with_q=True)

        def me(got, want):
            return jnp.max(jnp.abs(got - want))

        return (me(cpx(yr, yi), x * Dj), me(cpx(fr, fi_), x / Dj),
                me(cpx(bnr, bni), b * Dj), me(Qk[0], Q.sum(axis=0)),
                me(Qk[1], Q.sum(axis=2)), me(Qk[2], Q.sum(axis=1)))

    errs = [float(e) for e in check()]
    assert errs[0] < 3e-4 and errs[1] < 3e-4 and errs[2] < 3e-4, errs
    assert errs[3] < 2e-2 and errs[4] < 2e-2 and errs[5] < 2e-2, errs


@skip_no_tpu
def test_merged_and_acc_modes_on_hardware():
    """n=22-style tiny top group via merged-axis kernel + conj/acc seed mode.
    All full-state data lives on device; only scalars are fetched."""
    from dqc_tpu.ops import groups as gr
    from dqc_tpu.ops import planes as pln

    n = 22
    rng = np.random.default_rng(6)
    cpx = jax.lax.complex  # x64-proof: 1j* promotes to C128 (no TPU support)
    shape = (1 << (n - 14), 128, 128)
    E = np.linalg.qr(rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2)))[0]
    E = E.astype(np.complex64)
    Mh = rand_op(rng)

    @jax.jit
    def check():
        xr, xi = _dev_planes(6, shape)
        ar0, ai0 = _dev_planes(8, shape)
        psi = cpx(xr, xi).reshape(-1)
        t = gr.to_grouped(psi, n)
        Ed = cpx(jnp.asarray(E.real.copy()), jnp.asarray(E.imag.copy()))
        want = gr.apply_group_matrix(t, Ed, 3).reshape(shape)
        yr, yi = pln.apply_high(xr, xi, E, 3, n)

        want_gram = gr.group_gram(t, 3)
        got_gram = pln.gram_axis(xr, xi, 3, n)

        # conj/acc seed mode on the lane axis: out = acc + conj(conj(M) psi)
        #                                          = acc + M conj(psi)
        M = cpx(jnp.asarray(Mh.real.copy()), jnp.asarray(Mh.imag.copy()))
        tm = gr.apply_group_matrix(gr.to_grouped(jnp.conj(psi), n), M, 0)
        want2 = cpx(ar0, ai0) + tm.reshape(shape)
        ar, ai = pln.apply_block(xr, xi, jnp.conj(M), 0, n, alias=False,
                                 conj=True, acc=(ar0, ai0))

        def me(got, want_):
            return jnp.max(jnp.abs(got - want_))

        return (me(cpx(yr, yi), want),
                me(got_gram, want_gram) / jnp.max(jnp.abs(want_gram)),
                me(cpx(ar, ai), want2))

    e_apply, e_gram, e_acc = (float(e) for e in check())
    assert e_apply < 3e-3, e_apply
    assert e_gram < 1e-4, e_gram
    assert e_acc < 3e-3, e_acc


@skip_no_tpu
def test_ddual_fused_kernels_on_hardware():
    """The diag-into-dual fused kernels compiled on the chip (Mosaic
    constraints differ from interpret mode: the (a_blk, 128) table blocks
    need a sublane dim divisible by 8). One jitted program, scalar fetches."""
    from dqc_tpu.ops.pallas.block_backward import block_backward_dual
    from dqc_tpu.ops.pallas.dual_apply import dual_group_apply_planes

    rng = np.random.default_rng(9)
    A = 16
    E0 = rand_op(rng)
    E1 = rand_op(rng)
    E0inv = np.linalg.inv(E0).astype(np.complex64)
    E1inv = np.linalg.inv(E1).astype(np.complex64)

    def rnd(shape):
        ph = np.exp(1j * rng.uniform(0, 2 * np.pi, shape))
        return (ph * (1.0 + 0.1 * rng.standard_normal(shape))).astype(np.complex64)

    tsl, tas, tal = rnd((128, 128)), rnd((A, 128)), rnd((A, 128))

    def tabs(ts):
        out = []
        for t in ts:
            out.append(jnp.asarray(t.real.copy()))
            out.append(jnp.asarray(t.imag.copy()))
        return tuple(out)

    def sp(mm):
        return jnp.asarray(mm.real.copy()), jnp.asarray(mm.imag.copy())

    cpx = jax.lax.complex

    @jax.jit
    def check():
        xr, xi = _dev_planes(12, (A, 128, 128))
        br, bi = _dev_planes(13, (A, 128, 128))
        x = cpx(xr, xi)
        b = cpx(br, bi)

        def dev_c(t):
            return cpx(jnp.asarray(t.real.copy()), jnp.asarray(t.imag.copy()))

        D = dev_c(tas)[:, :, None] * dev_c(tal)[:, None, :] \
            * dev_c(tsl)[None, :, :]
        E0d, E1d = dev_c(E0), dev_c(E1)
        E0invd, E1invd = dev_c(E0inv), dev_c(E1inv)

        HI = jax.lax.Precision.HIGHEST  # TPU einsum default is bf16

        # forward: y = E1 @ (D*x) @ E0^T (lane then sublane)
        want_f = jnp.einsum("xy,ayc->axc", E1d,
                            jnp.einsum("amy,xy->amx", x * D, E0d,
                                       precision=HI), precision=HI)
        yr, yi = dual_group_apply_planes(
            xr, xi, *sp(E0), *sp(E1), a_blk=8,
            diag_tables=tabs((tsl, tas, tal)))
        e_fwd = jnp.max(jnp.abs(cpx(yr, yi) - want_f))

        # backward with fused diag + Q
        f1 = jnp.einsum("xy,ayc->axc", E1invd, x, precision=HI)
        b1 = jnp.einsum("xy,ayc->axc", E1d.T, b, precision=HI)
        f0 = jnp.einsum("amy,xy->amx", f1, E0invd, precision=HI)
        b0 = jnp.einsum("amy,xy->amx", b1, E0d.T, precision=HI)
        Q = b0 * f0
        out = block_backward_dual(
            xr, xi, br, bi, *sp(E0inv), *sp(E0), *sp(E1inv), *sp(E1),
            g0_first=True, a_blk=8,
            diag_inv_tables=tabs((1 / tsl, 1 / tas, 1 / tal)),
            diag_tables=tabs((tsl, tas, tal)), diag_q=True)
        e_f = jnp.max(jnp.abs(cpx(out[0], out[1]) - f0 / D))
        e_b = jnp.max(jnp.abs(cpx(out[2], out[3]) - b0 * D))
        e_q = jnp.max(jnp.abs(cpx(out[8], out[9]) - Q.sum(axis=0)))
        return e_fwd, e_f, e_b, e_q

    e_fwd, e_f, e_b, e_q = (float(e) for e in check())
    assert e_fwd < 5e-3, e_fwd
    assert e_f < 5e-3, e_f
    assert e_b < 5e-3, e_b
    assert e_q < 5e-2, e_q


@skip_no_tpu
def test_cross_span_kernels_on_hardware():
    """Span-view dense cross-group gates compiled on the chip: forward
    (apply_cross_span, incl. a lane-factor shape) and the fused one-pass
    adjoint (backward_cross_span) vs numpy oracles."""
    from dqc_tpu.ops import planes as pln

    rng = np.random.default_rng(17)

    def rand_state(n):
        v = rng.standard_normal(1 << n) + 1j * rng.standard_normal(1 << n)
        return (v / np.linalg.norm(v)).astype(np.complex64)

    def rand_unitary(k):
        m = rng.standard_normal((1 << k, 1 << k)) + 1j * rng.standard_normal(
            (1 << k, 1 << k))
        q, _ = np.linalg.qr(m)
        return q.astype(np.complex64)

    def apply_np(state, g, pos, n):
        k = len(pos)
        t = state.reshape((2,) * n).astype(np.complex128)
        axes = [n - 1 - p for p in pos]
        gt = np.asarray(g).reshape((2,) * (2 * k)).astype(np.complex128)
        moved = np.moveaxis(t, axes, range(k))
        out = np.tensordot(gt, moved,
                           axes=(list(range(k, 2 * k)), list(range(k))))
        return np.moveaxis(out, range(k), axes).reshape(-1)

    n = 16
    shape = (1 << (n - 14), 128, 128)
    for pos in [(13, 14), (15, 14), (3, 14)]:
        st = rand_state(n)
        g = rand_unitary(len(pos))
        xr = jnp.asarray(np.ascontiguousarray(st.real.reshape(shape)))
        xi = jnp.asarray(np.ascontiguousarray(st.imag.reshape(shape)))
        got = pln.apply_cross_span(xr, xi, g, pos, n, alias=False)
        assert got is not None, pos
        gc = (np.asarray(got[0], np.float64)
              + 1j * np.asarray(got[1], np.float64)).reshape(-1)
        want = apply_np(st, g, pos, n)
        err = np.abs(gc - want).max() / np.abs(want).max()
        assert err < 5e-6, (pos, err)

    pos = (15, 14)
    f = rand_state(n)
    b = rand_state(n)
    g = rand_unitary(2)
    fr = jnp.asarray(np.ascontiguousarray(f.real.reshape(shape)))
    fi = jnp.asarray(np.ascontiguousarray(f.imag.reshape(shape)))
    br = jnp.asarray(np.ascontiguousarray(b.real.reshape(shape)))
    bi = jnp.asarray(np.ascontiguousarray(b.imag.reshape(shape)))
    out = pln.backward_cross_span(fr, fi, br, bi, g, np.conj(g.T), pos, n)
    assert out is not None
    nfr, nfi, nbr, nbi, W = out
    f_in = apply_np(f, np.conj(g.T), pos, n)
    b_out = apply_np(b, g.T, pos, n)
    got_f = (np.asarray(nfr, np.float64)
             + 1j * np.asarray(nfi, np.float64)).reshape(-1)
    got_b = (np.asarray(nbr, np.float64)
             + 1j * np.asarray(nbi, np.float64)).reshape(-1)
    assert np.abs(got_f - f_in).max() < 5e-6
    assert np.abs(got_b - b_out).max() < 5e-6
    # W oracle: subblock pair-gram over the 4 basis projections
    k = len(pos)
    W_want = np.zeros((1 << k, 1 << k), np.complex128)
    for p in range(1 << k):
        for q in range(1 << k):
            E = np.zeros((1 << k, 1 << k))
            E[p, q] = 1.0
            W_want[p, q] = np.vdot(np.conj(b), apply_np(f_in, E, pos, n))
    # fetch W via the real-pair boundary (axon cannot D2H complex arrays)
    Wp = np.asarray(jnp.stack([jnp.real(W), jnp.imag(W)]), np.float64)
    W_got = Wp[0] + 1j * Wp[1]
    assert np.abs(W_got - W_want).max() / np.abs(W_want).max() < 2e-4


@skip_no_tpu
def test_dual_multi_16_terms_on_hardware():
    """A traced k=4 dense cross gate with 2 bits in each minor group
    expands to 16 unpruned terms; the multi-term dual kernel must compile
    inside the scoped-VMEM budget (a_blk demand-shrink) and match the
    dense-operator oracle on the chip."""
    from dqc_tpu.circuit.plane_scan import _dense_cross_expanded_terms
    from dqc_tpu.ops import planes as pln

    rng = np.random.default_rng(71)
    n = 16
    positions = (8, 9, 3, 5)  # two sublane bits, two lane bits
    v = rng.standard_normal(1 << n) + 1j * rng.standard_normal(1 << n)
    psi = (v / np.linalg.norm(v)).astype(np.complex64)
    m = rng.standard_normal((16, 16)) + 1j * rng.standard_normal((16, 16))
    G, _ = np.linalg.qr(m)
    G = G.astype(np.complex64)

    shape = (1 << (n - 14), 128, 128)
    xr = jnp.asarray(np.ascontiguousarray(psi.real.reshape(shape)))
    xi = jnp.asarray(np.ascontiguousarray(psi.imag.reshape(shape)))

    @jax.jit
    def run(xr, xi, Gp):
        # traced gate (real pair in): all 16 slice terms, no pruning
        Gc = jax.lax.complex(Gp[0], Gp[1])
        terms = _dense_cross_expanded_terms(Gc, positions, n)
        assert len(terms) == 16, len(terms)
        yr, yi = pln.apply_cross_terms(xr, xi, terms, n, alias=False)
        return yr, yi

    Gp = jnp.asarray(np.stack([G.real, G.imag]))
    yr, yi = run(xr, xi, Gp)
    got = (np.asarray(yr, np.float64)
           + 1j * np.asarray(yi, np.float64)).reshape(-1)

    # numpy oracle
    t = psi.reshape((2,) * n).astype(np.complex128)
    axes = [n - 1 - p for p in positions]
    gt = G.reshape((2,) * 8).astype(np.complex128)
    moved = np.moveaxis(t, axes, range(4))
    out = np.tensordot(gt, moved, axes=(list(range(4, 8)), list(range(4))))
    want = np.moveaxis(out, range(4), axes).reshape(-1)
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 1e-5, err


@skip_no_tpu
def test_dhigh_kernels_on_hardware():
    """Fused diag+high forward (both orders) and the one-pass adjoint with
    Q reductions, compiled on the chip vs numpy (n=17: X=8, pre=post=1)."""
    from dqc_tpu.ops import planes as pln
    from dqc_tpu.ops.pallas.block_backward import block_backward_high
    from dqc_tpu.ops.pallas.high_apply import high_group_apply_planes

    rng = np.random.default_rng(81)
    A1, X, post = 1, 8, 1
    M = post * 128
    shp = (A1, X, M, 128)
    x = (rng.standard_normal(shp) + 1j * rng.standard_normal(shp)).astype(
        np.complex64)
    m = rng.standard_normal((X, X)) + 1j * rng.standard_normal((X, X))
    E, _ = np.linalg.qr(m)
    E = E.astype(np.complex64)
    tsl = np.exp(1j * rng.standard_normal((128, 128))).astype(np.complex64)
    tas = np.exp(1j * rng.standard_normal((X, 128))).astype(np.complex64)
    tal = np.exp(1j * rng.standard_normal((X, 128))).astype(np.complex64)
    v = (A1, X, post, 128)
    view = (jnp.asarray(tsl.real), jnp.asarray(tsl.imag),
            jnp.asarray(tas.real.reshape(v)), jnp.asarray(tas.imag.reshape(v)),
            jnp.asarray(tal.real.reshape(v)), jnp.asarray(tal.imag.reshape(v)))
    view_inv = tuple(
        jnp.asarray(c) for t in (tsl, tas, tal)
        for c in ((1.0 / t).real.astype(np.float32).reshape(
                      (128, 128) if t is tsl else v),
                  (1.0 / t).imag.astype(np.float32).reshape(
                      (128, 128) if t is tsl else v)))
    D = (tas[:, :, None] * tal[:, None, :]
         * tsl[None, :, :]).reshape(A1, X, post, 128, 128)
    x5 = x.reshape(A1, X, post, 128, 128).astype(np.complex128)
    Ec = E.astype(np.complex128)

    for diag_first in (True, False):
        yr, yi = high_group_apply_planes(
            jnp.asarray(x.real), jnp.asarray(x.imag),
            jnp.asarray(E.real), jnp.asarray(E.imag),
            diag=view, diag_first=diag_first)
        got = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)
        if diag_first:
            want = np.einsum("xy,iypsl->ixpsl", Ec, D * x5)
        else:
            want = D * np.einsum("xy,iypsl->ixpsl", Ec, x5)
        err = np.abs(got - want.reshape(shp)).max() / np.abs(want).max()
        assert err < 1e-5, (diag_first, err)

    b = (rng.standard_normal(shp) + 1j * rng.standard_normal(shp)).astype(
        np.complex64)
    out = block_backward_high(
        jnp.asarray(x.real), jnp.asarray(x.imag),
        jnp.asarray(b.real), jnp.asarray(b.imag),
        jnp.asarray(np.conj(E.T).real), jnp.asarray(np.conj(E.T).imag),
        jnp.asarray(E.real), jnp.asarray(E.imag),
        diag_inv_tables=view_inv, diag_tables=view,
        diag_first_fwd=True, diag_q=True)
    b5 = b.reshape(A1, X, post, 128, 128).astype(np.complex128)
    fir = np.einsum("xy,iypsl->ixpsl", np.conj(Ec.T), x5)
    bn = np.einsum("xy,iypsl->ixpsl", Ec.T, b5)
    T0 = np.einsum("ixpsl,iypsl->xy", b5, fir)
    Q = (bn * fir).reshape(-1, 128, 128)
    got_t0 = np.asarray(out[4], np.float64) + 1j * np.asarray(out[5],
                                                              np.float64)
    assert np.abs(got_t0 - T0).max() / np.abs(T0).max() < 2e-4
    qsl = np.asarray(out[6], np.float64) + 1j * np.asarray(out[7], np.float64)
    assert np.abs(qsl - Q.sum(axis=0)).max() / np.abs(Q.sum(0)).max() < 2e-4
    got_f = (np.asarray(out[0], np.float64)
             + 1j * np.asarray(out[1], np.float64))
    want_f = (fir / D).reshape(shp)
    assert np.abs(got_f - want_f).max() / np.abs(want_f).max() < 2e-4


@skip_no_tpu
def test_ddual_after_kernel_on_hardware():
    """Dual sweep with the diag run fused AFTER the dense ops (ddual-after
    order), compiled on the chip vs numpy."""
    from dqc_tpu.ops.pallas.dual_apply import dual_group_apply_planes

    rng = np.random.default_rng(83)
    A = 4
    xr, xi = rand_planes(rng, A)
    el = rand_op(rng)
    em = rand_op(rng)
    tsl = np.exp(1j * rng.standard_normal((128, 128))).astype(np.complex64)
    tas = np.exp(1j * rng.standard_normal((A, 128))).astype(np.complex64)
    tal = np.exp(1j * rng.standard_normal((A, 128))).astype(np.complex64)
    tables = (jnp.asarray(tsl.real), jnp.asarray(tsl.imag),
              jnp.asarray(tas.real), jnp.asarray(tas.imag),
              jnp.asarray(tal.real), jnp.asarray(tal.imag))

    yr, yi = dual_group_apply_planes(
        xr, xi, jnp.asarray(el.real), jnp.asarray(el.imag),
        jnp.asarray(em.real), jnp.asarray(em.imag),
        diag_tables=tables, diag_first=False)
    got = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)

    x = (np.asarray(xr, np.float64)
         + 1j * np.asarray(xi, np.float64)).astype(np.complex128)
    z = np.einsum("sk,akl,ml->asm", em.astype(np.complex128), x,
                  el.astype(np.complex128))
    D = (tas[:, :, None] * tal[:, None, :] * tsl[None, :, :]).astype(
        np.complex128)
    want = D * z
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5


@skip_no_tpu
@pytest.mark.parametrize("x_top", [2, 4])
def test_merged_fact_kernels_on_hardware(x_top):
    """Kronecker-factorized hpair kernels COMPILED on the chip at the real
    merged shapes (Xt=2 the 29q shape, Xt=4 the 30q shape; Xl=128), vs the
    expanded merged kernels on the same data: forward apply, adjoint
    planes, and the T0_top/T0_low pair-gram restrictions (extracted in-jit
    from the expanded kernel's (XX, XX) merged gram at HIGHEST). Mosaic
    constraints differ from interpret mode (VPU scalar combos + VPU
    pair-gram reductions on per-slice slabs, SMEM top-factor operands);
    this pins the lowering. Measured motivation: tools/hpair_fact_bench.py
    + BENCHMARKS.md round 5 — fwd 2.8x, bwd 1.3-1.6x over expanded."""
    from dqc_tpu.ops.pallas.block_backward import (
        block_backward_high, block_backward_merged_fact)
    from dqc_tpu.ops.pallas.high_apply import (
        high_group_apply_planes, merged_fact_apply_planes)

    rng = np.random.default_rng(11)
    Xl, A1, M = 128, 1, 16
    XX = x_top * Xl
    Et = np.linalg.qr(rng.normal(size=(x_top, x_top))
                      + 1j * rng.normal(size=(x_top, x_top)))[0]
    El = np.linalg.qr(rng.normal(size=(Xl, Xl))
                      + 1j * rng.normal(size=(Xl, Xl)))[0]
    Et, El = Et.astype(np.complex64), El.astype(np.complex64)
    Em = np.kron(Et, El)
    Eti = np.linalg.inv(Et).astype(np.complex64)
    Eli = np.linalg.inv(El).astype(np.complex64)
    Emi = np.kron(Eti, Eli)
    hi = jax.lax.Precision.HIGHEST

    def pl_np(c):
        return (jnp.asarray(np.ascontiguousarray(c.real).astype(np.float32)),
                jnp.asarray(np.ascontiguousarray(c.imag).astype(np.float32)))

    el_p, et_p, em_p = pl_np(El), pl_np(Et), pl_np(Em)
    eli_p, eti_p, emi_p = pl_np(Eli), pl_np(Eti), pl_np(Emi)

    @jax.jit
    def check():
        shape = (A1, XX, M, 128)
        xr, xi = _dev_planes(21, shape)
        br, bi = _dev_planes(23, shape)
        yr1, yi1 = merged_fact_apply_planes(xr, xi, *el_p, *et_p,
                                            x_top=x_top, alias=False)
        yr2, yi2 = high_group_apply_planes(xr, xi, *em_p, alias=False)
        e_fwd = jnp.maximum(jnp.max(jnp.abs(yr1 - yr2)),
                            jnp.max(jnp.abs(yi1 - yi2)))

        f1 = block_backward_merged_fact(yr1, yi1, br, bi, *eli_p, *el_p,
                                        *eti_p, *et_p, x_top=x_top)
        f2 = block_backward_high(yr2, yi2, br, bi, *emi_p, *em_p)
        e_pl = jnp.max(jnp.stack([jnp.max(jnp.abs(a - c))
                                  for a, c in zip(f1[:4], f2[:4])]))
        # The T0 restriction oracle runs on HOST numpy at complex128 (a
        # strictly stronger oracle than the previous in-jit c64 einsums).
        # Historical note: this test caught a real kernel bug round 5 — a
        # `jnp.where(cond, 1.0, 0.0)` in the VPU pair-gram resolved its
        # weak-float branches to f64 under the suite's x64 mode, and a
        # 64-bit tile inside a Mosaic kernel SIGABRTs the axon AOT
        # compiler's layout assignment (layout.h:205 bitwidth CHECK).
        return e_fwd, e_pl, f1[4], f1[5], f1[6], f1[7], f2[4], f2[5]

    e_fwd, e_pl, gt_r, gt_i, gl_r, gl_i, t0m_r, t0m_i = check()
    e_fwd, e_pl = float(e_fwd), float(e_pl)
    T0m = (np.asarray(t0m_r, np.float64)
           + 1j * np.asarray(t0m_i, np.float64)).reshape(x_top, Xl,
                                                         x_top, Xl)
    want_top = np.einsum("ab,xayb->xy", El.astype(np.complex128), T0m)
    want_low = np.einsum("ed,exdy->xy", Et.astype(np.complex128), T0m)
    got_top = np.asarray(gt_r, np.float64) + 1j * np.asarray(gt_i, np.float64)
    got_low = np.asarray(gl_r, np.float64) + 1j * np.asarray(gl_i, np.float64)
    e_top = (np.abs(got_top - want_top).max() / np.abs(want_top).max())
    e_low = (np.abs(got_low - want_low).max() / np.abs(want_low).max())
    assert e_fwd < 3e-5, e_fwd
    assert e_pl < 1e-4, e_pl
    assert e_top < 3e-5, e_top
    assert e_low < 3e-5, e_low


@skip_no_tpu
def test_block_operator_composition_precision_on_hardware():
    """Composed block operators must be exact-f32 on the MXU.

    Plain ``@`` on traced operators runs at XLA's DEFAULT precision —
    bf16 passes on the TPU MXU. A lane-group operator composed from 7
    expanded 1q unitaries then deviates ~4e-3 from the true product with
    singular values in [0.995, 1.012] (measured on v5e), i.e. it is
    NON-unitary at the 1e-2 level; a variational optimizer mines that for
    unbounded "energy" (observed: VQE 20q x 26L converging below the exact
    ground energy). ``fused_autograd._compose`` therefore routes every
    operator product through config.matmul_precision() (HIGHEST); this
    pins the composed operator AND a var-gate cotangent closed from it
    against numpy at f32 tolerance on the real chip."""
    from dqc_tpu.circuit import fused_autograd as fa
    from dqc_tpu.ops import groups as gr

    rng = np.random.default_rng(7)
    g = 7
    gates, expanded = [], []
    for i in range(g):
        z = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
        q, _ = np.linalg.qr(z)
        gates.append(q.astype(np.complex64))
        m = np.asarray(1.0)
        for j in range(g - 1, -1, -1):
            m = np.kron(m, q if j == i else np.eye(2))
        expanded.append(m.astype(np.complex128))

    # traced expansion + composition (the engine path for a var block);
    # complex64 cannot cross the axon host boundary — marshal real pairs
    def compose_pairs(parts):
        ops = [gr.expand_in_group(r + 1j * i, (k,), g)
               for k, (r, i) in enumerate(parts)]
        t = fa._compose(ops, diag=False)
        return t.real, t.imag
    parts = [(jnp.asarray(q.real), jnp.asarray(q.imag)) for q in gates]
    tr, ti = jax.jit(compose_pairs)(parts)
    ref = expanded[0]
    for m in expanded[1:]:
        ref = m @ ref
    got = np.asarray(tr, np.float64) + 1j * np.asarray(ti, np.float64)
    assert np.abs(got - ref).max() < 2e-6, np.abs(got - ref).max()
    sv = np.linalg.svd(got, compute_uv=False)
    assert abs(sv.max() - 1.0) < 1e-5 and abs(sv.min() - 1.0) < 1e-5

    # gradient closure: suffix^T T0 prefix^T at HIGHEST too
    T0 = (rng.normal(size=(1 << g, 1 << g))
          + 1j * rng.normal(size=(1 << g, 1 << g))).astype(np.complex64)

    def closure_pairs(er, ei, t0r, t0i):
        a = gr.expand_in_group(er + 1j * ei, (0,), g)
        ct = fa._opmul(fa._opmul(a.T, t0r + 1j * t0i), a.T)
        return ct.real, ct.imag
    cr, ci = jax.jit(closure_pairs)(
        jnp.asarray(gates[0].real), jnp.asarray(gates[0].imag),
        jnp.asarray(T0.real), jnp.asarray(T0.imag))
    ref_ct = expanded[0].T @ T0.astype(np.complex128) @ expanded[0].T
    got_ct = np.asarray(cr, np.float64) + 1j * np.asarray(ci, np.float64)
    rel = np.abs(got_ct - ref_ct).max() / np.abs(ref_ct).max()
    assert rel < 2e-6, rel


@skip_no_tpu
@pytest.mark.parametrize("storage", ["f32", "mixed", "f16"])
def test_segmented_step_on_hardware(storage):
    """Segmented fwd+grad end-to-end ON THE REAL BACKEND (both storages).

    This is the program shape that silently killed the round-3 driver
    capture at 30q: the segmented driver hands arrays between many jit
    calls, and serving TPU backends reject ANY complex64 host<->device
    transfer — an eager op with a complex constant (the gate
    parameterization's ``exp(1j*b)`` under eager ``jax.vjp``) or a
    complex numpy jit argument (the entangler const gates) raises
    UNIMPLEMENTED and POISONS the PJRT client, so the step dies at the
    first fetch with no useful location. CPU tests cannot catch this
    (CPU transfers complex fine); this pins the whole segmented +
    mixed-storage path on hardware at a small plane-eligible shape."""
    from dqc_tpu import config
    from dqc_tpu.circuit import segmented
    from dqc_tpu.models.hardware_efficient import HardwareEfficientAnsatz

    config.set_state_storage(storage)
    try:
        model = HardwareEfficientAnsatz(14, 5, entangler="cz", scan=True)
        params = model.init_params(jax.random.PRNGKey(3))
        v_seg, g_seg = model.magnetization_value_and_grad_segmented(
            params, max_chunk=2)
        v_one, g_one = jax.jit(jax.value_and_grad(model.magnetization))(params)
        assert np.isfinite(float(v_seg))
        np.testing.assert_allclose(float(v_seg), float(v_one), rtol=1e-6)
        tol = {"f32": dict(rtol=2e-5, atol=1e-6),
               "mixed": dict(rtol=3e-2, atol=3e-3),   # bf16 ct rounding
               "f16": dict(rtol=4e-3, atol=4e-4)}[storage]  # f16 ct rounding
        np.testing.assert_allclose(np.asarray(g_seg), np.asarray(g_one), **tol)
    finally:
        config.set_state_storage("f32")
        segmented.segmented_cache_clear()
