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
