"""Minimal on-hardware repro for the factorized hpair kernel failure seen in
tests/test_tpu_kernels.py::test_merged_fact_kernels_on_hardware.

Runs each kernel variant separately at the 30q merged shape (Xt=4, Xl=128,
XX=512) on tiny M so compiles are cheap, printing full errors per stage.
"""
import sys
import traceback

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def planes(c):
    return (jnp.asarray(np.ascontiguousarray(c.real).astype(np.float32)),
            jnp.asarray(np.ascontiguousarray(c.imag).astype(np.float32)))


def main():
    from dqc_tpu.ops.pallas.block_backward import (
        block_backward_high, block_backward_merged_fact)
    from dqc_tpu.ops.pallas.high_apply import (
        high_group_apply_planes, merged_fact_apply_planes)

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(11)
    x_top, Xl, A1, M = 4, 128, 1, 16
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

    el_p, et_p, em_p = planes(El), planes(Et), planes(Em)
    eli_p, eti_p, emi_p = planes(Eli), planes(Eti), planes(Emi)

    shape = (A1, XX, M, 128)
    x = rng.normal(size=shape).astype(np.float32)
    xi_ = rng.normal(size=shape).astype(np.float32)
    b = rng.normal(size=shape).astype(np.float32)
    bi_ = rng.normal(size=shape).astype(np.float32)
    xr, xi = jnp.asarray(x), jnp.asarray(xi_)
    br, bi = jnp.asarray(b), jnp.asarray(bi_)

    stage = sys.argv[1] if len(sys.argv) > 1 else "all"

    def run(name, fn):
        if stage not in ("all", name):
            return None
        try:
            out = fn()
            out = [np.asarray(o) for o in out]
            print(f"{name}: OK  maxabs={max(float(np.abs(o).max()) for o in out):.4g}",
                  flush=True)
            return out
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}", flush=True)
            traceback.print_exc()
            sys.exit(1)

    y1 = run("fwd_fact", lambda: merged_fact_apply_planes(
        xr, xi, *el_p, *et_p, x_top=x_top, alias=False))
    y2 = run("fwd_exp", lambda: high_group_apply_planes(
        xr, xi, *em_p, alias=False))
    if stage == "all" and y1 is not None and y2 is not None:
        e = max(np.abs(y1[0] - y2[0]).max(), np.abs(y1[1] - y2[1]).max())
        print(f"fwd parity maxabs diff = {e:.3e}", flush=True)

    if y1 is None:
        y1 = [xr, xi]
    f1 = run("bwd_fact", lambda: block_backward_merged_fact(
        jnp.asarray(y1[0]), jnp.asarray(y1[1]), br, bi,
        *eli_p, *el_p, *eti_p, *et_p, x_top=x_top))
    f2 = run("bwd_exp", lambda: block_backward_high(
        jnp.asarray(y1[0]), jnp.asarray(y1[1]), br, bi, *emi_p, *em_p))
    if stage == "all" and f1 is not None and f2 is not None:
        e = max(float(np.abs(a - c).max()) for a, c in zip(f1[:4], f2[:4]))
        print(f"bwd plane parity maxabs diff = {e:.3e}", flush=True)
        T0m = (f2[4] + 1j * f2[5]).reshape(x_top, Xl, x_top, Xl)
        want_top = np.einsum("ab,xayb->xy", El, T0m)
        want_low = np.einsum("ed,exdy->xy", Et, T0m)
        got_top = f1[4] + 1j * f1[5]
        got_low = f1[6] + 1j * f1[7]
        print(f"T0_top rel = {np.abs(got_top - want_top).max() / np.abs(want_top).max():.3e}",
              flush=True)
        print(f"T0_low rel = {np.abs(got_low - want_low).max() / np.abs(want_low).max():.3e}",
              flush=True)


if __name__ == "__main__":
    main()
