"""Gradient/value error growth vs circuit depth against an f64 oracle.

VERDICT r2 #3: the plane engine's f32 kernels (Karatsuba reordering, fused
diag runs) measure ~1e-4-level gradient deviation from the XLA engine over
8 layers; this tool quantifies how that error grows with depth and where
it comes from, by comparing EVERY engine/mode against a complex128 oracle
(the XLA complex-einsum path at f64, rel err < 1e-9 per the autodiff
gauntlet) on the same hardware-efficient workload as bench.py.

Usage:  python tools/accuracy_depth.py [n] [depths...]
Prints a markdown table (pasted into BENCHMARKS.md) of max-relative value
and gradient error per (depth x engine-mode). Runs on the CPU backend
(kernels in interpret mode execute bit-identically to the compiled TPU
path up to MXU f32 rounding — cross-checked by tests/test_tpu_kernels.py).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=1").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dqc_tpu import config  # noqa: E402
from dqc_tpu.circuit.builder import AutoGradCircuit  # noqa: E402
from dqc_tpu.circuit.fusion import fuse_tape  # noqa: E402
from dqc_tpu.circuit.plane_scan import (  # noqa: E402
    plane_scan_densities,
    scan_with_epilogue,
)
from dqc_tpu.circuit.scan import fuse_layer  # noqa: E402


def build(n, L, seed=0):
    """bench.py's workload shape: var 1q on every qubit + cz ring + var zz
    cross diagonal, gates drawn in f64 then cast so every engine sees the
    exact same c64 inputs."""
    rng = np.random.default_rng(seed)
    c = AutoGradCircuit(n, dtype=jnp.complex64)
    for i in range(n):
        c.add_q1_var_gate(i)
    cz = np.array([1, 1, 1, -1], dtype=np.complex128)
    consts = []
    for i in range(n - 1):
        c.add_q2_const_gate_diag(i, i + 1)
        consts.append(cz.astype(np.complex64))
    c.add_q2_var_gate_diag(0, n - 1)
    ftape = fuse_layer(c.tape)

    slots = []
    for q in range(n):
        mats = []
        for l in range(L):
            a, b, g = rng.normal(size=3)
            ca, sa = np.cos(a / 2), np.sin(a / 2)
            m = np.array([[ca, -sa * np.exp(1j * g)],
                          [sa * np.exp(1j * b), ca * np.exp(1j * (b + g))]])
            mats.append(m.reshape(-1))
        slots.append(np.stack(mats).astype(np.complex64))
    zz = []
    for l in range(L):
        g = rng.normal() * 0.4
        zz.append(np.exp(1j * g * np.array([1, -1, -1, 1])))
    slots.append(np.stack(zz).astype(np.complex64))

    epi = AutoGradCircuit(n, dtype=jnp.complex64)
    for i in range(0, n, 3):
        epi.get_q1_dens_op_with_grad(i)
    epi_ft = fuse_tape(epi.tape)
    return ftape, epi_ft, tuple(jnp.asarray(s) for s in slots), tuple(consts)


def loss_fn(ftape, epi_ft, init, consts, *, plane):
    run = plane_scan_densities if plane else scan_with_epilogue

    def loss(sg):
        dens = run(ftape, epi_ft, init, sg, consts)
        return sum(jnp.real(jnp.trace(d)) + jnp.real(d[0, 0]) for d in dens)

    return loss


def flatten(g):
    return np.concatenate([np.asarray(x, dtype=np.complex128).ravel()
                           for x in jax.tree_util.tree_leaves(g)])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    depths = [int(d) for d in sys.argv[2:]] or [4, 8, 16, 26]

    modes = [
        ("xla-c64", dict(plane=False, storage="f32", dot="f32")),
        ("plane-f32", dict(plane=True, storage="f32", dot="f32")),
        ("plane-mixed", dict(plane=True, storage="mixed", dot="f32")),
        ("plane-bf16", dict(plane=True, storage="bf16", dot="f32")),
        ("plane-bf16x3", dict(plane=True, storage="f32", dot="bf16x3")),
    ]
    # big-n runs on one CPU core: bound the cost by selecting modes, e.g.
    # DQC_ACC_MODES=xla-c64,plane-f32 (the floor and the shipping engine)
    sel = os.environ.get("DQC_ACC_MODES")
    if sel:
        want = set(sel.split(","))
        modes = [m for m in modes if m[0] in want]

    print(f"| depth | mode | value rel err | grad max rel err | grad rms rel |")
    print(f"|---|---|---|---|---|")
    for L in depths:
        ftape, epi_ft, slots, consts = build(n, L)
        init = np.zeros(1 << n, np.complex128)
        init[0] = 1.0

        # f64 oracle: same tape/gates upcast, complex XLA engine
        sg128 = tuple(jnp.asarray(np.asarray(s, np.complex128)) for s in slots)
        c128 = tuple(jnp.asarray(np.asarray(c, np.complex128)) for c in consts)
        loss64 = loss_fn(ftape, epi_ft, jnp.asarray(init), c128, plane=False)
        v0, g0 = jax.value_and_grad(loss64)(sg128)
        v0 = float(v0)
        f0 = flatten(g0)
        scale = np.abs(f0).max()

        init32 = jnp.asarray(init.astype(np.complex64))
        for name, m in modes:
            config.set_plane_engine(True if m["plane"] else False)
            config.set_state_storage(m["storage"])
            config.set_kernel_dot_mode(m["dot"])
            try:
                loss = loss_fn(ftape, epi_ft, init32, consts, plane=m["plane"])
                v, g = jax.value_and_grad(loss)(slots)
                f = flatten(g)
                verr = abs(float(v) - v0) / abs(v0)
                gmax = np.abs(f - f0).max() / scale
                grms = np.sqrt(np.mean(np.abs(f - f0) ** 2)) / scale
                print(f"| {L} | {name} | {verr:.2e} | {gmax:.2e} | {grms:.2e} |")
            finally:
                config.set_plane_engine("auto")
                config.set_state_storage("f32")
                config.set_kernel_dot_mode("f32")


if __name__ == "__main__":
    main()
