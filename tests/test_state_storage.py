"""Reduced-precision state-storage modes (``config.set_state_storage``).

The plane engine can store the statevector planes in bf16 between kernel
passes while all VMEM compute stays f32:

  "mixed" — forward planes f32 (value bit-exact vs "f32"), cotangent planes
            bf16: halves the adjoint's second statevector, which is what
            lets 30 qubits fwd+grad fit a single 16 GB chip (the reference
            has the same two-f32-statevector floor, circuit.rs:266-429 /
            README.md:17, and therefore caps at 29q on 16 GB).
  "bf16"  — both pairs bf16 (max headroom; value AND grad carry rounding).

These tests pin the contract: mixed keeps the VALUE bit-identical to f32
storage and its gradients within bf16 rounding; bf16 keeps both within
bf16 rounding. Kernels run in interpret mode on CPU; the same code paths
execute compiled on TPU (bench.py's 30q line).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dqc_tpu import config
from dqc_tpu.circuit.builder import AutoGradCircuit
from dqc_tpu.circuit.fusion import fuse_tape
from dqc_tpu.circuit.plane_scan import (
    plane_scan_densities,
    plane_scanned_layers,
    plane_std_scan_densities,
)

from test_plane_scan import build_layer, rand_state

C64 = jnp.complex64


@pytest.fixture(autouse=True)
def restore_storage():
    yield
    config.set_state_storage("f32")


def test_mode_validation():
    with pytest.raises(ValueError):
        config.set_state_storage("fp8")
    config.set_state_storage("mixed")
    assert config.state_storage() == "mixed"
    assert config.fwd_plane_dtype() == jnp.float32
    assert config.bwd_plane_dtype() == jnp.bfloat16
    config.set_state_storage("f16")
    assert config.fwd_plane_dtype() == jnp.float32
    # f16 bit patterns ride in uint16 planes (Mosaic rejects the f16 type)
    assert config.bwd_plane_dtype() == jnp.uint16
    config.set_state_storage("bf16")
    assert config.fwd_plane_dtype() == jnp.bfloat16
    config.set_state_storage("f32")
    assert config.bwd_plane_dtype() == jnp.float32


def test_bwd_dot_mode_resolution():
    """'auto' follows the cotangent storage: bf16-stored cotangents run
    their transport/gram dots bf16x3 (the operands are bf16-rounded at
    every store, so 6-pass f32-HIGHEST buys nothing there); f32 storage
    keeps the exact dot mode. Explicit override wins."""
    try:
        config.set_state_storage("f32")
        assert config.bwd_kernel_dot_mode() == config.kernel_dot_mode()
        config.set_state_storage("mixed")
        assert config.bwd_kernel_dot_mode() == "bf16x3"
        config.set_state_storage("bf16")
        assert config.bwd_kernel_dot_mode() == "bf16x3"
        config.set_bwd_kernel_dot_mode("f32")
        assert config.bwd_kernel_dot_mode() == "f32"
        with pytest.raises(ValueError):
            config.set_bwd_kernel_dot_mode("f64")
    finally:
        config.set_bwd_kernel_dot_mode("auto")
        config.set_state_storage("f32")


def test_mixed_grad_error_vs_exact_bwd_dots(n=14):
    """The auto bf16x3 cotangent dots must not degrade mixed-storage
    gradients beyond the storage-rounding noise: grads with bf16x3 bwd
    dots stay within a small factor of the same run with exact f32 bwd
    dots (both compared to f32 storage truth)."""
    from dqc_tpu.models.hardware_efficient import HardwareEfficientAnsatz

    config.set_plane_engine(True)
    try:
        m = HardwareEfficientAnsatz(n, 2, entangler="cz", dtype=C64,
                                    scan=True)
        params = m.init_params(jax.random.PRNGKey(3))
        config.set_state_storage("f32")
        _, g0 = jax.value_and_grad(m.magnetization)(params)
        config.set_state_storage("mixed")
        config.set_bwd_kernel_dot_mode("f32")
        _, g_exact = jax.value_and_grad(m.magnetization)(params)
        config.set_bwd_kernel_dot_mode("auto")
        _, g_fast = jax.value_and_grad(m.magnetization)(params)
        ref = np.abs(np.asarray(g0)).max()
        e_exact = np.abs(np.asarray(g_exact) - np.asarray(g0)).max() / ref
        e_fast = np.abs(np.asarray(g_fast) - np.asarray(g0)).max() / ref
        assert e_fast < max(3 * e_exact, 1e-3), (e_fast, e_exact)
    finally:
        config.set_bwd_kernel_dot_mode("auto")
        config.set_state_storage("f32")
        config.set_plane_engine("auto")


def _epilogue(n):
    epi = AutoGradCircuit(n, dtype=C64)
    for i in range(0, n, 3):
        epi.get_q1_dens_op_with_grad(i)
    epi.get_q2_dens_op_with_grad(1, n - 1)
    return fuse_tape(epi.tape)


def _loss_grad(n, seed):
    """value_and_grad of a density-sum loss through scan + epilogue under
    the current storage mode."""
    ftape, stacked, consts = build_layer(n, seed=seed)
    init = rand_state(n, seed=seed + 1)
    epi_ft = _epilogue(n)

    def loss(sg):
        dens = plane_scan_densities(ftape, epi_ft, init, sg, consts)
        return sum(jnp.real(jnp.trace(d)) + jnp.real(d[0, 0]) for d in dens)

    v, g = jax.value_and_grad(loss)(stacked)
    flat = np.concatenate([np.asarray(x).ravel().view(np.float32)
                           for x in jax.tree_util.tree_leaves(g)])
    return float(v), flat


def test_mixed_value_exact_grad_bf16(n=14):
    """Mixed mode: value bit-identical to f32 storage (forward planes are
    f32 in both); gradients within bf16 rounding of the f32-storage run."""
    config.set_state_storage("f32")
    v0, g0 = _loss_grad(n, seed=3)
    config.set_state_storage("mixed")
    v1, g1 = _loss_grad(n, seed=3)
    assert v1 == v0
    rel = np.abs(g1 - g0).max() / np.abs(g0).max()
    assert rel < 2e-3, rel  # bf16 has ~8 mantissa bits: ~4e-3 ulp
    assert rel > 0  # the mode actually took effect


def test_f16_value_exact_grad_f16(n=14):
    """f16 mode: value bit-identical to f32 storage (forward planes f32);
    gradients within f16 rounding (10 mantissa bits — 4x tighter than
    mixed/bf16's 8) of the f32-storage run. Exercises the power-of-2
    cotangent prescale (plane_scan._ct_prescale): without it the deep
    cotangent elements would sit in f16's subnormal band."""
    config.set_state_storage("f32")
    v0, g0 = _loss_grad(n, seed=3)
    config.set_state_storage("f16")
    v1, g1 = _loss_grad(n, seed=3)
    assert v1 == v0
    rel = np.abs(g1 - g0).max() / np.abs(g0).max()
    assert rel < 5e-4, rel  # f16 ulp 2^-11 ~ 4.9e-4
    assert rel > 0  # the mode actually took effect


@pytest.mark.slow
def test_bf16_value_and_grad(n=14):
    config.set_state_storage("f32")
    v0, g0 = _loss_grad(n, seed=5)
    config.set_state_storage("bf16")
    v1, g1 = _loss_grad(n, seed=5)
    assert abs(v1 - v0) / abs(v0) < 2e-3
    rel = np.abs(g1 - g0).max() / np.abs(g0).max()
    assert rel < 5e-3, rel


def test_forward_only_modes(n=14):
    ftape, stacked, consts = build_layer(n, seed=7)
    init = rand_state(n, seed=7)
    config.set_state_storage("f32")
    want = np.asarray(plane_scanned_layers(ftape, init, stacked, consts))
    config.set_state_storage("mixed")
    got = np.asarray(plane_scanned_layers(ftape, init, stacked, consts))
    np.testing.assert_array_equal(got, want)  # fwd storage identical
    config.set_state_storage("bf16")
    got16 = np.asarray(plane_scanned_layers(ftape, init, stacked, consts))
    err = np.abs(got16 - want).max()
    assert 0 < err < 5e-3, err


def test_dense_cross_mixed(n=14):
    """CNOT-entangled model under mixed storage: the dense cross-group
    Schmidt sweeps, their pair-grad and the G^T transport all hit the
    reduced-storage boundaries (upcast on read, downcast on store)."""
    from dqc_tpu.models.hardware_efficient import HardwareEfficientAnsatz

    config.set_plane_engine(True)
    try:
        m = HardwareEfficientAnsatz(n, 1, entangler="cnot", dtype=C64,
                                    scan=True)
        params = m.init_params(jax.random.PRNGKey(7))
        config.set_state_storage("f32")
        v0, g0 = jax.value_and_grad(m.magnetization)(params)
        config.set_state_storage("mixed")
        v1, g1 = jax.value_and_grad(m.magnetization)(params)
        assert float(v1) == float(v0)
        rel = np.abs(np.asarray(g1) - np.asarray(g0)).max() / \
            np.abs(np.asarray(g0)).max()
        # dense-cross adjoints re-round the bf16 accumulator once per
        # Schmidt term, so the bound is a few bf16 ulps, not one
        assert 0 < rel < 1e-2, rel
    finally:
        config.set_plane_engine("auto")


@pytest.mark.slow
def test_depth26_f64_oracle(n=14, L=26):
    """Pins the plane engine's deep-circuit gradient accuracy against a
    complex128 oracle (VERDICT r2 #3): at 26 layers the f32 plane kernels
    must stay within a few f32 ulps of the f64 gradient — the measured
    error does not grow with depth (full table: BENCHMARKS.md round 3)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from accuracy_depth import build, flatten, loss_fn

    ftape, epi_ft, slots, consts = build(n, L)
    init = np.zeros(1 << n, np.complex128)
    init[0] = 1.0

    sg128 = tuple(jnp.asarray(np.asarray(s, np.complex128)) for s in slots)
    c128 = tuple(jnp.asarray(np.asarray(c, np.complex128)) for c in consts)
    loss64 = loss_fn(ftape, epi_ft, jnp.asarray(init), c128, plane=False)
    v0, g0 = jax.value_and_grad(loss64)(sg128)
    f0 = flatten(g0)
    scale = np.abs(f0).max()

    config.set_plane_engine(True)
    try:
        loss = loss_fn(ftape, epi_ft, jnp.asarray(init.astype(np.complex64)),
                       consts, plane=True)
        v, g = jax.value_and_grad(loss)(slots)
        f = flatten(g)
        assert abs(float(v) - float(v0)) / abs(float(v0)) < 2e-6
        gmax = np.abs(f - f0).max() / scale
        assert gmax < 8e-6, gmax  # measured 2.1e-6; bar leaves f32 headroom
    finally:
        config.set_plane_engine("auto")


@pytest.mark.slow
def test_distributed_mixed(n=17):
    """Distributed plane engine under mixed storage (17q over 8 virtual
    devices = 14q local shards): value exact vs f32 storage, grads at bf16
    rounding. This is what lifts per-shard HBM ceilings on pod slices (a
    31q-equivalent shard's adjoint fits where two f32 states would not)."""
    from jax.sharding import Mesh
    from dqc_tpu.models.vqe_ising import VQEIsing
    from dqc_tpu.parallel import AXIS

    mesh = Mesh(np.array(jax.devices("cpu")[:8]), (AXIS,))
    config.set_plane_engine(True)
    try:
        model = VQEIsing(qubits_number=n, layers_number=2, dtype=C64,
                         scan=True)
        params = model.init_params(jax.random.PRNGKey(2))
        e_dist = model.build_distributed_energy(mesh, scan=True)
        config.set_state_storage("f32")
        v0, g0 = jax.jit(jax.value_and_grad(e_dist))(params)
        config.set_state_storage("mixed")
        v1, g1 = jax.jit(jax.value_and_grad(e_dist))(params)
        assert float(v1) == float(v0)
        rel = np.abs(np.asarray(g1) - np.asarray(g0)).max() / \
            np.abs(np.asarray(g0)).max()
        assert 0 < rel < 5e-3, rel
    finally:
        config.set_plane_engine("auto")


@pytest.mark.slow
def test_std_scan_mixed(n=14):
    """The fully plane-resident |0..0> pipeline (the bench path) under
    mixed storage: value exact, grads at bf16 rounding (slow tier: the
    fast tier covers the same storage boundaries via plane_scan_densities
    in test_mixed_value_exact_grad_bf16)."""
    ftape, stacked, consts = build_layer(n, seed=9)
    epi_ft = _epilogue(n)

    def loss(sg):
        dens = plane_std_scan_densities(None, ftape, epi_ft, (), sg, consts)
        return sum(jnp.real(jnp.trace(d)) + jnp.real(d[0, 0]) for d in dens)

    config.set_state_storage("f32")
    v0, g0 = jax.value_and_grad(loss)(stacked)
    config.set_state_storage("mixed")
    v1, g1 = jax.value_and_grad(loss)(stacked)
    assert float(v1) == float(v0)
    f0 = np.concatenate([np.asarray(x).ravel().view(np.float32)
                         for x in jax.tree_util.tree_leaves(g0)])
    f1 = np.concatenate([np.asarray(x).ravel().view(np.float32)
                         for x in jax.tree_util.tree_leaves(g1)])
    rel = np.abs(f1 - f0).max() / np.abs(f0).max()
    assert 0 < rel < 2e-3, rel
