"""Plane-layout Pallas engine parity: plane_scanned_layers must match the
complex XLA scan path (value AND gradients) on every eligible tape shape.

Kernels run in interpret mode on CPU; the same code paths execute compiled
on TPU (bench.py / tests marked tpu)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dqc_tpu import config
from dqc_tpu.circuit.builder import AutoGradCircuit
from dqc_tpu.circuit.fused_autograd import fused_tape_forward
from dqc_tpu.circuit.fusion import FBlock, fuse_tape
from dqc_tpu.circuit.plane_scan import (
    plane_scanned_layers,
    plane_tape_eligible,
    schedule_dual_pairs,
)
from dqc_tpu.circuit.scan import _scanned_layers_xla, fuse_layer, scanned_layers
from dqc_tpu.ops.statevector import standard_state

C64 = jnp.complex64
F32 = jnp.float32


def rand_state(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(2, 1 << n)).astype(np.float32)
    s = (v[0] + 1j * v[1]).astype(np.complex64)
    return jnp.asarray(s / np.linalg.norm(s))


def rand_su2(rng):
    a, b, g = rng.normal(size=3)
    ca, sa = np.cos(a / 2), np.sin(a / 2)
    m = np.array([[ca, -sa * np.exp(1j * g)],
                  [sa * np.exp(1j * b), ca * np.exp(1j * (b + g))]],
                 dtype=np.complex64)
    return m.reshape(-1)


def build_layer(n, *, entangler="cz", nonu=False, seed=0):
    """One hardware-efficient layer: var 1q on every qubit + diag entangler
    ring (in-group AND cross-group diagonals) + a var cross-group zz."""
    rng = np.random.default_rng(seed)
    c = AutoGradCircuit(n, dtype=C64)
    for i in range(n):
        if nonu and i % 5 == 2:
            c.add_q1_var_gate_nonu(i)
        else:
            c.add_q1_var_gate(i)
    consts = []
    cz = np.array([1, 1, 1, -1], dtype=np.complex64)
    for i in range(n - 1):
        c.add_q2_const_gate_diag(i, i + 1)
        consts.append(cz)
    c.add_q2_var_gate_diag(0, n - 1)  # var cross-group diagonal
    ftape = fuse_layer(c.tape)

    L = 3

    def stacked(key):
        ks = jax.random.split(key, L)
        slots = []
        for q in range(n):
            mats = []
            for l in range(L):
                m = rand_su2(np.random.default_rng(1000 * l + q + seed))
                if nonu and q % 5 == 2:
                    m = m + 0.05 * np.random.default_rng(7 * l + q).normal(size=4).astype(np.float32)
                mats.append(m)
            slots.append(jnp.asarray(np.stack(mats)))
        # trailing var slot: the zz diagonal, parameterized
        zz = []
        for l in range(L):
            g = 0.3 + 0.1 * l
            zz.append(np.exp(1j * g * np.array([1, -1, -1, 1], dtype=np.float32)).astype(np.complex64))
        slots.append(jnp.asarray(np.stack(zz)))
        return tuple(slots)

    return ftape, stacked(jax.random.PRNGKey(seed)), tuple(consts)


@pytest.fixture
def plane_mode():
    config.set_plane_engine(True)
    yield
    config.set_plane_engine("auto")


@pytest.mark.parametrize("n", [14, 15,
                               pytest.param(16, marks=pytest.mark.slow)])
def test_forward_parity(n):
    ftape, stacked, consts = build_layer(n, seed=n)
    assert plane_tape_eligible(ftape, C64)
    init = rand_state(n, seed=n)
    want = _scanned_layers_xla(ftape, init, stacked, consts)
    got = plane_scanned_layers(ftape, init, stacked, consts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=5e-6)


@pytest.mark.parametrize("n,nonu", [(14, True),
                                    pytest.param(15, False, marks=pytest.mark.slow),
                                    pytest.param(16, False, marks=pytest.mark.slow)])
def test_gradient_parity(n, nonu):
    """value_and_grad through scan + epilogue densities: plane vs XLA engines
    agree on the loss and every var-gate cotangent (incl. non-unitary
    uncompute and the var cross-group diagonal)."""
    ftape, stacked, consts = build_layer(n, nonu=nonu, seed=n)
    init = rand_state(n, seed=n + 1)

    epi = AutoGradCircuit(n, dtype=C64)
    for i in range(0, n, 3):
        epi.get_q1_dens_op_with_grad(i)
    epi.get_q2_dens_op_with_grad(1, n - 1)
    epi_ft = fuse_tape(epi.tape)

    def loss_with(layers_fn):
        def loss(stacked_gates, init_state):
            state = layers_fn(ftape, init_state, stacked_gates, consts)
            densities = fused_tape_forward(epi_ft, state, (), ())
            return sum(jnp.sum(jnp.abs(d) ** 2) for d in densities).real
        return loss

    v_ref, g_ref = jax.value_and_grad(loss_with(_scanned_layers_xla), argnums=(0, 1))(stacked, init)
    v_pl, g_pl = jax.value_and_grad(loss_with(plane_scanned_layers), argnums=(0, 1))(stacked, init)

    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_pl), jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_model_dispatch_parity(plane_mode):
    """The public model path routes through the plane engine when forced on
    and produces the same loss/grads as the XLA path.

    Two bars: with exact-f32 grams the engines must agree to f32 roundoff
    (rtol 2e-5 — guards the uncompute/transport exactness); under the
    DEFAULT config the pair-grams run bf16x3 (config.gram_kernel_dot_mode,
    measured ~2x-f32-dot leaf noise, tools/gram_accuracy.py), so the grad
    bar there is the bf16x3-gram grade."""
    from dqc_tpu.models.hardware_efficient import HardwareEfficientAnsatz

    m = HardwareEfficientAnsatz(14, 2, entangler="cz", dtype=C64, scan=True)
    params = m.init_params(jax.random.PRNGKey(3))

    config.set_gram_kernel_dot_mode("f32")
    try:
        v_pl, g_pl = jax.value_and_grad(lambda p: m.magnetization(p))(params)
    finally:
        config.set_gram_kernel_dot_mode("auto")
    v_def, g_def = jax.value_and_grad(lambda p: m.magnetization(p))(params)
    config.set_plane_engine(False)
    v_ref, g_ref = jax.value_and_grad(lambda p: m.magnetization(p))(params)

    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(v_def), float(v_ref), rtol=2e-5)
    scale = np.abs(np.asarray(g_ref)).max()
    np.testing.assert_allclose(np.asarray(g_def), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4 * scale)


def test_vqe_ising_layer_parity():
    """The reference headline workload's layer (var diag zz ring + var dense
    x rotations, reference example_vqse_ising.py:68-75) at 14 qubits."""
    n = 14
    c = AutoGradCircuit(n, dtype=C64)
    for i in range(n - 1):
        c.add_q2_var_gate_diag(i, i + 1)
    c.add_q2_var_gate_diag(0, n - 1)
    for i in range(n):
        c.add_q1_var_gate(i)
    ftape = fuse_layer(c.tape)
    assert plane_tape_eligible(ftape, C64)

    L = 2
    rng = np.random.default_rng(0)

    def slot_zz(l, i):
        g = rng.normal() * 0.4
        return np.exp(1j * g * np.array([1, -1, -1, 1])).astype(np.complex64)

    def slot_x(l, i):
        b = rng.normal() * 0.4
        return np.array([np.cos(b), -1j * np.sin(b),
                         -1j * np.sin(b), np.cos(b)], dtype=np.complex64)

    stacked = tuple(
        jnp.asarray(np.stack([slot_zz(l, i) for l in range(L)]))
        for i in range(n)
    ) + tuple(
        jnp.asarray(np.stack([slot_x(l, i) for l in range(L)]))
        for i in range(n)
    )
    init = standard_state(n, C64)

    def loss_with(layers_fn):
        def loss(sg):
            state = layers_fn(ftape, init, sg, ())
            t = state.reshape(-1)
            return jnp.sum(jnp.abs(t[: 1 << 10]) ** 2).real
        return loss

    v_ref, g_ref = jax.value_and_grad(loss_with(_scanned_layers_xla))(stacked)
    v_pl, g_pl = jax.value_and_grad(loss_with(plane_scanned_layers))(stacked)
    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-5)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_schedule_dual_pairs():
    n = 16
    c = AutoGradCircuit(n, dtype=C64)
    for i in range(n):
        c.add_q1_var_gate(i)
    ftape = fuse_layer(c.tape)
    pairs = schedule_dual_pairs(ftape)
    blocks = [fi for fi in ftape.instructions if isinstance(fi, FBlock)]
    assert len(blocks) == 3  # groups 0, 1, 2
    # groups 0 and 1 pair into one dual sweep; group 2 stands alone
    paired = [p for p in pairs if p[1] is not None]
    assert len(paired) == 1
    i, j = paired[0]
    gi = ftape.instructions[i].group
    gj = ftape.instructions[j].group
    assert {gi, gj} == {0, 1}
    assert len(pairs) == len(ftape.instructions) - 1


def test_ineligible_tapes_fall_back():
    # every cross-group gate kind is plane-eligible since round 2: dense
    # over 2 groups (Schmidt terms) AND dense over >2 groups (subblocks)
    c = AutoGradCircuit(16, dtype=C64)
    c.add_q2_var_gate(6, 7)
    ftape = fuse_layer(c.tape)
    assert plane_tape_eligible(ftape, C64)
    ck = AutoGradCircuit(16, dtype=C64)
    ck.add_gate([0, 7, 14], var=True)  # groups 0, 1, 2
    assert plane_tape_eligible(fuse_layer(ck.tape), C64)
    # too few qubits
    c2 = AutoGradCircuit(10, dtype=C64)
    c2.add_q1_var_gate(0)
    assert not plane_tape_eligible(fuse_layer(c2.tape), C64)
    # f64
    c3 = AutoGradCircuit(14, dtype=jnp.complex128)
    c3.add_q1_var_gate(0)
    assert not plane_tape_eligible(fuse_layer(c3.tape), jnp.complex128)

    # and the public dispatcher still runs the dense-cross tape correctly
    config.set_plane_engine(True)
    try:
        rng = np.random.default_rng(0)
        stacked = (jnp.asarray(np.stack([rand_su2(rng), rand_su2(rng)]).reshape(2, 4)),)
        init = rand_state(16, seed=9)
        # build a proper 16-elem 2q gate stack
        g = np.linalg.qr(rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4)))[0]
        stacked = (jnp.asarray(np.stack([g.reshape(-1), g.conj().T.reshape(-1)]).astype(np.complex64)),)
        out = scanned_layers(ftape, init, stacked, ())
        want = _scanned_layers_xla(ftape, init, stacked, ())
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)
    finally:
        config.set_plane_engine("auto")


def test_plane_epilogue_parity():
    """plane_density_epilogue (3 real contractions per group + plane seed
    applies) vs the complex fused path: densities AND state cotangent."""
    from dqc_tpu.circuit.fused_autograd import fused_tape_forward
    from dqc_tpu.circuit.plane_scan import (
        plane_density_epilogue,
        plane_epilogue_eligible,
    )

    n = 15
    epi = AutoGradCircuit(n, dtype=C64)
    for i in range(n):
        epi.get_q1_dens_op_with_grad(i)
    epi.get_q2_dens_op_with_grad(5, 2)    # in-group 2q
    epi.get_q2_dens_op_with_grad(13, 8)   # in-group (group 1)
    epi_ft = fuse_tape(epi.tape)
    assert plane_epilogue_eligible(epi_ft, C64)

    state = rand_state(n, seed=4)

    def loss_with(fn):
        def loss(s):
            dens = fn(s)
            return sum(jnp.sum(jnp.abs(d) ** 2) for d in dens).real
        return loss

    v_p, g_p = jax.value_and_grad(
        loss_with(lambda s: plane_density_epilogue(epi_ft, s)))(state)
    v_r, g_r = jax.value_and_grad(
        loss_with(lambda s: fused_tape_forward(epi_ft, s, (), ())))(state)
    np.testing.assert_allclose(float(v_p), float(v_r), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r),
                               rtol=2e-5, atol=2e-6)


def test_plane_epilogue_eligibility():
    from dqc_tpu.circuit.plane_scan import plane_epilogue_eligible

    n = 16
    epi = AutoGradCircuit(n, dtype=C64)
    epi.get_q2_dens_op_with_grad(8, 3)  # cross-group density: eligible (r2)
    assert plane_epilogue_eligible(fuse_tape(epi.tape), C64)
    epi2 = AutoGradCircuit(n, dtype=C64)
    epi2.add_q1_const_gate(0)           # gates -> not an epilogue tape
    epi2.get_q1_dens_op_with_grad(0)
    assert not plane_epilogue_eligible(fuse_tape(epi2.tape), C64)


@pytest.mark.slow
def test_distributed_plane_scan_parity(plane_mode):
    """dist_plane_scanned_layers == dist_scanned_layers (value + grads) on an
    8-device virtual mesh at 17 qubits (14 local)."""
    from jax.sharding import PartitionSpec as P
    from dqc_tpu.parallel import dist as pdist, make_mesh
    from dqc_tpu.parallel.plane_scan import (
        dist_plane_eligible,
        dist_plane_scanned_layers,
    )
    from dqc_tpu.parallel.scan import dist_scanned_layers, plan_layer_roundtrip

    n, k, L = 17, 3, 1  # L=1 keeps the default suite under budget; the scan
    # stacking/reverse machinery is layer-count-independent
    mesh = make_mesh(8)
    axis = mesh.axis_names[0]

    layer = AutoGradCircuit(n, dtype=C64)
    for i in range(n):
        layer.add_q1_var_gate(i)
    for i in range(n - 1):
        layer.add_q2_var_gate_diag(i, i + 1)
    prog = plan_layer_roundtrip(layer.tape, k)
    assert dist_plane_eligible(prog, C64)

    rng = np.random.default_rng(7)
    stacked = tuple(
        jnp.asarray(np.stack([rand_su2(rng) for _ in range(L)]))
        for _ in range(n)
    ) + tuple(
        jnp.asarray(np.stack([
            np.exp(1j * rng.normal() * np.array([1, -1, -1, 1])).astype(np.complex64)
            for _ in range(L)]))
        for _ in range(n - 1)
    )

    def make_fn(layers_fn):
        def shard_fn(stacked_gates):
            local = pdist.local_standard_state(n, k, axis, C64)
            local = layers_fn(prog, axis, local, stacked_gates, ())
            # scalar readout: local norm contribution of the first amplitudes
            return jax.lax.psum(jnp.sum(jnp.abs(local[:128]) ** 2), axis)
        fn = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(jax.tree_util.tree_map(lambda _: P(), stacked),),
            out_specs=P(), check_vma=False)
        return lambda sg: fn(sg).real

    v_p, g_p = jax.value_and_grad(make_fn(dist_plane_scanned_layers))(stacked)
    v_r, g_r = jax.value_and_grad(make_fn(dist_scanned_layers))(stacked)
    np.testing.assert_allclose(float(v_p), float(v_r), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_p), jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=5e-6)


@pytest.mark.slow
def test_distributed_plane_vqe_dispatch(plane_mode):
    """The model-level distributed energy routes through the plane engine
    when forced on and matches the complex engine."""
    from dqc_tpu.models.vqe_ising import VQEIsing
    from dqc_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    model = VQEIsing(qubits_number=17, layers_number=2, dtype=C64, scan=True)
    params = model.init_params(jax.random.PRNGKey(5))
    e_plane = model.build_distributed_energy(mesh, scan=True)
    v_p, g_p = jax.value_and_grad(e_plane)(params)
    config.set_plane_engine(False)
    e_ref = model.build_distributed_energy(mesh, scan=True)
    v_r, g_r = jax.value_and_grad(e_ref)(params)
    np.testing.assert_allclose(float(v_p), float(v_r), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r),
                               rtol=3e-5, atol=5e-6)


# ---------------------------------------------------------------------------
# Generic plane tape execution (the direct build() path)
# ---------------------------------------------------------------------------

def build_generic_tape(n, seed=0):
    """Gates + interleaved densities, every plane-eligible instruction kind:
    dense/diag x var/const x unitary/nonu, in-group + cross-group diagonals,
    densities at several circuit points, trailing var gates (zero grads)."""
    rng = np.random.default_rng(seed)
    c = AutoGradCircuit(n, dtype=C64)
    var_gates, const_gates = [], []

    def add_rot(i, nonu=False):
        m = rand_su2(rng)
        if nonu:
            m = m + 0.05 * rng.normal(size=4).astype(np.float32)
            c.add_q1_var_gate_nonu(i)
        else:
            c.add_q1_var_gate(i)
        var_gates.append(jnp.asarray(m))

    for i in range(n):
        add_rot(i, nonu=(i == 3))
    c.get_q1_dens_op_with_grad(0)          # density mid-circuit
    c.get_q1_dens_op_with_grad(n - 1)
    for i in range(0, n - 1, 2):
        c.add_q2_var_gate_diag(i, i + 1)   # in/cross-group diagonals
        var_gates.append(jnp.asarray(
            np.exp(1j * rng.normal() * np.array([1, -1, -1, 1])).astype(np.complex64)))
    cz = np.array([1, 1, 1, -1], dtype=np.complex64)
    c.add_q2_const_gate_diag(0, n - 1)
    const_gates.append(jnp.asarray(cz))
    c.get_q2_dens_op_with_grad(1, 0)       # 2q in-group density
    c.get_q1_dens_op(2)                    # non-diff density (ignored by autodiff)
    add_rot(1)                             # trailing var gate -> zero grad
    return c, tuple(var_gates), tuple(const_gates)


@pytest.mark.parametrize("n", [14, pytest.param(16, marks=pytest.mark.slow)])
def test_plane_tape_forward_parity(n):
    from dqc_tpu.circuit.plane_scan import plane_full_tape_eligible, plane_tape_forward

    c, var_gates, const_gates = build_generic_tape(n, seed=n)
    ftape = fuse_tape(c.tape)
    assert plane_full_tape_eligible(ftape, C64)
    init = jnp.asarray(c.initial_state())

    def loss_with(fn):
        def loss(vg, init_state):
            dens = fn(ftape, init_state, vg, const_gates)
            return sum(jnp.sum(jnp.abs(d) ** 2) for d in dens).real
        return loss

    v_r, g_r = jax.value_and_grad(
        loss_with(fused_tape_forward), argnums=(0, 1))(var_gates, init)
    from dqc_tpu.circuit.plane_scan import plane_tape_forward as ptf
    v_p, g_p = jax.value_and_grad(
        loss_with(ptf), argnums=(0, 1))(var_gates, init)

    np.testing.assert_allclose(float(v_p), float(v_r), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_p), jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=5e-6)


def test_plane_tape_trailing_zero_grads(plane_mode):
    """Var gates after the last diff density get exactly zero gradient
    through the plane engine (reference circuit.rs:327-332 semantics)."""
    from dqc_tpu.circuit.plane_scan import plane_tape_forward

    n = 14
    c = AutoGradCircuit(n, dtype=C64)
    c.add_q1_var_gate(0)
    c.get_q1_dens_op_with_grad(0)
    c.add_q1_var_gate(1)       # trailing
    c.add_q2_var_gate_diag(6, 7)  # trailing cross diag
    ftape = fuse_tape(c.tape)
    rng = np.random.default_rng(0)
    vg = (jnp.asarray(rand_su2(rng)), jnp.asarray(rand_su2(rng)),
          jnp.asarray(np.exp(1j * 0.3 * np.array([1, -1, -1, 1])).astype(np.complex64)))
    init = standard_state(n, C64)

    def loss(vg):
        dens = plane_tape_forward(ftape, init, vg, ())
        return jnp.sum(jnp.abs(dens[0]) ** 2).real

    g = jax.grad(loss)(vg)
    assert np.any(np.abs(np.asarray(g[0])) > 1e-3)
    np.testing.assert_array_equal(np.asarray(g[1]), 0)
    np.testing.assert_array_equal(np.asarray(g[2]), 0)


def test_build_dispatches_plane_engine(plane_mode):
    """The public build() autodiff path routes through the plane engine when
    forced on (and matches the complex engine)."""
    c, var_gates, const_gates = build_generic_tape(14, seed=1)
    _, run = c.build()

    def loss(vg):
        dens = run(list(vg), list(const_gates))
        return sum(jnp.sum(jnp.abs(d) ** 2) for d in dens).real

    v_p, g_p = jax.value_and_grad(loss)(var_gates)
    config.set_plane_engine(False)
    _, run2 = c.build()

    def loss2(vg):
        dens = run2(list(vg), list(const_gates))
        return sum(jnp.sum(jnp.abs(d) ** 2) for d in dens).real

    v_r, g_r = jax.value_and_grad(loss2)(var_gates)
    np.testing.assert_allclose(float(v_p), float(v_r), rtol=2e-5)
    for a, b in zip(g_p, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=5e-6)


@pytest.mark.slow
def test_vmap_over_plane_engine(plane_mode):
    """The plane engine composes with vmap (Pallas batching): batched
    parameters through the public build() path."""
    n = 14
    c = AutoGradCircuit(n, dtype=C64)
    c.add_q1_var_gate(0)
    c.add_q2_var_gate_diag(6, 7)
    c.get_q1_dens_op_with_grad(1)
    _, run = c.build()

    def loss(theta):
        g = jnp.stack([jnp.cos(theta), -jnp.sin(theta),
                       jnp.sin(theta), jnp.cos(theta)]).astype(C64)
        d = jnp.exp(1j * theta * jnp.asarray([1., -1, -1, 1])).astype(C64)
        dens = run([g, d], [])
        return jnp.sum(jnp.abs(dens[0]) ** 2).real

    thetas = jnp.asarray(np.linspace(0.1, 0.5, 3), F32)
    vals = jax.vmap(loss)(thetas)
    grads = jax.vmap(jax.grad(loss))(thetas)
    seq_vals = [float(loss(t)) for t in thetas]
    np.testing.assert_allclose(np.asarray(vals), seq_vals, rtol=1e-5)
    assert np.all(np.isfinite(np.asarray(grads)))


def test_plane_tape_edge_cases(plane_mode):
    """Degenerate tapes through the plane engine: density before any gate,
    no densities at all, multiple densities at one point (shared Gram)."""
    from dqc_tpu.circuit.plane_scan import plane_tape_forward

    n = 14
    rng = np.random.default_rng(2)

    # density-first: the state cotangent flows straight to the input
    c = AutoGradCircuit(n, dtype=C64)
    c.get_q1_dens_op_with_grad(0)
    c.add_q1_var_gate(0)  # trailing, zero grad
    ftape = fuse_tape(c.tape)
    init = rand_state(n, seed=1)
    vg = (jnp.asarray(rand_su2(rng)),)

    def loss(init_state, vgates):
        dens = plane_tape_forward(ftape, init_state, vgates, ())
        return jnp.sum(jnp.abs(dens[0]) ** 2).real

    (g_init, g_v) = jax.grad(loss, argnums=(0, 1))(init, vg)
    def loss_ref(init_state, vgates):
        dens = fused_tape_forward(ftape, init_state, vgates, ())
        return jnp.sum(jnp.abs(dens[0]) ** 2).real
    (r_init, r_v) = jax.grad(loss_ref, argnums=(0, 1))(init, vg)
    np.testing.assert_allclose(np.asarray(g_init), np.asarray(r_init),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(g_v[0]), 0)
    np.testing.assert_array_equal(np.asarray(r_v[0]), 0)

    # no densities: empty output, zero grads everywhere
    c2 = AutoGradCircuit(n, dtype=C64)
    c2.add_q1_var_gate(0)
    ftape2 = fuse_tape(c2.tape)
    dens = plane_tape_forward(ftape2, init, vg, ())
    assert dens == ()

    # several densities at one point share one Gram sweep and all get grads
    c3 = AutoGradCircuit(n, dtype=C64)
    c3.add_q1_var_gate(0)
    for i in range(5):
        c3.get_q1_dens_op_with_grad(i)
    ftape3 = fuse_tape(c3.tape)

    def loss3(vgates, fn):
        dens = fn(ftape3, init, vgates, ())
        return sum(jnp.sum(jnp.abs(d) ** 2) for d in dens).real

    g3 = jax.grad(lambda v: loss3(v, plane_tape_forward))(vg)
    r3 = jax.grad(lambda v: loss3(v, fused_tape_forward))(vg)
    np.testing.assert_allclose(np.asarray(g3[0]), np.asarray(r3[0]),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_vqe_model_std_path_parity(plane_mode):
    """VQE-Ising (const Hadamard prologue + layers + epilogue) through the
    fully plane-resident standard-state op vs the XLA path — the 29q memory
    diet must not change values or gradients."""
    from dqc_tpu.circuit.plane_scan import (
        _tape_all_const,
        plane_tape_eligible,
    )
    from dqc_tpu.models.vqe_ising import VQEIsing

    m = VQEIsing(14, 3, dtype=C64, scan=True)
    assert plane_tape_eligible(m._pro_ftape, C64)
    assert _tape_all_const(m._pro_ftape)
    params = m.init_params(jax.random.PRNGKey(5))

    v_pl, g_pl = jax.value_and_grad(m.energy)(params)
    config.set_plane_engine(False)
    v_ref, g_ref = jax.value_and_grad(m.energy)(params)

    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("n", [pytest.param(15, marks=pytest.mark.slow),
                               pytest.param(16, marks=pytest.mark.slow)])
def test_dense_cross_model_parity(plane_mode, n):
    """CNOT-entangled hardware-efficient ansatz: the ring's group-boundary
    CNOTs are DENSE cross-group gates, executed in the plane engine as
    Schmidt-term accumulate sweeps (round-1 limitation: whole-layer
    fallback). Value + grad parity vs the complex engine."""
    from dqc_tpu.circuit.plane_scan import plane_tape_eligible as pte
    from dqc_tpu.models.hardware_efficient import HardwareEfficientAnsatz

    m = HardwareEfficientAnsatz(n, 2, entangler="cnot", dtype=C64, scan=True)
    assert pte(m._layer_ftape, C64)  # dense crosses no longer disqualify
    params = m.init_params(jax.random.PRNGKey(7))

    v_pl, g_pl = jax.value_and_grad(m.magnetization)(params)
    config.set_plane_engine(False)
    v_ref, g_ref = jax.value_and_grad(m.magnetization)(params)

    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=3e-5, atol=3e-6)


def test_dense_cross_var_gate_tape_parity(plane_mode):
    """A var dense 2q gate straddling each boundary type (lane-sublane,
    sublane-high, lane-high) through the direct build() plane-tape path:
    densities and gate gradients must match the complex engine."""
    n = 15
    rng = np.random.default_rng(9)

    def build_and_run(force_plane):
        config.set_plane_engine(True if force_plane else False)
        c = AutoGradCircuit(n, dtype=C64)
        c.add_q2_var_gate(7, 6)     # sublane x lane
        c.add_q2_var_gate(14, 13)   # high x sublane
        c.add_q2_var_gate(14, 0)    # high x lane
        c.add_q1_var_gate(3)
        c.get_q1_dens_op_with_grad(6)
        c.get_q1_dens_op_with_grad(14)
        _, adiff = c.build()

        g2 = [rand_su2(rng) for _ in range(3)]
        gates = [np.kron(a, b).astype(np.complex64).reshape(-1)
                 for a, b in zip(g2, [rand_su2(rng) for _ in range(3)])]
        gates.append(rand_su2(rng).reshape(-1))
        gates = [jnp.asarray(g) for g in gates]

        def loss(gs):
            dens = adiff(gs, [])
            return sum(jnp.sum(jnp.abs(d) ** 2) for d in dens).real

        return jax.value_and_grad(loss)(gates)

    rng = np.random.default_rng(9)
    v_pl, g_pl = build_and_run(True)
    rng = np.random.default_rng(9)
    v_ref, g_ref = build_and_run(False)
    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-5)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-6)


def test_multi_group_diag_tape_parity(plane_mode):
    """A var diagonal spanning THREE groups (qubits 0, 7, 14 at n=15) plus a
    2-group diag in the same commuting stretch: plane engine vs complex
    engine, values and gradients (closes the >2-group-diagonal fallback)."""
    n = 15
    rng = np.random.default_rng(13)

    def run(force_plane):
        config.set_plane_engine(True if force_plane else False)
        c = AutoGradCircuit(n, dtype=C64)
        c.add_diag_gate([14, 7, 0], var=True)
        c.add_q2_var_gate_diag(8, 1)
        c.add_q1_var_gate(2)
        c.get_q1_dens_op_with_grad(0)
        c.get_q1_dens_op_with_grad(14)
        _, adiff = c.build()

        r = np.random.default_rng(13)
        d3 = np.exp(1j * r.normal(size=8)).astype(np.complex64)
        d2 = np.exp(1j * r.normal(size=4)).astype(np.complex64)
        u = rand_su2(r).reshape(-1)
        gates = [jnp.asarray(d3), jnp.asarray(d2), jnp.asarray(u)]

        def loss(gs):
            dens = adiff(gs, [])
            return sum(jnp.sum(jnp.abs(dm) ** 2) for dm in dens).real

        return jax.value_and_grad(loss)(gates)

    v_pl, g_pl = run(True)
    v_ref, g_ref = run(False)
    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-5)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-6)


def test_multi_group_diag_scan_parity(plane_mode):
    """Layer scan with a 3-group var diagonal: plane vs XLA scan engines."""
    n = 15
    c = AutoGradCircuit(n, dtype=C64)
    c.add_diag_gate([14, 7, 0], var=True)
    c.add_q1_var_gate(5)
    ftape = fuse_layer(c.tape)
    assert plane_tape_eligible(ftape, C64)

    rng = np.random.default_rng(17)
    L = 2
    d_st = jnp.asarray(np.exp(1j * rng.normal(size=(L, 8))).astype(np.complex64))
    u_st = jnp.asarray(np.stack(
        [rand_su2(rng).reshape(-1) for _ in range(L)]))
    stacked = (d_st, u_st)
    init = rand_state(n, seed=3)

    def loss_with(layers_fn):
        def loss(sg):
            state = layers_fn(ftape, init, sg, ())
            return jnp.sum(jnp.abs(state.reshape(-1)[: 1 << 9]) ** 2).real
        return loss

    v_ref, g_ref = jax.value_and_grad(loss_with(_scanned_layers_xla))(stacked)
    v_pl, g_pl = jax.value_and_grad(loss_with(plane_scanned_layers))(stacked)
    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-5)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-6)


def test_k3_dense_cross_tape_parity(plane_mode):
    """A var 3-qubit DENSE gate straddling two groups (qubits 5,6,7 and
    6,7,8 at n=15) through the plane-tape path: slice-decomposition
    accumulate sweeps must match the complex engine (values + grads)."""
    n = 15

    def run(force_plane):
        config.set_plane_engine(True if force_plane else False)
        c = AutoGradCircuit(n, dtype=C64)
        c.add_gate([5, 6, 7], var=True)    # 2 bits in lane, 1 in sublane
        c.add_gate([6, 7, 8], var=True)    # 1 bit in lane, 2 in sublane
        c.get_q1_dens_op_with_grad(6)
        c.get_q1_dens_op_with_grad(8)
        _, adiff = c.build()

        r = np.random.default_rng(23)
        def ru8():
            m = np.linalg.qr(r.normal(size=(8, 8))
                             + 1j * r.normal(size=(8, 8)))[0]
            return jnp.asarray(m.astype(np.complex64).reshape(-1))
        gates = [ru8(), ru8()]

        def loss(gs):
            dens = adiff(gs, [])
            return sum(jnp.sum(jnp.abs(dm) ** 2) for dm in dens).real

        return jax.value_and_grad(loss)(gates)

    v_pl, g_pl = run(True)
    v_ref, g_ref = run(False)
    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-5)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=5e-6)


@pytest.mark.slow
def test_hpair_merged_top_sweep_parity(plane_mode):
    """n=22 (groups 7,7,7,1): the dense blocks on group 2 and the tiny top
    group 3 must execute as ONE merged 256-axis sweep ('hpair'), with both
    blocks' gradients recovered from the merged pair-gram."""
    from dqc_tpu.circuit.plane_scan import plane_program

    n = 22
    c = AutoGradCircuit(n, dtype=C64)
    for i in range(n):
        c.add_q1_var_gate(i)
    for i in range(n - 1):
        c.add_q2_var_gate_diag(i, i + 1)
    ftape = fuse_layer(c.tape)
    program = plane_program(ftape)
    kinds = [it[0] for it in program]
    assert "hpair" in kinds, program  # g2+g3 merged
    assert kinds.count("dense") == 1  # only the minor dual remains

    rng = np.random.default_rng(29)
    L = 1
    stacked = tuple(
        jnp.asarray(np.stack([rand_su2(rng) for _ in range(L)]))
        for _ in range(n)
    ) + tuple(
        jnp.asarray(np.stack(
            [np.exp(1j * rng.normal() * np.array([1, -1, -1, 1])).astype(np.complex64)
             for _ in range(L)]))
        for _ in range(n - 1)
    )
    init = rand_state(n, seed=4)

    def loss_with(layers_fn):
        def loss(sg):
            state = layers_fn(ftape, init, sg, ())
            return jnp.sum(jnp.abs(state.reshape(-1)[: 1 << 10]) ** 2).real
        return loss

    v_ref, g_ref = jax.value_and_grad(loss_with(_scanned_layers_xla))(stacked)
    v_pl, g_pl = jax.value_and_grad(loss_with(plane_scanned_layers))(stacked)
    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-5)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-6)


@pytest.mark.slow
def test_merged_seed_and_gram_epilogue_parity(plane_mode):
    """Full model value+grad at 22q (tiny top group): the epilogue computes
    both top-group Grams from ONE merged read and the density seeds for the
    top two groups apply as ONE merged-axis pass — parity vs the complex
    engine."""
    from dqc_tpu.models.hardware_efficient import HardwareEfficientAnsatz

    m = HardwareEfficientAnsatz(22, 1, entangler="cz", dtype=C64, scan=True)
    params = m.init_params(jax.random.PRNGKey(11))

    v_pl, g_pl = jax.value_and_grad(m.magnetization)(params)
    config.set_plane_engine(False)
    v_ref, g_ref = jax.value_and_grad(m.magnetization)(params)

    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=3e-5, atol=3e-6)


def test_xcross_and_cross_density_parity(plane_mode):
    """The universal plane tape: a dense 3q gate spanning THREE groups plus
    cross-group density requests — values and gradients vs the complex
    engine (round-2 closes the last fallbacks)."""
    n = 15

    def run(force_plane):
        config.set_plane_engine(True if force_plane else False)
        c = AutoGradCircuit(n, dtype=C64)
        c.add_gate([0, 7, 14], var=True)   # dense over groups 0, 1, 2
        c.add_q1_var_gate(3)
        c.get_q2_dens_op_with_grad(7, 6)   # cross-group density (0|1)
        c.get_q2_dens_op_with_grad(14, 0)  # cross-group density (0|2)
        c.get_q1_dens_op_with_grad(2)
        _, adiff = c.build()

        r = np.random.default_rng(31)
        m = np.linalg.qr(r.normal(size=(8, 8)) + 1j * r.normal(size=(8, 8)))[0]
        gates = [jnp.asarray(m.astype(np.complex64).reshape(-1)),
                 jnp.asarray(rand_su2(r).reshape(-1))]

        def loss(gs):
            dens = adiff(gs, [])
            return sum(jnp.sum(jnp.abs(dm) ** 2) for dm in dens).real

        return jax.value_and_grad(loss)(gates)

    v_pl, g_pl = run(True)
    v_ref, g_ref = run(False)
    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-5)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=5e-6)


@pytest.mark.slow
def test_vqe_epilogue_cross_density_plane_parity(plane_mode):
    """VQE-Ising's real epilogue (q2 densities on the ring incl. the
    group-boundary and closure pairs) through the plane std op — the
    cross-group density + cross-seed path."""
    from dqc_tpu.circuit.plane_scan import plane_epilogue_eligible
    from dqc_tpu.models.vqe_ising import VQEIsing

    m = VQEIsing(15, 2, dtype=C64, scan=True)
    assert plane_epilogue_eligible(m._epi_ftape, C64)
    params = m.init_params(jax.random.PRNGKey(17))

    v_pl, g_pl = jax.value_and_grad(m.energy)(params)
    config.set_plane_engine(False)
    v_ref, g_ref = jax.value_and_grad(m.energy)(params)

    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=3e-5, atol=3e-6)


@pytest.mark.slow
def test_dist_plane_std_pipeline_parity(plane_mode):
    """The fully plane-resident distributed pipeline (local standard
    planes -> const prologue -> layer scan -> psum'd density epilogue)
    must match the complex distributed path: VQE at n=16 over 2 devices
    (m=15 local qubits >= 14 so the plane path engages)."""
    import numpy as np
    from jax.sharding import Mesh
    from dqc_tpu.models.vqe_ising import VQEIsing
    from dqc_tpu.parallel.plane_scan import use_dist_plane_std

    devs = np.array(jax.devices()[:2])
    if len(devs) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = Mesh(devs, ("q",))

    m = VQEIsing(16, 2, dtype=C64, scan=True)
    energy_pl = m.build_distributed_energy(mesh, axis="q")
    params = m.init_params(jax.random.PRNGKey(3))
    v_pl, g_pl = jax.value_and_grad(energy_pl)(params)

    config.set_plane_engine(False)
    energy_ref = m.build_distributed_energy(mesh, axis="q")
    v_ref, g_ref = jax.value_and_grad(energy_ref)(params)

    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=3e-5, atol=3e-6)

    # and vs the single-device engine
    v_1, g_1 = jax.value_and_grad(m.energy)(params)
    np.testing.assert_allclose(float(v_pl), float(v_1), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_1),
                               rtol=3e-5, atol=3e-6)


def test_sink_diag_items_schedule():
    """Commutation-aware diag sinking: a rotations-then-entanglers layer
    collapses to one diag run per layer; overlapping dense sweeps and
    density readouts are barriers; the VQE shape keeps its ddual fold."""
    from dqc_tpu.circuit.plane_scan import plane_program

    n = 29
    ftape, _, _ = build_layer(n, seed=3)
    prog = plane_program(ftape)
    kinds = [it[0] for it in prog]
    # all diagonals merged into ONE trailing run; dense sweeps first
    assert kinds.count("diag") == 1, kinds
    assert kinds[-1] == "diag", kinds
    fwd = sum(1 for k in kinds)  # one pass per item in this program
    assert fwd <= 5, kinds

    # entanglers-FIRST layer: the run folds into the dual sweep (ddual)
    c = AutoGradCircuit(n, dtype=C64)
    cz = np.array([1, 1, 1, -1], dtype=np.complex64)
    for i in range(n - 1):
        c.add_q2_const_gate_diag(i, i + 1)
    for i in range(n):
        c.add_q1_var_gate(i)
    ft2 = fuse_layer(c.tape)
    kinds2 = [it[0] for it in plane_program(ft2)]
    assert "ddual" in kinds2, kinds2

    # density readout is a barrier: a diag AFTER the readout must not
    # merge with one before it
    c3 = AutoGradCircuit(n, dtype=C64)
    c3.add_q2_const_gate_diag(0, 1)
    c3.get_q1_dens_op(5)
    c3.add_q2_const_gate_diag(2, 3)
    ft3 = fuse_tape(c3.tape)
    kinds3 = [it[0] for it in plane_program(ft3)]
    assert kinds3 == ["diag", "dens", "diag"], kinds3


def test_rotated_scan_parity(plane_mode):
    """Const trailing diag run: the rotations-then-entanglers layer now
    folds WHOLE into one ddual-after kernel pass (subsuming the scan
    rotation for minor-adjacent runs — the rotation path itself is pinned
    by test_rotation_behind_barrier below); value + every cotangent
    (gates AND the initial state) match the XLA engine through
    plane_scanned_layers."""
    from dqc_tpu.circuit.plane_scan import plane_program

    n = 14
    c = AutoGradCircuit(n, dtype=C64)
    for i in range(n):
        c.add_q1_var_gate(i)
    consts = []
    cz = np.array([1, 1, 1, -1], dtype=np.complex64)
    for i in range(n - 1):
        c.add_q2_const_gate_diag(i, i + 1)
        consts.append(cz)
    ftape = fuse_layer(c.tape)
    prog = plane_program(ftape)
    assert [it[0] for it in prog] == ["ddual"] and prog[0][4] is False, prog

    L = 3
    stacked = tuple(
        jnp.asarray(np.stack([rand_su2(np.random.default_rng(31 * l + q))
                              for l in range(L)]))
        for q in range(n))
    init = rand_state(n, seed=5)

    def loss_with(layers_fn):
        def loss(stacked_gates, init_state):
            state = layers_fn(ftape, init_state, stacked_gates, tuple(consts))
            return jnp.sum(jnp.abs(state[:64]) ** 2).real
        return loss

    v_ref, g_ref = jax.value_and_grad(
        loss_with(_scanned_layers_xla), argnums=(0, 1))(stacked, init)
    v_pl, g_pl = jax.value_and_grad(
        loss_with(plane_scanned_layers), argnums=(0, 1))(stacked, init)
    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_pl),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)

    # L=1 degenerates to the unrotated path
    one = tuple(g[:1] for g in stacked)
    v1r = loss_with(_scanned_layers_xla)(one, init)
    v1p = loss_with(plane_scanned_layers)(one, init)
    np.testing.assert_allclose(float(v1p), float(v1r), rtol=2e-5)


@pytest.mark.slow
def test_rotation_behind_barrier(plane_mode):
    """The scan rotation still fires where no fold can reach the trailing
    const diag run: a dense CROSS gate sits between the minor dual and the
    run (the 29q/30q hpair-shaped case at CPU-testable scale); value +
    cotangents match the XLA engine and L=1 degenerates."""
    from dqc_tpu.circuit.plane_scan import (_rotatable_const_diag,
                                            plane_program)

    n = 14
    c = AutoGradCircuit(n, dtype=C64)
    for i in range(n):
        c.add_q1_var_gate(i)
    c.add_q2_var_gate(3, 9)  # cross-group dense: blocks ddual/dhigh folds
    consts = []
    cz = np.array([1, 1, 1, -1], dtype=np.complex64)
    for i in range(n - 1):
        c.add_q2_const_gate_diag(i, i + 1)
        consts.append(cz)
    ftape = fuse_layer(c.tape)
    prog = plane_program(ftape)
    assert prog[-1][0] == "diag", prog
    assert _rotatable_const_diag(prog, ftape) is not None

    L = 3
    stacked = tuple(
        jnp.asarray(np.stack([rand_su2(np.random.default_rng(31 * l + q))
                              for l in range(L)]))
        for q in range(n)) + (
        jnp.asarray(np.stack([
            np.asarray(np.linalg.qr(np.random.default_rng(77 + l)
                                    .standard_normal((4, 4))
                                    + 1j * np.random.default_rng(78 + l)
                                    .standard_normal((4, 4)))[0],
                       dtype=np.complex64)
            for l in range(L)])),
    )
    init = rand_state(n, seed=5)

    def loss_with(layers_fn):
        def loss(stacked_gates, init_state):
            state = layers_fn(ftape, init_state, stacked_gates, tuple(consts))
            return jnp.sum(jnp.abs(state[:64]) ** 2).real
        return loss

    v_ref, g_ref = jax.value_and_grad(
        loss_with(_scanned_layers_xla), argnums=(0, 1))(stacked, init)
    v_pl, g_pl = jax.value_and_grad(
        loss_with(plane_scanned_layers), argnums=(0, 1))(stacked, init)
    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_pl),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=3e-6)

    one = tuple(g[:1] for g in stacked)
    v1r = loss_with(_scanned_layers_xla)(one, init)
    v1p = loss_with(plane_scanned_layers)(one, init)
    np.testing.assert_allclose(float(v1p), float(v1r), rtol=2e-5)


@pytest.mark.parametrize("order", [
    pytest.param("diag_then_dense", marks=pytest.mark.slow),
    "dense_then_diag",  # the distributed layer-segment shape stays default
])
def test_dhigh_fold_parity(order, plane_mode):
    """The dhigh fold (diag run fused into a high-group dense sweep, either
    tape order) fires for high-rotations + entangler-ring layers with no
    minor dense sweep, and value+grad match the XLA engine exactly — the
    distributed layer-segment shape (parallel/scan.py localizes global
    qubits onto a high group)."""
    from dqc_tpu.circuit import plane_scan as ps

    n = 17  # groups (7, 7, 3): g2 X = 8 (kernel-tileable), pre = post = 1
    rng = np.random.default_rng(23)
    c = AutoGradCircuit(n, dtype=C64)
    nv = []
    if order == "diag_then_dense":
        for i in range(n - 1):
            c.add_q2_var_gate_diag(i, i + 1)
        for q in (14, 15, 16):
            c.add_q1_var_gate(q)
    else:
        for q in (14, 15, 16):
            c.add_q1_var_gate(q)
        for i in range(n - 1):
            c.add_q2_var_gate_diag(i, i + 1)
    c.get_q1_dens_op_with_grad(0)
    c.get_q1_dens_op_with_grad(15)
    _, autodiff_run = c.build()

    prog = ps.plane_program(fuse_tape(c.tape))
    kinds = [it[0] for it in prog]
    assert "dhigh" in kinds, kinds
    item = prog[kinds.index("dhigh")]
    assert item[3] == (order == "diag_then_dense"), (order, item)

    gates = []
    if order != "diag_then_dense":
        gates += [jnp.asarray(rand_su2(rng)) for _ in (14, 15, 16)]
    gates += [
        jnp.asarray(np.exp(1j * rng.normal()
                           * np.array([1, -1, -1, 1])).astype(np.complex64))
        for _ in range(n - 1)
    ]
    if order == "diag_then_dense":
        gates += [jnp.asarray(rand_su2(rng)) for _ in (14, 15, 16)]

    w = [np.arange(1, 5, dtype=np.float64).reshape(2, 2)] * 2

    def loss(gs, engine):
        config.set_plane_engine(engine)
        dens = autodiff_run(gs, ())
        return sum(jnp.sum(jnp.real(d) * wi) for d, wi in zip(dens, w))

    v0, g0 = jax.value_and_grad(lambda gs: loss(gs, False))(tuple(gates))
    v1, g1 = jax.value_and_grad(lambda gs: loss(gs, True))(tuple(gates))
    np.testing.assert_allclose(float(v1), float(v0), rtol=2e-5)
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("seed", [0,
                                  pytest.param(1, marks=pytest.mark.slow),
                                  pytest.param(2, marks=pytest.mark.slow),
                                  pytest.param(3, marks=pytest.mark.slow)])
def test_random_tape_plane_parity(seed, plane_mode):
    """Property test at plane-engine scale: random mixed tapes (1q/2q dense
    anywhere incl. high qubits, diagonals of any span, var/const mix, random
    densities) give identical values and gradients on the plane engine vs
    the fused XLA path — fuzzes the fold interactions (ddual/dhigh/hpair/
    mdiag adjacency) that targeted parity tests fix one at a time."""
    rng = np.random.default_rng(400 + seed)
    n = int(rng.integers(15, 17))
    c = AutoGradCircuit(n, dtype=C64)
    var_gates, const_gates = [], []

    def rand_dense(k):
        m = np.random.default_rng(rng.integers(1 << 30)).standard_normal(
            (1 << k, 1 << k)) + 1j * np.random.default_rng(
            rng.integers(1 << 30)).standard_normal((1 << k, 1 << k))
        q, _ = np.linalg.qr(m)
        return jnp.asarray(q.astype(np.complex64))

    n_instr = int(rng.integers(12, 25))
    n_diff = 0
    for _ in range(n_instr):
        kind = int(rng.integers(0, 5))
        var = bool(rng.integers(0, 2))
        if kind == 0:    # 1q dense anywhere (high qubits exercise dhigh)
            pos = int(rng.integers(0, n))
            c.add_gate((pos,), var=var, unitary=True)
            (var_gates if var else const_gates).append(rand_dense(1))
        elif kind == 1:  # 2q dense (in-group or cross-group)
            p = rng.choice(n, size=2, replace=False)
            c.add_gate((int(p[0]), int(p[1])), var=var, unitary=True)
            (var_gates if var else const_gates).append(rand_dense(2))
        elif kind == 2:  # 2q diag
            p = rng.choice(n, size=2, replace=False)
            c.add_diag_gate((int(p[0]), int(p[1])), var=var)
            d = jnp.asarray(np.exp(1j * rng.normal(size=4)).astype(
                np.complex64))
            (var_gates if var else const_gates).append(d)
        elif kind == 3:  # 3q diag (mdiag shapes)
            p = rng.choice(n, size=3, replace=False)
            c.add_diag_gate(tuple(int(x) for x in p), var=var)
            d = jnp.asarray(np.exp(1j * rng.normal(size=8)).astype(
                np.complex64))
            (var_gates if var else const_gates).append(d)
        else:            # density
            k = int(rng.integers(1, 3))
            p = rng.choice(n, size=k, replace=False)
            diff = bool(rng.integers(0, 2))
            n_diff += int(diff)
            c.get_dens_op(tuple(int(x) for x in p), with_grad=diff)
    if n_diff == 0:
        c.get_q1_dens_op_with_grad(0)
    _, run = c.build()

    def loss_of(engine):
        def loss(vg):
            config.set_plane_engine(engine)
            dens = run(vg, tuple(const_gates))
            return sum(jnp.sum(jnp.abs(d) ** 2) for d in dens).real
        return loss

    vg = tuple(var_gates)
    if not vg:
        np.testing.assert_allclose(float(loss_of(True)(vg)),
                                   float(loss_of(False)(vg)), rtol=2e-5)
        return
    v_pl, g_pl = jax.value_and_grad(loss_of(True))(vg)
    v_ref, g_ref = jax.value_and_grad(loss_of(False))(vg)
    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-5)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-6)


@pytest.mark.slow
def test_distributed_dhigh_segment_parity(plane_mode):
    """At 20 qubits / 8 devices the local shard is m = 17 (three groups):
    the layer's 'localized globals' segment plans as [dense(high rotations),
    diag(entanglers)] and must fold to ONE dhigh pass — value + grads match
    the XLA distributed engine on the virtual mesh."""
    from jax.sharding import PartitionSpec as P
    from dqc_tpu.parallel import dist as pdist, make_mesh
    from dqc_tpu.parallel.fused_executor import FSeg
    from dqc_tpu.parallel.plane_scan import (
        dist_plane_eligible,
        dist_plane_scanned_layers,
    )
    from dqc_tpu.parallel.scan import dist_scanned_layers, plan_layer_roundtrip
    from dqc_tpu.circuit import plane_scan as ps

    n, k, L = 20, 3, 1
    mesh = make_mesh(8)
    axis = mesh.axis_names[0]

    layer = AutoGradCircuit(n, dtype=C64)
    for i in range(n):
        layer.add_q1_var_gate(i)
    for i in range(n - 1):
        layer.add_q2_var_gate_diag(i, i + 1)
    prog = plan_layer_roundtrip(layer.tape, k)
    assert dist_plane_eligible(prog, C64)
    seg_kinds = [[it[0] for it in ps.plane_program(di.ftape)]
                 for di in prog.instructions if isinstance(di, FSeg)]
    assert any("dhigh" in kinds for kinds in seg_kinds), seg_kinds

    rng = np.random.default_rng(19)
    stacked = tuple(
        jnp.asarray(np.stack([rand_su2(rng) for _ in range(L)]))
        for _ in range(n)
    ) + tuple(
        jnp.asarray(np.stack([
            np.exp(1j * rng.normal() * np.array([1, -1, -1, 1])).astype(np.complex64)
            for _ in range(L)]))
        for _ in range(n - 1)
    )

    def make_fn(layers_fn):
        def shard_fn(stacked_gates):
            local = pdist.local_standard_state(n, k, axis, C64)
            local = layers_fn(prog, axis, local, stacked_gates, ())
            return jax.lax.psum(jnp.sum(jnp.abs(local[:128]) ** 2), axis)
        fn = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(jax.tree_util.tree_map(lambda _: P(), stacked),),
            out_specs=P(), check_vma=False)
        return lambda sg: fn(sg).real

    v_p, g_p = jax.value_and_grad(make_fn(dist_plane_scanned_layers))(stacked)
    v_r, g_r = jax.value_and_grad(make_fn(dist_scanned_layers))(stacked)
    np.testing.assert_allclose(float(v_p), float(v_r), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_p), jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=5e-6)


def test_ddual_after_fold_parity(plane_mode):
    """[dense-minor, diag] order folds into one ddual kernel pass (the
    dual kernel's diag-AFTER side) — at 16q the tiny high group (X=4)
    makes the minor dual the only fold target; value+grad match the XLA
    engine."""
    from dqc_tpu.circuit import plane_scan as ps

    n = 16
    rng = np.random.default_rng(31)
    c = AutoGradCircuit(n, dtype=C64)
    for q in range(14):
        c.add_q1_var_gate(q)
    for i in range(13):
        c.add_q2_var_gate_diag(i, i + 1)
    c.get_q1_dens_op_with_grad(3)
    _, run = c.build()

    prog = ps.plane_program(fuse_tape(c.tape))
    assert prog[0][0] == "ddual" and prog[0][4] is False, prog

    gates = [jnp.asarray(rand_su2(rng)) for _ in range(14)] + [
        jnp.asarray(np.exp(1j * rng.normal()
                           * np.array([1, -1, -1, 1])).astype(np.complex64))
        for _ in range(13)]
    w = np.arange(1, 5, dtype=np.float64).reshape(2, 2)

    def loss(gs, engine):
        config.set_plane_engine(engine)
        return jnp.sum(jnp.real(run(gs, ())[0]) * w)

    v0, g0 = jax.value_and_grad(lambda g: loss(g, False))(tuple(gates))
    v1, g1 = jax.value_and_grad(lambda g: loss(g, True))(tuple(gates))
    np.testing.assert_allclose(float(v1), float(v0), rtol=2e-5)
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_locality_reorder_plan_shape():
    """reorder_for_locality collapses the rotations-then-entanglers layer
    to TWO layouts: the plan has exactly one swap + its restore and the
    segments fold to [dense, dhigh] / [ddual] (3 fwd passes total)."""
    from dqc_tpu.parallel.fused_executor import FSeg
    from dqc_tpu.parallel.layout import DCycle, DSwap
    from dqc_tpu.parallel.scan import plan_layer_roundtrip
    from dqc_tpu.circuit import plane_scan as ps

    n, k = 20, 3
    layer = AutoGradCircuit(n, dtype=C64)
    for i in range(n):
        layer.add_q1_var_gate(i)
    for i in range(n - 1):
        layer.add_q2_const_gate_diag(i, i + 1)
    dprog = plan_layer_roundtrip(layer.tape, k)
    assert dprog.var_perm is not None
    swaps = [di for di in dprog.instructions
             if isinstance(di, (DSwap, DCycle))]
    segs = [[it[0] for it in ps.plane_program(di.ftape)]
            for di in dprog.instructions if isinstance(di, FSeg)]
    assert len(swaps) == 2, dprog.instructions
    assert sum(len(s) for s in segs) == 3, segs
