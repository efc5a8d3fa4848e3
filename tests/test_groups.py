"""Grouped-axis engine parity vs the rank-generic ops (which are themselves
oracle-tested in test_ops.py). Exercises every path: in-group, cross-group
(Schmidt), diagonals, sub-block reductions, group grams."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dqc_tpu.ops import statevector as sv
from dqc_tpu.ops import groups as gr

import oracles

C128 = jnp.complex128
N = 10  # groups: (7, 3) -> dims (8, 128)


@pytest.fixture
def rng():
    return np.random.default_rng(21)


def rand_state(rng, n=N):
    return jnp.asarray(oracles.random_state(rng, n), C128)


def test_group_structure():
    assert gr.group_sizes_low_first(10) == (7, 3)
    assert gr.group_dims(10) == (8, 128)
    assert gr.group_sizes_low_first(26) == (7, 7, 7, 5)
    assert gr.group_dims(26) == (32, 128, 128, 128)
    assert gr.group_of_bit(10, 3) == (0, 3)
    assert gr.group_of_bit(10, 9) == (1, 2)


@pytest.mark.parametrize("positions", [(2,), (5,), (8,), (3, 1), (6, 4), (9, 8), (4, 6)])
def test_apply_dense_in_group_and_cross(rng, positions):
    psi = rand_state(rng)
    k = len(positions)
    g = jnp.asarray(oracles.random_gate(rng, k), C128)
    t = gr.to_grouped(psi, N)
    got = gr.from_grouped(gr.apply_dense(t, g, positions, N))
    want = sv.apply_gate(psi, g, positions)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("positions", [(9, 2), (0, 8), (2, 9)])
def test_apply_dense_cross_group(rng, positions):
    psi = rand_state(rng)
    g = jnp.asarray(oracles.random_gate(rng, 2), C128)
    t = gr.to_grouped(psi, N)
    got = gr.from_grouped(gr.apply_dense(t, g, positions, N))
    want = sv.apply_gate(psi, g, positions)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("positions", [(3, 1), (6, 2), (9, 8), (9, 3), (1, 8)])
def test_apply_diag_grouped(rng, positions):
    psi = rand_state(rng)
    d = jnp.asarray(rng.normal(size=4) + 1j * rng.normal(size=4), C128)
    t = gr.to_grouped(psi, N)
    got = gr.from_grouped(gr.apply_diag(t, d, positions, N))
    want = sv.apply_diag(psi, d, positions)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_expand_in_group_matches_full(rng):
    # expansion on the full group equals the dense operator on those bits
    g = jnp.asarray(oracles.random_gate(rng, 2), C128)
    E = gr.expand_in_group(g, (4, 1), 7)
    psi7 = jnp.asarray(oracles.random_state(rng, 7), C128)
    got = E @ psi7
    want = sv.apply_gate(psi7, g, (4, 1))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_block_composition(rng):
    """Composing expanded gates equals sequential application."""
    psi = rand_state(rng)
    t = gr.to_grouped(psi, N)
    gates = [(jnp.asarray(oracles.random_gate(rng, 1), C128), (p,)) for p in (0, 3, 5)]
    gates.append((jnp.asarray(oracles.random_gate(rng, 2), C128), (6, 2)))
    E = jnp.eye(128, dtype=C128)
    for g, pos in gates:
        E = gr.expand_in_group(g, pos, 7) @ E
    got = gr.from_grouped(gr.apply_group_matrix(t, E, 0))
    want = psi
    for g, pos in gates:
        want = sv.apply_gate(want, g, pos)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("positions", [(2,), (8,), (3, 1), (9, 8), (9, 2), (2, 9), (0, 9)])
def test_subblocks_density(rng, positions):
    psi = rand_state(rng)
    t = gr.to_grouped(psi, N)
    got = gr.density(t, positions, N)
    want = sv.density(psi, positions)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_subblocks_interleaved_3q(rng):
    psi = rand_state(rng)
    t = gr.to_grouped(psi, N)
    positions = (2, 9, 4)  # group pattern (0, 1, 0): interleaved
    got = gr.density(t, positions, N)
    want = sv.density(psi, positions)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("positions", [(4,), (9, 1)])
def test_pair_grad_matches_v1(rng, positions):
    fwd = rand_state(rng)
    bwd = rand_state(rng)
    got = gr.pair_grad(gr.to_grouped(fwd, N), gr.to_grouped(bwd, N), positions, N)
    want = sv.gate_grad(fwd, bwd, positions)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_diag_pair_grad_matches_v1(rng):
    fwd = rand_state(rng)
    bwd = rand_state(rng)
    got = gr.diag_pair_grad(gr.to_grouped(fwd, N), gr.to_grouped(bwd, N), (8, 3), N)
    want = sv.diag_gate_grad(fwd, bwd, (8, 3))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_group_pair_gram_gives_block_grads(rng):
    """The T0 trick: per-gate grads of a fused block from one group gram."""
    psi_in = rand_state(rng)
    bwd_out = rand_state(rng)
    t_in = gr.to_grouped(psi_in, N)

    gs = [jnp.asarray(oracles.random_gate(rng, 1), C128) for _ in range(3)]
    rels = [(1,), (4,), (6,)]
    Es = [gr.expand_in_group(g, r, 7) for g, r in zip(gs, rels)]

    # forward through the block
    E_total = Es[2] @ Es[1] @ Es[0]
    t_out = gr.apply_group_matrix(t_in, E_total, 0)

    # reference grads: per-gate uncompute walk using v1 ops
    want = []
    state = psi_in
    states = [state]
    for g, r in zip(gs, rels):
        state = sv.apply_gate(state, g, r)
        states.append(state)
    ct = bwd_out
    cts = [None] * 3
    for i in range(2, -1, -1):
        cts[i] = ct
        ct = sv.apply_gate_transpose(ct, gs[i], rels[i])
    for i in range(3):
        want.append(sv.gate_grad(states[i], cts[i], rels[i]))

    # T0 trick: one gram + tiny matrix algebra
    T0 = gr.group_pair_gram(t_in, gr.to_grouped(bwd_out, N), 0)
    eye = jnp.eye(128, dtype=C128)
    for i in range(3):
        before = eye
        for m in range(i):
            before = Es[m] @ before
        after = eye
        for m in range(i + 1, 3):
            after = Es[m] @ after
        G_full_ct = after.T @ T0 @ before.T
        _, vjp = jax.vjp(lambda g: gr.expand_in_group(g, rels[i], 7), gs[i])
        got = vjp(G_full_ct)[0]
        np.testing.assert_allclose(got, want[i], rtol=1e-9, atol=1e-9)


# ---------------------------------------------------------------------------
# Constant-gate detection + expansion-cache regression guards
# ---------------------------------------------------------------------------

def test_constant_gate_detection_mechanism():
    """Constant detection must keep working across JAX upgrades.

    The fast path relies on the private ``jax.Array._npy_value`` cache of
    host-created arrays; if JAX renames it, this test fails loudly instead of
    the engine silently re-embedding one constant per gate occurrence
    (measured 1 GB of MLIR at 26 qubits without value-dedup)."""
    g = np.arange(4, dtype=np.complex64).reshape(2, 2)
    arr = jnp.asarray(g)
    got = gr.concrete_or_none(arr)
    assert got is not None, (
        "constant-gate detection broke for host-created jax arrays: neither "
        "_npy_value nor the CPU-fetch fallback worked on this JAX version"
    )
    np.testing.assert_array_equal(np.asarray(got), g)


def test_concrete_or_none_cpu_fallback(monkeypatch):
    """Even without the private attribute, concrete CPU arrays are detected
    (the version-robust fallback path)."""
    monkeypatch.setattr(gr, "_npy_value_of", lambda x: None)
    g = np.arange(4, dtype=np.complex64).reshape(2, 2)
    got = gr.concrete_or_none(jnp.asarray(g))
    assert got is not None
    np.testing.assert_array_equal(np.asarray(got), g)


def test_concrete_or_none_tracer():
    seen = []

    @jax.jit
    def f(x):
        seen.append(gr.concrete_or_none(x))
        return x

    f(jnp.ones(4, jnp.complex64))
    assert seen == [None]


def test_expand_cache_dedup_and_bound():
    gr._EXPAND_CACHE.clear()
    g = np.array([[0, 1], [1, 0]], dtype=np.complex64)
    a = gr.expand_in_group(g, (3,), 7)
    b = gr.expand_in_group(g, (3,), 7)
    assert a is b, "identical constant gates must share one expanded operator"

    # the cache is LRU-bounded
    for i in range(gr._EXPAND_CACHE_MAX + 10):
        d = np.array([1.0, np.exp(1j * (i + 1) * 1e-6)], dtype=np.complex64)
        gr.expand_diag_in_group(d, (0,), 3)
    assert len(gr._EXPAND_CACHE) <= gr._EXPAND_CACHE_MAX
    # recently-used entry survived eviction pressure from distinct values
    gr._EXPAND_CACHE.clear()
