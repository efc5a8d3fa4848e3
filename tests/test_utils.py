"""Utility-layer tests: boundary marshalling round-trips, profiling
accounting, checkpoint save/restore."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dqc_tpu.utils import boundary
from dqc_tpu.utils.profiling import sweep_stats, time_fn


def test_boundary_roundtrip_complex():
    rng = np.random.default_rng(0)
    z = rng.normal(size=(3, 4)) + 1j * rng.normal(size=(3, 4))
    pair = boundary.split_pair(z)
    assert pair.shape == (2, 3, 4)
    assert pair.dtype == np.float64
    back = boundary.unpack_to_numpy(pair)
    np.testing.assert_allclose(back, z)


def test_boundary_roundtrip_real():
    x = np.arange(6.0).reshape(2, 3)
    pair = boundary.split_pair(x)
    np.testing.assert_array_equal(pair[1], 0)
    np.testing.assert_allclose(boundary.unpack_to_numpy(pair), x)


def test_boundary_merge_inside_trace():
    pair = boundary.split_pair(np.array([1 + 2j, 3 - 4j], np.complex64))

    @jax.jit
    def f(p):
        z = boundary.merge_pair(p)
        return boundary.pack_complex(z * 2)

    out = boundary.unpack_to_numpy(f(jnp.asarray(pair)))
    np.testing.assert_allclose(out, [2 + 4j, 6 - 8j], rtol=1e-6)


def test_tree_has_tracer():
    assert not boundary.tree_has_tracer([np.ones(3)], ())

    seen = {}

    def f(x):
        seen["t"] = boundary.tree_has_tracer((x,))
        return x

    jax.jit(f)(jnp.ones(2))
    assert seen["t"]


def test_sweep_stats():
    s = sweep_stats(26, seconds_per_sweep=1.31e-3, hbm_gbps=819.0)
    assert abs(s["sol_fraction"] - 1.0) < 0.01


def test_time_fn():
    f = jax.jit(lambda x: x * 2)
    t = time_fn(f, jnp.ones(128), reps=2)
    assert t > 0


def test_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from dqc_tpu.utils import checkpoint

    tree = {"params": jnp.arange(4.0), "step": jnp.asarray(7)}
    path = str(tmp_path / "ckpt")
    checkpoint.save(path, tree)
    back = checkpoint.restore(path, like=tree)
    np.testing.assert_allclose(back["params"], tree["params"])
    assert int(back["step"]) == 7


def test_concrete_inputs_inside_outer_jit():
    """All-concrete gate lists called INSIDE someone else's jit must take
    the traced path: the eager path's host-side unpacking would see traced
    core outputs (tree_has_tracer also checks the ambient trace state)."""
    import jax
    import jax.numpy as jnp

    from qdc import AutoGradCircuit

    c = AutoGradCircuit(4)
    c.add_q1_const_gate(0)
    c.get_q1_dens_op_with_grad(0)
    h = (np.array([[1, 1], [1, -1]]) / np.sqrt(2)).astype(
        np.complex64).reshape(-1)
    sf = c.build_state_fn()
    _, arun = c.build()

    @jax.jit
    def f():
        s = sf([], [h])
        d = arun([], [h])
        return jnp.sum(jnp.abs(s) ** 2).real + jnp.real(d[0][0, 0])

    np.testing.assert_allclose(float(f()), 1.5, rtol=1e-6)
    # the eager contract is unchanged: numpy complex out
    assert np.iscomplexobj(np.asarray(sf([], [h])))
