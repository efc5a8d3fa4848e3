"""Segmented (watchdog-bounded) execution vs the single-call plane engine.

The segmented driver (circuit/segmented.py) splits one fwd+grad step into
bounded jit calls with the plane pairs carried between them; chunk
boundaries are pure scan splits, so values and gradients must match the
single-call engine. Covers both program shapes: the cz entangler at 14q
folds via ddual/dhigh (no rotation), while a barrier shape keeps the
const-trailing-diag scan rotation (head/body/tail segmentation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqc_tpu import config
from dqc_tpu.circuit import segmented
from dqc_tpu.models.hardware_efficient import HardwareEfficientAnsatz


@pytest.fixture(autouse=True)
def _force_plane_engine():
    config.set_plane_engine(True)
    yield
    config.set_plane_engine("auto")
    segmented.segmented_cache_clear()


def test_chunk_sizes():
    assert segmented.chunk_sizes(7, 3) == [3, 2, 2]
    assert segmented.chunk_sizes(6, 3) == [3, 3]
    assert segmented.chunk_sizes(2, 5) == [2]
    assert segmented.chunk_sizes(0, 4) == []
    assert sum(segmented.chunk_sizes(99, 25)) == 99
    assert max(segmented.chunk_sizes(99, 25)) <= 25


@pytest.mark.parametrize("layers,max_chunk", [(5, 2), (4, 4)])
def test_segmented_matches_single_call(layers, max_chunk):
    model = HardwareEfficientAnsatz(14, layers, entangler="cz", scan=True)
    params = model.init_params(jax.random.PRNGKey(7))

    v_ref, g_ref = jax.value_and_grad(model.magnetization)(params)
    v_seg, g_seg = model.magnetization_value_and_grad_segmented(
        params, max_chunk=max_chunk)

    assert np.isfinite(float(v_seg))
    np.testing.assert_allclose(float(v_seg), float(v_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_seg), np.asarray(g_ref),
                               rtol=2e-5, atol=1e-6)


def test_segmented_requires_scan_mode():
    model = HardwareEfficientAnsatz(14, 2, entangler="cz", scan=False)
    params = model.init_params(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="scan mode"):
        model.magnetization_value_and_grad_segmented(params)
