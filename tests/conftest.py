"""Test configuration: CPU backend with an 8-device virtual mesh.

Multi-device sharding is validated on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``), replacing the reference's
"single GPU only" restriction (reference README.md:13); real-TPU execution is
exercised by bench.py. x64 is enabled for the f64 gradient gauntlet
(reference src/test_autodiff.py:165 requires rel. err < 1e-9).

The platform is forced via jax.config (not the JAX_PLATFORMS env var) because
a sitecustomize-registered TPU PJRT plugin may have already overridden the
env var selection by the time this file runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# DQC_TEST_TPU=1 keeps the real backend for the `tpu`-marked on-hardware
# kernel regression tests (tests/test_tpu_kernels.py); everything else runs
# on the virtual CPU mesh.
if os.environ.get("DQC_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
