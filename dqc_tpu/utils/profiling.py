"""Profiling helpers.

The reference profiles externally with Nsight Compute (`make profile`,
reference src/Makefile:27-28); the TPU equivalents are jax.profiler traces
(viewable in XProf/TensorBoard) plus simple wall-clock sweep accounting.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str = "/tmp/dqc_trace"):
    """Capture a jax.profiler trace around a block of device work."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def synced(x) -> float:
    """Force true completion of ``x`` and return a checksum.

    On remote-tunnel TPU backends ``block_until_ready`` can return before
    execution finishes; fetching a (real) scalar to the host cannot.
    """
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(jnp.abs(leaf.reshape(-1)[:8])))


def time_fn(fn: Callable, *args, reps: int = 3, warmup: int = 1) -> float:
    """Median-free simple timer: seconds per call, fetch-synced."""
    for _ in range(warmup):
        synced(fn(*args))
    best = float("inf")
    for _ in range(max(1, reps)):
        t0 = time.time()
        out = fn(*args)
        synced(out)
        best = min(best, time.time() - t0)
    return best


def sweep_stats(n_qubits: int, seconds_per_sweep: float, hbm_gbps: float = 819.0):
    """Fraction of HBM speed-of-light for one read+write statevector sweep."""
    bytes_moved = (1 << n_qubits) * 8 * 2  # complex64 read + write
    achieved = bytes_moved / seconds_per_sweep / 1e9
    return {"achieved_GBps": achieved, "sol_fraction": achieved / hbm_gbps}


def device_info() -> dict:
    """Backend/device summary (the reference's GPU_PROPERTIES introspection,
    reference primitives.cu:1081-1095)."""
    devs = jax.devices()
    return {
        "backend": jax.default_backend(),
        "device_count": len(devs),
        "devices": [str(d) for d in devs],
        "platform_version": getattr(devs[0].client, "platform_version", "?")
        if devs else "?",
    }
