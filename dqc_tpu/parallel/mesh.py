"""Device-mesh helpers for the distributed statevector.

The reference is strictly single-device (SURVEY.md §2.4: no NCCL/MPI, one
GPU, one stream). Here the ``2^n`` amplitude vector shards over a 1-D
``jax.sharding.Mesh``: the top ``k = log2(n_devices)`` qubits map to the
device axis, collectives ride ICI (`all_to_all` for qubit relabeling, `psum`
for observables).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXIS = "sv"  # default mesh-axis name for the statevector shard dimension


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None,
              axis: str = AXIS) -> Mesh:
    """Build a 1-D mesh over ``n_devices`` (must be a power of two)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
        # round down to a power of two
        n_devices = 1 << (n_devices.bit_length() - 1)
    if n_devices & (n_devices - 1):
        raise ValueError(f"n_devices must be a power of two, got {n_devices}")
    if n_devices > len(devices):
        raise ValueError(f"asked for {n_devices} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_devices]), (axis,))


def mesh_bits(mesh: Mesh, axis: str = AXIS) -> int:
    """k = log2(devices on the sharded axis)."""
    size = mesh.shape[axis]
    k = size.bit_length() - 1
    if (1 << k) != size:
        raise ValueError(f"mesh axis {axis} size {size} is not a power of two")
    return k
