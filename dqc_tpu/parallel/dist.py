"""Per-shard statevector primitives (used inside ``shard_map``).

The distributed layout: a statevector over ``n`` qubits on ``D = 2^k``
devices keeps a flat local shard of ``2^(n-k)`` amplitudes per device.
Physical slots ``0..m-1`` (``m = n-k``) are bits of the local index; slots
``m..n-1`` are device-axis bits (slot ``m+j`` = bit ``j`` of the device
index). Which *logical* qubit sits in which slot is tracked statically by the
planner (parallel/layout.py).

The one communication primitive is :func:`swap_global_block` — the
qubit-permutation all-to-all (SURVEY.md §5 "long-context" analog): it
exchanges the whole k-bit device block with k chosen local bits in a single
``jax.lax.all_to_all`` over ICI, after which previously-global qubits are
local and gates on them need no further communication. Observables finish
with a ``psum`` (the distributed analog of the reference's per-block
reduction + host sum, primitives.cu:264-291).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from dqc_tpu import config
from dqc_tpu.ops.statevector import (
    _qubits_to_front,
    _qubits_from_front,
    num_qubits,
)


def local_standard_state(n: int, k: int, axis: str, dtype=None) -> jax.Array:
    """Local shard of |0...0>: one-hot at 0 on device 0, zeros elsewhere."""
    dtype = config.canonicalize_complex(dtype)
    m = n - k
    local = jnp.zeros((1 << m,), dtype)
    dev = jax.lax.axis_index(axis)
    amp = jnp.where(dev == 0, 1.0, 0.0).astype(dtype)
    return local.at[0].set(amp)


def swap_global_block(local: jax.Array, local_positions: Sequence[int], axis: str) -> jax.Array:
    """Exchange the k device bits with k local bits in one all-to-all.

    ``local_positions`` is msb-first like every positions tuple: axis bit
    ``j`` of the extracted ``2^k`` axis corresponds to
    ``local_positions[k-1-j]``, and after the exchange the logical qubit that
    was on device bit ``j`` sits at ``local_positions[k-1-j]`` (and vice
    versa). Self-inverse: applying the same swap twice is the identity, which
    the O(1)-memory adjoint uses to uncompute (transpose of a permutation is
    its inverse).
    """
    positions = tuple(int(p) for p in local_positions)
    mat, restore = _qubits_to_front(local, positions, num_qubits(local))
    # mat: (2^k, M) with 2^k == mesh-axis size. Device d sends row e to
    # device e; received row d' holds what device d' stored at row `me`.
    swapped = jax.lax.all_to_all(mat, axis, split_axis=0, concat_axis=0, tiled=True)
    return _qubits_from_front(swapped, restore, local.shape)


def local_density(local: jax.Array, positions: Sequence[int], axis: str) -> jax.Array:
    """Reduced density matrix of *local* qubits: local partial + psum."""
    positions = tuple(int(p) for p in positions)
    mat, _ = _qubits_to_front(local, positions, num_qubits(local))
    partial = jnp.matmul(mat, mat.conj().T, precision=config.matmul_precision())
    return jax.lax.psum(partial, axis)
