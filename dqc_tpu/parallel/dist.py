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


def cycle_global_block(local: jax.Array, out_positions: Sequence[int],
                       in_positions: Sequence[int], axis: str) -> jax.Array:
    """Two composed block swaps in ONE all-to-all: the 3-cycle

        globals <- locals ``out_positions``,
        locals ``out_positions`` <- locals ``in_positions``,
        locals ``in_positions`` <- globals,

    i.e. exactly ``swap_global_block(swap_global_block(x, in_positions),
    out_positions)`` (bit-significance per tuple order, DSwap convention)
    at half the collectives and half the relayout passes: both blocks come
    to the front in one transpose, one all-to-all exchanges the out block
    with the device axis, and the restore transpose places the received
    block at ``in_positions`` while moving the in block to
    ``out_positions``. The inverse is the same cycle with the argument
    roles swapped."""
    out_p = tuple(int(p) for p in out_positions)
    in_p = tuple(int(p) for p in in_positions)
    assert not set(out_p) & set(in_p), (out_p, in_p)
    k = len(out_p)
    mat, restore = _qubits_to_front(local, out_p + in_p, num_qubits(local))
    m3 = mat.reshape(1 << k, 1 << k, -1)
    m3 = jax.lax.all_to_all(m3, axis, split_axis=0, concat_axis=0, tiled=True)
    # axis 0 now carries the old GLOBAL content (destined for in_positions),
    # axis 1 the old in-block content (destined for out_positions); the
    # restore maps front block [0:k] -> out_positions and [k:2k] ->
    # in_positions, so swap the two front sub-axes first
    m3 = jnp.swapaxes(m3, 0, 1)
    return _qubits_from_front(m3.reshape(1 << (2 * k), -1), restore,
                              local.shape)


def local_density(local: jax.Array, positions: Sequence[int], axis: str) -> jax.Array:
    """Reduced density matrix of *local* qubits: local partial + psum."""
    positions = tuple(int(p) for p in positions)
    mat, _ = _qubits_to_front(local, positions, num_qubits(local))
    partial = jnp.matmul(mat, mat.conj().T, precision=config.matmul_precision())
    return jax.lax.psum(partial, axis)
