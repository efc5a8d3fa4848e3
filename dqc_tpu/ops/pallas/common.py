"""Shared Pallas plumbing: x64-proof BlockSpec index maps.

Under ``jax_enable_x64`` the Python ``0`` literals in BlockSpec index maps
trace as i64 scalars, and Mosaic fails to legalize the index-map function
(``'func.return'(%arg0, %0, %0) : (i32, i64, i64)``). np.int32 zeros carry
a concrete (non-weak) dtype, keeping the index jaxprs i32 regardless of the
x64 flag — the engine's own dtypes are unaffected (kernels are pure f32).
"""

from __future__ import annotations

import numpy as np

_Z = np.int32(0)


def blk3(i):
    """Grid-major block over a rank-3 (A, 128, 128) plane."""
    return (i, _Z, _Z)


def blk4(i, j):
    """(A1, X, M, 128) high-group view: block (i, :, j-tile, :)."""
    return (i, _Z, j, _Z)


def blk4a(i):
    """(A1, X, 128, 128) full-column view on a 1-dim grid: block (i, :, :, :)."""
    return (i, _Z, _Z, _Z)


def blk2(i):
    """Grid-major block over a rank-2 (A, 128) table/partial."""
    return (i, _Z)


def fixed2(*_):
    """Grid-invariant rank-2 operand/accumulator (whole array each cell)."""
    return (_Z, _Z)


def fixed3(*_):
    """Grid-invariant rank-3 operand (stacked per-term operators)."""
    return (_Z, _Z, _Z)
