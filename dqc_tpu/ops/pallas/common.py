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


def cmul(xr, xi, yr, yi):
    """Complex multiply on real-pair operands (shared kernel helper)."""
    return xr * yr - xi * yi, xr * yi + xi * yr


def dh_tile(tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i):
    """Composed diagonal multiplier for one high-view block: blocks arrive
    as tsl (m_blk, 128) [s, l], tas (1, X, 1, m_blk) [x, s], tal
    (1, X, 1, 128) [x, l] — the (pre, X, post, 128) views of the run's
    (A, 128) a-axis tables (a = (i*X + x)*post + p; within a block i and
    p are fixed by the grid cell's BlockSpec index). Returns the complex
    (X, m_blk, 128) tile as a real pair."""
    ar, ai = tas_r[0, :, 0, :], tas_i[0, :, 0, :]
    lr, li = tal_r[0, :, 0, :], tal_i[0, :, 0, :]
    mr, mi = cmul(ar[:, :, None], ai[:, :, None],
                  lr[:, None, :], li[:, None, :])
    return cmul(mr, mi, tsl_r[:][None, :, :], tsl_i[:][None, :, :])


def dh_table_specs(X, M, m_blk):
    """BlockSpecs of a fused diagonal run's 6 view-tables for a high-group
    sweep on the ``(A1, X, M, 128)`` view with grid ``(A1, M // m_blk)``:

    * ``tsl`` (128, 128) [sublane, lane]: block (m_blk, 128) at the cell's
      sublane rows;
    * ``tas`` / ``tal`` (A1, X, post, 128): the (pre, X, post, 128) views of
      the run's (A, 128) a-axis tables; tas is sliced on its sublane axis,
      tal delivers the cell's full lane row.

    A cell (i, c) covers m in [c*m_blk, (c+1)*m_blk) = fixed post index
    p = c*m_blk // 128 and sublane rows s0 = (c*m_blk) % 128 .. + m_blk
    (requires m_blk | 128, asserted by the callers)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k = 128 // m_blk

    def sl_map(i, c):
        return (c % k, _Z)

    def as_map(i, c):
        return (i, _Z, c // k, c % k)

    def al_map(i, c):
        return (i, _Z, c // k, _Z)

    tsl = pl.BlockSpec((m_blk, 128), sl_map, memory_space=pltpu.VMEM)
    tas = pl.BlockSpec((1, X, 1, m_blk), as_map, memory_space=pltpu.VMEM)
    tal = pl.BlockSpec((1, X, 1, 128), al_map, memory_space=pltpu.VMEM)
    return tsl, tsl, tas, tas, tal, tal


def fixed3(*_):
    """Grid-invariant rank-3 operand (stacked per-term operators)."""
    return (_Z, _Z, _Z)
