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
    in the ``dh_table_specs`` kernel layouts — tsl (m_blk, 128) [s, l],
    tas (1, 1, 1, X, m_blk) [x, s], tal (1, 1, X, 128) [x, l] (the cell's
    slices of the run's (A, 128) a-axis tables; a = (i*X + x)*post + p with
    i and p fixed by the grid cell's BlockSpec index). Returns the complex
    (X, m_blk, 128) tile as a real pair."""
    ar, ai = tas_r[0, 0, 0], tas_i[0, 0, 0]
    lr, li = tal_r[0, 0], tal_i[0, 0]
    mr, mi = cmul(ar[:, :, None], ai[:, :, None],
                  lr[:, None, :], li[:, None, :])
    return cmul(mr, mi, tsl_r[:][None, :, :], tsl_i[:][None, :, :])


def dh_table_views(tables, m_blk):
    """Reshape a fused diagonal run's canonical 6 view-tables (tsl r/i
    (128, 128); tas/tal r/i (pre, X, post, 128), see
    planes.dhigh_view_tables) to the Mosaic-legal kernel layouts consumed
    by ``dh_table_specs`` blocks:

    * tas -> (pre, post, k, X, m_blk) with k = 128 // m_blk — the sublane
      axis is pre-split by kernel block so a cell reads a FULL trailing
      (X, m_blk) tile (Mosaic forbids partial blocks of a 128 lane dim);
    * tal -> (pre, post, X, 128) — full lane row per cell.

    Trace-side jnp ops on tiny (A, 128) tables; kernels get aligned tiles."""
    import jax.numpy as jnp  # lazy: keep module import-light

    tsl_r, tsl_i, tas_r, tas_i, tal_r, tal_i = tables
    pre, X, post, _ = tas_r.shape
    k = 128 // m_blk

    def as_v(t):
        return jnp.transpose(t.reshape(pre, X, post, k, m_blk),
                             (0, 2, 3, 1, 4))

    def al_v(t):
        return jnp.transpose(t, (0, 2, 1, 3))

    return (tsl_r, tsl_i, as_v(tas_r), as_v(tas_i),
            al_v(tal_r), al_v(tal_i))


def dh_table_specs(X, M, m_blk):
    """BlockSpecs of a fused diagonal run's 6 view-tables (in the
    ``dh_table_views`` kernel layouts) for a high-group sweep on the
    ``(A1, X, M, 128)`` view with grid ``(A1, M // m_blk)``:

    * ``tsl`` (128, 128) [sublane, lane]: block (m_blk, 128) at the cell's
      sublane rows (m_blk | 128 and 8 | m_blk keep the block tile-legal);
    * ``tas`` (A1, post, k, X, m_blk): block (1, 1, 1, X, m_blk) — the
      cell's full (X, m_blk) a-by-sublane tile;
    * ``tal`` (A1, post, X, 128): block (1, 1, X, 128) — the cell's full
      lane row.

    A cell (i, c) covers m in [c*m_blk, (c+1)*m_blk) = fixed post index
    p = c*m_blk // 128 and sublane window c % k (requires m_blk | 128,
    asserted by the callers)."""
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # lax.div/rem on an np.int32 constant: a python-int `c // k` embeds the
    # literal as i64 under jax_enable_x64, and the resulting i64->i32
    # convert_element_type sends Mosaic's _convert_helper into infinite
    # recursion at lowering time (grid indices are nonnegative, so truncating
    # div == floor div here).
    k = np.int32(128 // m_blk)

    def sl_map(i, c):
        return (lax.rem(c, k), _Z)

    def as_map(i, c):
        return (i, lax.div(c, k), lax.rem(c, k), _Z, _Z)

    def al_map(i, c):
        return (i, lax.div(c, k), _Z, _Z)

    tsl = pl.BlockSpec((m_blk, 128), sl_map, memory_space=pltpu.VMEM)
    tas = pl.BlockSpec((1, 1, 1, X, m_blk), as_map, memory_space=pltpu.VMEM)
    tal = pl.BlockSpec((1, 1, X, 128), al_map, memory_space=pltpu.VMEM)
    return tsl, tsl, tas, tas, tal, tal


def fixed3(*_):
    """Grid-invariant rank-3 operand (stacked per-term operators)."""
    return (_Z, _Z, _Z)


# ---------------------------------------------------------------------------
# f16-in-u16 plane storage (config.set_state_storage("f16"))
#
# Mosaic's dialect rejects f16 ("Unsupported type in mosaic dialect: 'f16'"
# on this toolchain) but supports u16 vectors and integer bit ops, so the
# "f16" cotangent-storage mode keeps IEEE-half BIT PATTERNS in uint16
# planes and converts at every kernel load/store with the classic
# magic-multiply trick (exponent rebias 2^+-112 as one f32 multiply; the
# sign bit is carried through the multiply untouched). Subnormal halves
# decode exactly; encode clamps to +-65504 (f16 max) so overflow saturates
# instead of wrapping into garbage bits. Cost: ~4 VPU ops per element per
# conversion — noise next to the MXU-bound contractions.
# ---------------------------------------------------------------------------

F16_BITS = np.dtype("uint16")  # storage dtype marker for f16-encoded planes


def f32_of(v):
    """Kernel load: decode an f16-bit u16 tile to f32 (identity upcast for
    every other storage dtype)."""
    import jax
    import jax.numpy as jnp

    if v.dtype == jnp.uint16:
        u = v.astype(jnp.uint32)
        bits = ((u & 0x7FFF) << 13) | ((u & 0x8000) << 16)
        return jax.lax.bitcast_convert_type(bits, jnp.float32) * jnp.float32(
            2.0 ** 112)
    return v.astype(jnp.float32)


def store_as(v, dtype):
    """Kernel store: encode f32 to f16-bit u16 (round-to-nearest-even) when
    ``dtype`` is uint16; plain downcast otherwise."""
    import jax
    import jax.numpy as jnp

    if jnp.dtype(dtype) == jnp.uint16:
        f = jnp.clip(v, -65504.0, 65504.0) * jnp.float32(2.0 ** -112)
        u = jax.lax.bitcast_convert_type(f, jnp.uint32)
        sign = (u >> 16) & jnp.uint32(0x8000)
        mag = u & jnp.uint32(0x7FFFFFFF)
        mag = mag + 0x0FFF + ((mag >> 13) & 1)  # RTNE on the 13 dropped bits
        return (sign | (mag >> 13)).astype(jnp.uint16)
    return v.astype(dtype)
