"""Grouped-axis statevector engine (the TPU-native hot path).

Motivation (measured on TPU v5e): any state view with a small trailing
dimension pads catastrophically under TPU (8,128) tiling — a ``(2^25, 2, 1)``
view of a 26-qubit state inflates 64x and OOMs HBM. The reference's
bit-strided index math (INSERT_ZERO, reference primitives.cu:104-105) must
therefore not be translated; instead the state lives in a **canonical
grouped shape** and every gate becomes a matmul over a <=128-sized axis:

* the ``2^n`` amplitudes are viewed as ``(2^g_{G-1}, ..., 2^g_1, 2^g_0)``
  with qubit groups of at most 7 bits — group 0 = qubits 0..6 is the minor
  (lane) axis, group 1 the sublane axis, etc.;
* a k-qubit gate inside group ``j`` is expanded (kron with identity +
  bit permutation, all on a tiny matrix) to ``E: 2^g x 2^g`` and applied by
  one einsum contracting that axis — an MXU matmul with no padded operands;
* consecutive gates in a group **compose into one E**, so one HBM sweep
  applies up to 7 qubits' worth of gates (measured ~7x at 26 qubits);
* dense 2q gates spanning two groups split by operator-Schmidt
  decomposition ``G = sum_i A_i (x) B_i`` (rank <= 4) into per-group
  matmuls;
* diagonal gates of any span become broadcast tables on the involved axes —
  a whole ZZ-ring layer collapses into one elementwise sweep;
* reductions (densities, gate-gradient pair contractions) go through
  :func:`subblocks`: rotate target bits to the top of their group axes
  (free in-group bit permutation), split them off as tiny leading axes, and
  Gram the resulting ``(2^k, 2^(n-k))`` matrix — MXU again.

Everything is pure jnp: jit/vmap/shard_map-compatible, CPU-testable against
the rank-generic ops in ops/statevector.py.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dqc_tpu import config

GROUP_BITS = 7
_LETTERS = "abcdefghijklmnopqrstuvwxy"  # 'Z' reserved for the contraction


@lru_cache(maxsize=None)
def group_sizes_low_first(n: int) -> Tuple[int, ...]:
    """Bits per group indexed by group number (group 0 = lowest bits)."""
    sizes = []
    b = 0
    while b < n:
        sizes.append(min(GROUP_BITS, n - b))
        b += GROUP_BITS
    return tuple(sizes)


@lru_cache(maxsize=None)
def group_dims(n: int) -> Tuple[int, ...]:
    """Array shape, most-significant group first."""
    return tuple(1 << g for g in reversed(group_sizes_low_first(n)))


def group_of_bit(n: int, bit: int) -> Tuple[int, int]:
    """(group index, bit position within the group) of a qubit."""
    if not (0 <= bit < n):
        raise ValueError(f"bit {bit} out of range for {n} qubits")
    return bit // GROUP_BITS, bit % GROUP_BITS


def to_grouped(state: jax.Array, n: int) -> jax.Array:
    return state.reshape(group_dims(n))


def from_grouped(t: jax.Array) -> jax.Array:
    return t.reshape(-1)


def _axis_of_group(ndim: int, j: int) -> int:
    """Group j sits at axis ndim-1-j (groups are msb-first in the shape)."""
    return ndim - 1 - j


# ---------------------------------------------------------------------------
# Expansion of gates/diagonals to full-group operators (tiny, traced)
# ---------------------------------------------------------------------------

# Concrete (non-tracer) gates are expanded host-side in numpy, memoized by
# value: tracing must neither eagerly compute complex arrays on the device
# (TPU backends cannot fetch them for constant embedding) nor re-embed one
# identical constant per gate occurrence (measured 1 GB of MLIR for a 26q
# circuit without deduplication). The cache is LRU-bounded: entries are up to
# 2^g x 2^g complex128 (256 KB at g=7), so 512 entries caps worst-case host
# memory at ~128 MB while any realistic circuit's distinct constants fit.
from collections import OrderedDict

_EXPAND_CACHE: "OrderedDict" = OrderedDict()
_EXPAND_CACHE_MAX = 512


def _npy_value_of(x):
    """The host-side numpy value a jax.Array was created from, if any.

    ``jax.Array._npy_value`` is a private attribute (the donation-free cached
    host buffer set when the array is built from numpy data); if a JAX
    upgrade renames it, constant-gate detection must degrade *loudly* in CI
    rather than silently disabling value-dedup — tests/test_groups.py::
    test_constant_gate_detection_mechanism guards exactly that.
    """
    return getattr(x, "_npy_value", None)


def concrete_or_none(x):
    """Host numpy view of ``x`` when it is a compile-time constant."""
    if isinstance(x, jax.core.Tracer):
        return None
    if isinstance(x, np.ndarray):
        return x
    if isinstance(x, (list, tuple, int, float, complex)):
        return np.asarray(x)
    if isinstance(x, jax.Array):
        npy = _npy_value_of(x)
        if npy is not None:
            return np.asarray(npy)
        # Fallback when the private attribute is unavailable: a concrete CPU
        # array can always be fetched cheaply/safely. Device-computed arrays
        # on accelerator backends are NOT fetched (remote TPU backends cannot
        # fetch complex values, and a fetch would sync the stream).
        try:
            platforms = {d.platform for d in x.devices()}
        except Exception:
            return None
        if platforms == {"cpu"}:
            return np.asarray(x)
        return None
    return np.asarray(x)


def _cached(key, build):
    hit = _EXPAND_CACHE.get(key)
    if hit is None:
        hit = build()
        if len(_EXPAND_CACHE) >= _EXPAND_CACHE_MAX:
            _EXPAND_CACHE.popitem(last=False)
        _EXPAND_CACHE[key] = hit
    else:
        _EXPAND_CACHE.move_to_end(key)
    return hit


def _expand_in_group_impl(xp, gate, rel_positions, g: int):
    k = len(rel_positions)
    gate = gate.reshape(1 << k, 1 << k)
    others = [b for b in range(g - 1, -1, -1) if b not in rel_positions]
    eye = xp.eye(1 << len(others), dtype=gate.dtype)
    # precision matters for the VJP of this einsum (the gate-cotangent
    # contraction inherits the forward's precision; default = bf16 on MXU)
    kw = {} if xp is np else {"precision": config.matmul_precision()}
    D = xp.einsum("ab,cd->acbd", gate, eye, **kw)
    D = D.reshape((2,) * g + (2,) * g)
    current = list(rel_positions) + others  # bit label of each out axis
    perm_out = [current.index(b) for b in range(g - 1, -1, -1)]
    perm = perm_out + [g + p for p in perm_out]
    D = D.transpose(perm)
    return D.reshape(1 << g, 1 << g)


def _expand_diag_impl(xp, diag, rel_positions, g: int):
    k = len(rel_positions)
    d = diag.reshape((2,) * k)
    desc = sorted(rel_positions, reverse=True)
    d = d.transpose([rel_positions.index(b) for b in desc])
    shape = tuple(2 if b in rel_positions else 1 for b in range(g - 1, -1, -1))
    d = d.reshape(shape)
    return xp.broadcast_to(d, (2,) * g).reshape(1 << g)


def expand_in_group(gate, rel_positions: Sequence[int], g: int):
    """k-qubit gate -> full ``2^g x 2^g`` group operator.

    ``rel_positions``: target bits inside the group, msb-first (the gate's
    index convention, reference primitives.cu:596).
    """
    rel_positions = tuple(int(p) for p in rel_positions)
    c = concrete_or_none(gate)
    if c is not None:
        key = ("E", c.tobytes(), c.dtype.str, rel_positions, g)
        return _cached(key, lambda: np.ascontiguousarray(
            _expand_in_group_impl(np, c, rel_positions, g)))
    return _expand_in_group_impl(jnp, gate, rel_positions, g)


def expand_diag_in_group(diag, rel_positions: Sequence[int], g: int):
    """k-bit diagonal -> full ``2^g`` diagonal table of its group."""
    rel_positions = tuple(int(p) for p in rel_positions)
    c = concrete_or_none(diag)
    if c is not None:
        key = ("D", c.tobytes(), c.dtype.str, rel_positions, g)
        return _cached(key, lambda: np.ascontiguousarray(
            _expand_diag_impl(np, c, rel_positions, g)))
    return _expand_diag_impl(jnp, diag, rel_positions, g)


# ---------------------------------------------------------------------------
# Application
# ---------------------------------------------------------------------------

def apply_group_matrix(t: jax.Array, E: jax.Array, j: int) -> jax.Array:
    """One matmul: contract group axis ``j`` with a full-group operator.

    Expressed as plain 2-D / 3-D-batched matmuls (never a rank-n
    dot_general): XLA lowers those without materializing layout-transposed
    copies of the full state, which at 28 qubits are 1 GiB each and OOM HBM.
    """
    ax = _axis_of_group(t.ndim, j)
    E = E.astype(t.dtype)
    prec = config.matmul_precision()
    # full-rank einsum everywhere: measured ~30% faster end-to-end at 26q
    # than reshaped 2-D/batched matmul forms on v5e (XLA picks better
    # schedules from the un-reshaped contraction)
    sub = _LETTERS[: t.ndim]
    out_sub = sub[:ax] + "Z" + sub[ax + 1:]
    return jnp.einsum(f"{sub},Z{sub[ax]}->{out_sub}", t, E, precision=prec)


def apply_group_diag(t: jax.Array, table: jax.Array, j: int) -> jax.Array:
    ax = _axis_of_group(t.ndim, j)
    shape = [1] * t.ndim
    shape[ax] = t.shape[ax]
    return t * table.astype(t.dtype).reshape(shape)


def apply_cross_diag(t: jax.Array, table2: jax.Array, j2: int, j1: int) -> jax.Array:
    """Joint diagonal over two group axes; ``table2``: (dim_j2, dim_j1)."""
    a2, a1 = _axis_of_group(t.ndim, j2), _axis_of_group(t.ndim, j1)
    if a2 > a1:
        table2 = table2.T
        a2, a1 = a1, a2
    shape = [1] * t.ndim
    shape[a2] = t.shape[a2]
    shape[a1] = t.shape[a1]
    return t * table2.astype(t.dtype).reshape(shape)


def schmidt_terms(gate4: jax.Array):
    """``G = sum_i A_i (x) B_i``, A on the msb qubit (pos2). Stacked (4,2,2).

    SVD of a 4x4 at trace time; the adjoint never differentiates through it
    (our custom_vjp computes gate gradients by pair contraction instead).
    """
    c = concrete_or_none(gate4)
    if c is not None:
        key = ("S", c.tobytes(), c.dtype.str)

        def build():
            G = c.reshape(2, 2, 2, 2)
            M = np.ascontiguousarray(G.transpose(0, 2, 1, 3)).reshape(4, 4)
            u, s, vh = np.linalg.svd(M)
            sq = np.sqrt(s).astype(M.dtype)
            return (np.ascontiguousarray((u * sq[None, :]).T.reshape(4, 2, 2)),
                    np.ascontiguousarray((sq[:, None] * vh).reshape(4, 2, 2)))

        return _cached(key, build)
    G = gate4.reshape(2, 2, 2, 2)              # [q2, q1, p2, p1]
    M = G.transpose(0, 2, 1, 3).reshape(4, 4)  # [(q2 p2), (q1 p1)]
    u, s, vh = jnp.linalg.svd(M)
    sq = jnp.sqrt(s).astype(M.dtype)
    As = (u * sq[None, :]).T.reshape(4, 2, 2)
    Bs = (sq[:, None] * vh).reshape(4, 2, 2)
    return As, Bs


def apply_dense(t: jax.Array, gate: jax.Array, positions: Sequence[int], n: int) -> jax.Array:
    """Dense k-qubit gate at arbitrary positions (grouped state in/out)."""
    positions = tuple(int(p) for p in positions)
    k = len(positions)
    gate = gate.astype(t.dtype)
    groups = {group_of_bit(n, p)[0] for p in positions}
    sizes = group_sizes_low_first(n)
    if len(groups) == 1:
        j = groups.pop()
        rels = tuple(p % GROUP_BITS for p in positions)
        E = expand_in_group(gate, rels, sizes[j])
        return apply_group_matrix(t, E, j)
    if k == 2:
        p2, p1 = positions
        j2, r2 = group_of_bit(n, p2)
        j1, r1 = group_of_bit(n, p1)
        As, Bs = schmidt_terms(gate)
        out = None
        for i in range(4):
            EA = expand_in_group(As[i], (r2,), sizes[j2])
            EB = expand_in_group(Bs[i], (r1,), sizes[j1])
            term = apply_group_matrix(apply_group_matrix(t, EB, j1), EA, j2)
            out = term if out is None else out + term
        return out
    # generic k>=3 spanning multiple groups: gather the target bits to the
    # front (subblocks), one (2^k, 2^k) x (2^k, 2^(n-k)) MXU matmul, scatter
    # back — exact for any positions (reference scope caps at k=2,
    # primitives.cu:573-620; this is an extension)
    S, restore = subblocks_with_restore(t, positions, n)
    S = jnp.matmul(gate.reshape(1 << k, 1 << k), S,
                   precision=config.matmul_precision())
    return restore(S)


def apply_diag(t: jax.Array, diag: jax.Array, positions: Sequence[int], n: int) -> jax.Array:
    """Diagonal k-qubit gate at arbitrary positions — always one sweep."""
    positions = tuple(int(p) for p in positions)
    diag = diag.reshape(-1)
    sizes = group_sizes_low_first(n)
    by_group: Dict[int, List[int]] = {}
    for i, p in enumerate(positions):
        by_group.setdefault(group_of_bit(n, p)[0], []).append(i)
    if len(by_group) == 1:
        j = next(iter(by_group))
        rels = tuple(p % GROUP_BITS for p in positions)
        return apply_group_diag(t, expand_diag_in_group(diag, rels, sizes[j]), j)
    if len(by_group) == 2:
        table2, ja, jb = cross_diag_table(diag, positions, n)
        return apply_cross_diag(t, table2, ja, jb)
    # diagonal spanning >2 groups (generic k extension): gather target bits
    # to the front, scale rows, scatter back
    S, restore = subblocks_with_restore(t, positions, n)
    return restore(S * diag.reshape(-1)[:, None])


def cross_diag_table(diag, positions: Sequence[int], n: int):
    """Joint full-group table of a diagonal spanning exactly two groups:
    ``(table2, ja, jb)`` with ``table2[A, B]`` the diagonal entry for
    full-group indices A (group ja, the higher group) and B (group jb)."""
    positions = tuple(int(p) for p in positions)
    diag = diag.reshape(-1)  # numpy stays numpy (constants), tracers stay traced
    sizes = group_sizes_low_first(n)
    by_group: Dict[int, List[int]] = {}
    for i, p in enumerate(positions):
        by_group.setdefault(group_of_bit(n, p)[0], []).append(i)
    assert len(by_group) == 2
    (ja, ia), (jb, ib) = sorted(by_group.items(), key=lambda kv: -kv[0])
    # joint table over a virtual register [bits of ja cluster, bits of jb cluster]
    k = len(positions)
    d = diag.reshape((2,) * k)
    order = ia + ib  # axes of d: ja-cluster positions then jb-cluster
    d = d.transpose(order)
    ka, kb = len(ia), len(ib)
    d2 = d.reshape(1 << ka, 1 << kb)
    rels_a = tuple(positions[i] % GROUP_BITS for i in ia)
    rels_b = tuple(positions[i] % GROUP_BITS for i in ib)
    # table2[A, B] = d2[bits_a(A), bits_b(B)]: static selector gather
    ea = _selector_matrix(rels_a, sizes[ja])  # (2^ga,) packed target bits
    eb = _selector_matrix(rels_b, sizes[jb])
    table2 = d2[ea[:, None], eb[None, :]]
    return table2, ja, jb


@lru_cache(maxsize=None)
def _selector_matrix(rel_positions: Tuple[int, ...], g: int) -> np.ndarray:
    """For each full-group index, the packed value of the target bits
    (msb-first) — a static numpy lookup used to build joint diag tables."""
    idx = np.arange(1 << g)
    out = np.zeros(1 << g, dtype=np.int32)
    k = len(rel_positions)
    for i, r in enumerate(rel_positions):
        out |= (((idx >> r) & 1) << (k - 1 - i)).astype(np.int32)
    return out


# ---------------------------------------------------------------------------
# Sub-block extraction for reductions
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _bit_permutation_matrix(new_order_msb: Tuple[int, ...], g: int) -> np.ndarray:
    """Permutation matrix P with ``P[new, old] = 1`` where the new axis index
    reads the old bits in ``new_order_msb`` order. Static numpy: embeds once,
    applies as one un-padded 2^g matmul (a bit-split transpose would
    materialize a (2,)*g-shaped copy — 64x tile padding on TPU)."""
    size = 1 << g
    P = np.zeros((size, size), dtype=np.float32)
    old = np.arange(size)
    new = np.zeros(size, dtype=np.int64)
    for i, b in enumerate(new_order_msb):
        new |= ((old >> b) & 1) << (g - 1 - i)
    P[new, old] = 1.0
    return P


def _permute_group_bits(t: jax.Array, new_order_msb: Sequence[int], j: int) -> jax.Array:
    """Re-order the bits of group axis ``j`` so the axis index reads them in
    ``new_order_msb`` (a permutation of 0..g-1, msb-first)."""
    ax = _axis_of_group(t.ndim, j)
    g = t.shape[ax].bit_length() - 1
    order = tuple(int(b) for b in new_order_msb)
    if order == tuple(range(g - 1, -1, -1)):
        return t  # identity
    return apply_group_matrix(t, _bit_permutation_matrix(order, g), j)


def subblocks(t: jax.Array, positions: Sequence[int], n: int) -> jax.Array:
    """(2^k, 2^(n-k)) matrix whose row ``r`` is the sub-state with the target
    bits fixed to the bits of ``r`` (msb-first in ``positions`` order).

    The workhorse view behind densities (`get_q1density`/`get_q2density`,
    reference primitives.cu:689-876) and gradient pair contractions
    (`q1grad`/`q2grad`, primitives.cu:202-395): after this, each is a single
    Gram-style matmul.
    """
    S, _ = subblocks_with_restore(t, positions, n)
    return S


def subblocks_with_restore(t: jax.Array, positions: Sequence[int], n: int):
    """Like :func:`subblocks`, additionally returning ``restore(S') -> t'``
    which maps a modified sub-block matrix back to the grouped layout — the
    generic-gate execution path: any k-qubit dense gate at any positions
    becomes ``restore(G @ subblocks(t))`` (one gather sweep, one MXU matmul,
    one scatter sweep), with all bit bookkeeping in tiny cached permutation
    matrices."""
    positions = tuple(int(p) for p in positions)
    k = len(positions)
    sizes = group_sizes_low_first(n)
    by_group: Dict[int, List[int]] = {}
    for i, p in enumerate(positions):
        by_group.setdefault(group_of_bit(n, p)[0], []).append(i)

    work = t
    orders: Dict[int, Tuple[int, ...]] = {}
    for j, idxs in by_group.items():
        rels = [positions[i] % GROUP_BITS for i in idxs]
        order = rels + [b for b in range(sizes[j] - 1, -1, -1) if b not in rels]
        orders[j] = tuple(order)
        work = _permute_group_bits(work, order, j)

    # split each involved axis into (cluster, rest)
    new_shape: List[int] = []
    cluster_axis: Dict[int, int] = {}
    ndim = work.ndim
    cur = 0
    for ax in range(ndim):
        j = ndim - 1 - ax
        dim = work.shape[ax]
        if j in by_group:
            cnt = len(by_group[j])
            cluster_axis[j] = cur
            new_shape.append(1 << cnt)
            new_shape.append(dim >> cnt)
            cur += 2
        else:
            new_shape.append(dim)
            cur += 1
    split_shape = tuple(new_shape)
    work = work.reshape(split_shape)

    # clusters to the front, ordered by first appearance in `positions`
    seen: List[int] = []
    achieved: List[int] = []  # position indices in achieved msb-first order
    for i, p in enumerate(positions):
        j = group_of_bit(n, p)[0]
        a = cluster_axis[j]
        if a not in seen:
            seen.append(a)
            achieved.extend(by_group[j])
    rest = [a for a in range(work.ndim) if a not in seen]
    axes_perm = seen + rest
    transposed_shape = tuple(split_shape[a] for a in axes_perm)
    work = work.transpose(axes_perm).reshape(1 << k, -1)

    row_perm = None
    if achieved != list(range(k)):
        # interleaved groups (k>=3): permute rows to `positions` msb order
        perm = np.zeros(1 << k, dtype=np.int32)
        for r in range(1 << k):
            out = 0
            for slot, i in enumerate(achieved):
                bit = (r >> (k - 1 - slot)) & 1
                out |= bit << (k - 1 - i)
            perm[out] = r
        row_perm = perm
        work = work[jnp.asarray(perm)]

    grouped_shape = t.shape

    def restore(S: jax.Array) -> jax.Array:
        if row_perm is not None:
            inv = np.argsort(row_perm).astype(np.int32)
            S = S[jnp.asarray(inv)]
        w = S.reshape(transposed_shape)
        inv_axes = np.argsort(axes_perm)
        w = w.transpose(tuple(int(a) for a in inv_axes)).reshape(grouped_shape)
        for j, order in orders.items():
            g = sizes[j]
            # undo the bit rotation: apply P^T (permutation inverse)
            P = _bit_permutation_matrix(order, g)
            if order != tuple(range(g - 1, -1, -1)):
                w = apply_group_matrix(w, P.T, j)
        return w

    return work, restore


# ---------------------------------------------------------------------------
# Reductions
# ---------------------------------------------------------------------------

def group_gram(t: jax.Array, j: int) -> jax.Array:
    """Full-group Gram ``G[x, y] = sum_b t[x, b] conj(t[y, b])`` over group
    axis ``j`` — ONE MXU sweep; every reduced density matrix of qubits in
    this group is a tiny bit-rotation + partial trace of it."""
    return group_pair_gram(t.conj(), t, j)


def density_from_gram(G: jax.Array, rel_positions: Sequence[int], g: int) -> jax.Array:
    """k-qubit density from its group's Gram: rotate the Gram's bits so the
    targets are on top (tiny cached permutation matmuls), then trace the
    rest."""
    rel_positions = tuple(int(p) for p in rel_positions)
    k = len(rel_positions)
    order = tuple(rel_positions) + tuple(
        b for b in range(g - 1, -1, -1) if b not in rel_positions
    )
    if order != tuple(range(g - 1, -1, -1)):
        P = _bit_permutation_matrix(order, g)
        Pc = P.astype(G.dtype) if isinstance(G, np.ndarray) else P
        G = jnp.matmul(jnp.matmul(Pc, G, precision=config.matmul_precision()),
                       Pc.T, precision=config.matmul_precision())
    R = 1 << (g - k)
    Gv = G.reshape(1 << k, R, 1 << k, R)
    return jnp.einsum("arbr->ab", Gv)


def density(t: jax.Array, positions: Sequence[int], n: int) -> jax.Array:
    """Reduced density matrix.

    Single-group targets (every 1q density; most 2q) go through the group
    Gram — one un-padded MXU sweep + tiny matrix algebra. Cross-group
    targets use the sub-block Gram. (A naive (2^k, 2^(n-k)) stack pads its
    leading dim 2->8 under TPU tiling — 4x HBM on a 2-row stack.)
    """
    positions = tuple(int(p) for p in positions)
    groups = {group_of_bit(n, p)[0] for p in positions}
    if len(groups) == 1:
        j = groups.pop()
        g = group_sizes_low_first(n)[j]
        rels = tuple(p % GROUP_BITS for p in positions)
        return density_from_gram(group_gram(t, j), rels, g)
    S = subblocks(t, positions, n)
    return jnp.matmul(S, S.conj().T, precision=config.matmul_precision())


def density_cached(t: jax.Array, positions: Sequence[int], n: int,
                   cache: dict, psum_axis=None) -> jax.Array:
    """Density with per-group Gram sharing: consecutive density requests at
    the same circuit point (the usual epilogue pattern — every qubit's 1q
    density, every neighbour pair's 2q density) reuse ONE Gram sweep per
    group. ``cache`` must be cleared whenever the state changes.

    ``psum_axis``: in distributed execution the Gram itself is psummed once
    per group (psum is linear), so each extra density costs no collective.
    """
    positions = tuple(int(p) for p in positions)
    groups = {group_of_bit(n, p)[0] for p in positions}
    if len(groups) == 1:
        j = groups.pop()
        g = group_sizes_low_first(n)[j]
        G = cache.get(j)
        if G is None:
            G = group_gram(t, j)
            if psum_axis is not None:
                G = jax.lax.psum(G, psum_axis)
            cache[j] = G
        rels = tuple(p % GROUP_BITS for p in positions)
        return density_from_gram(G, rels, g)
    S = subblocks(t, positions, n)
    rho = jnp.matmul(S, S.conj().T, precision=config.matmul_precision())
    if psum_axis is not None:
        rho = jax.lax.psum(rho, psum_axis)
    return rho


def pair_grad(fwd_t: jax.Array, bwd_t: jax.Array, positions: Sequence[int], n: int) -> jax.Array:
    """Dense-gate cotangent ``sum_b bwd[p,b] fwd[q,b]`` (primitives.cu:219)."""
    B = subblocks(bwd_t, positions, n)
    F = subblocks(fwd_t, positions, n)
    return jnp.matmul(B, F.T, precision=config.matmul_precision())


def diag_pair_grad(fwd_t: jax.Array, bwd_t: jax.Array, positions: Sequence[int], n: int) -> jax.Array:
    """Diagonal-gate cotangent (primitives.cu:420-428)."""
    B = subblocks(bwd_t, positions, n)
    F = subblocks(fwd_t, positions, n)
    return jnp.sum(B * F, axis=1)


def group_diag_gram(fwd_t: jax.Array, bwd_t: jax.Array, j: int) -> jax.Array:
    """Diagonal of the group pair gram: ``W[x] = sum_b bwd[x,b] fwd[x,b]`` —
    yields every per-gate gradient of a fused all-diagonal block."""
    ax = _axis_of_group(fwd_t.ndim, j)
    sub = _LETTERS[: fwd_t.ndim]
    return jnp.einsum(f"{sub},{sub}->{sub[ax]}", bwd_t, fwd_t,
                      precision=config.matmul_precision())


def group_pair_gram(fwd_t: jax.Array, bwd_t: jax.Array, j: int) -> jax.Array:
    """Full-group pair contraction ``T0[x, y] = sum_b bwd[x, b] fwd[y, b]``
    over group axis ``j`` — ONE pair of sweeps yields every per-gate gradient
    of a fused block (chain rule closes in 2^g x 2^g matrix algebra)."""
    ax = _axis_of_group(fwd_t.ndim, j)
    prec = config.matmul_precision()
    sub = _LETTERS[: fwd_t.ndim]
    o1 = sub[:ax] + "Z" + sub[ax + 1:]
    return jnp.einsum(f"{o1},{sub}->Z{sub[ax]}", bwd_t, fwd_t, precision=prec)
