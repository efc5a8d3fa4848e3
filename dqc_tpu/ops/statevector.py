"""Core statevector operations (pure jnp, jit/grad/vmap-composable).

These are the TPU-native equivalents of the reference's CUDA kernels
(reference src/primitives.cu): gate application (`q1gate` primitives.cu:534,
`q2gate` primitives.cu:608, `q2gate_diag` primitives.cu:674), reduced density
matrices (`get_q1density` primitives.cu:741, `get_q2density` primitives.cu:839)
and the gate-gradient contractions (`q1grad` primitives.cu:202, `q2grad`
primitives.cu:356, `q2grad_diag` primitives.cu:398).

Conventions (identical to the reference):

* The state is a flat complex array of ``2**n`` amplitudes. Qubit ``pos``
  corresponds to bit ``pos`` of the flat index; **qubit 0 is the innermost /
  fastest-varying bit** (reference src/qdc/circuit.py:29-30).
* A k-qubit gate on ``positions = (p_{k-1}, ..., p_0)`` is a
  ``2^k x 2^k`` matrix whose row/column bit-significance follows the order of
  ``positions``: the *first* position is the most significant bit. For the
  reference's 2-qubit gates ``positions = (pos2, pos1)`` and the matrix is
  indexed ``G[(q2 q1), (p2 p1)]`` (reference src/primitives.cu:596) with
  ``pos2`` documented as "control" (src/qdc/circuit.py:27-28).
* Gates may be passed flat (length ``4^k``) or square (``2^k x 2^k``);
  diagonal gates are length ``2^k`` vectors.

Instead of translating the reference's bit-insertion index math
(``INSERT_ZERO``, primitives.cu:104-105) into gather/scatter, every op here
reshapes the state so the target qubits form a leading ``2^k`` axis and runs
one **MXU-friendly matmul** ``(2^k, 2^k) @ (2^k, 2^(n-k))`` — XLA fuses the
relayout into the contraction, and the same code path serves fused multi-qubit
gates (k up to ~10) where the matmul genuinely fills the MXU.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from dqc_tpu import config


# ---------------------------------------------------------------------------
# Shape / layout helpers
# ---------------------------------------------------------------------------

def num_qubits(state: jax.Array) -> int:
    """Number of qubits of a flat statevector (validates power-of-2 size)."""
    size = state.size
    n = size.bit_length() - 1
    if (1 << n) != size:
        raise ValueError(f"state size {size} is not a power of two")
    return n


def standard_state(n: int, dtype=None) -> jax.Array:
    """|0...0> on ``n`` qubits (reference `set2standard`, primitives.cu:176)."""
    dtype = config.canonicalize_complex(dtype)
    return jnp.zeros((1 << n,), dtype).at[0].set(1.0)


def _segment_dims(n: int, sorted_desc: Sequence[int]) -> Tuple[int, ...]:
    """Factor ``2^n`` into interleaved (segment, qubit, segment, ...) dims.

    ``sorted_desc`` must be strictly descending qubit positions. The returned
    dims multiply to ``2^n`` and alternate: segment above the highest target
    qubit, that qubit (2), gap segment, next qubit (2), ..., segment below the
    lowest target qubit. Keeps tensor rank at ``2k+1`` independent of ``n``.
    """
    dims = []
    prev = n
    for p in sorted_desc:
        dims.append(1 << (prev - p - 1))
        dims.append(2)
        prev = p
    dims.append(1 << prev)
    return tuple(dims)


def _qubits_to_front(state: jax.Array, positions: Sequence[int], n: int):
    """View ``state`` as ``(2^k, 2^(n-k))`` with target qubits leading.

    The leading axis bit-significance follows the order of ``positions``
    (first = most significant). Returns the matrix view plus everything needed
    by :func:`_qubits_from_front` to undo the relayout.
    """
    k = len(positions)
    sorted_desc = sorted(positions, reverse=True)
    dims = _segment_dims(n, sorted_desc)
    t = state.reshape(dims)
    # qubit axes sit at odd indices 1, 3, ..., 2k-1 in sorted-descending order
    axis_of = {p: 2 * i + 1 for i, p in enumerate(sorted_desc)}
    front = [axis_of[p] for p in positions]
    segs = [2 * i for i in range(k)] + [2 * k]
    perm = front + segs
    t = t.transpose(perm)
    return t.reshape(1 << k, -1), (dims, perm)


def _qubits_from_front(mat: jax.Array, restore, out_shape) -> jax.Array:
    """Inverse of :func:`_qubits_to_front`."""
    dims, perm = restore
    k = (len(dims) - 1) // 2
    permuted_dims = tuple(dims[a] for a in perm)
    t = mat.reshape(permuted_dims)
    inv = [0] * len(perm)
    for i, a in enumerate(perm):
        inv[a] = i
    return t.transpose(inv).reshape(out_shape)


def _as_matrix(gate: jax.Array, k: int) -> jax.Array:
    """Normalize a k-qubit gate to ``(2^k, 2^k)`` (accepts flat ``4^k``)."""
    d = 1 << k
    if gate.size != d * d:
        raise ValueError(f"gate has {gate.size} entries, expected {d * d}")
    return gate.reshape(d, d)


def _check_positions(positions: Sequence[int], n: int) -> None:
    if len(set(positions)) != len(positions):
        raise ValueError(f"duplicate qubit positions {positions}")
    for p in positions:
        if not (0 <= p < n):
            raise ValueError(f"qubit position {p} out of range for {n} qubits")


# ---------------------------------------------------------------------------
# Gate application
# ---------------------------------------------------------------------------

def apply_gate(state: jax.Array, gate: jax.Array, positions: Sequence[int]) -> jax.Array:
    """Apply a dense k-qubit gate: ``psi' = (G ⊗ I) psi``.

    Generalizes the reference's `q1gate` (primitives.cu:513-545) and `q2gate`
    (primitives.cu:573-620) to any k — the same path applies fused gates.
    """
    n = num_qubits(state)
    positions = tuple(int(p) for p in positions)
    _check_positions(positions, n)
    g = _as_matrix(gate, len(positions)).astype(state.dtype)
    mat, restore = _qubits_to_front(state, positions, n)
    out = jnp.matmul(g, mat, precision=config.matmul_precision())
    return _qubits_from_front(out, restore, state.shape)


def apply_1q(state: jax.Array, gate: jax.Array, pos: int) -> jax.Array:
    """Apply a dense 1-qubit gate (reference `q1gate`, primitives.cu:534)."""
    return apply_gate(state, gate, (pos,))


def apply_2q(state: jax.Array, gate: jax.Array, pos2: int, pos1: int) -> jax.Array:
    """Apply a dense 2-qubit gate ``G[(q2 q1),(p2 p1)]`` (primitives.cu:608).

    ``pos2`` is the gate's most-significant qubit ("control" in the
    reference's docs, src/qdc/circuit.py:27-28); any pos2/pos1 order works.
    """
    return apply_gate(state, gate, (pos2, pos1))


def apply_diag(state: jax.Array, diag: jax.Array, positions: Sequence[int]) -> jax.Array:
    """Apply a diagonal k-qubit gate given its ``2^k`` diagonal entries."""
    n = num_qubits(state)
    positions = tuple(int(p) for p in positions)
    _check_positions(positions, n)
    k = len(positions)
    d = diag.reshape(1 << k).astype(state.dtype)
    mat, restore = _qubits_to_front(state, positions, n)
    out = d[:, None] * mat
    return _qubits_from_front(out, restore, state.shape)


def apply_2q_diag(state: jax.Array, diag: jax.Array, pos2: int, pos1: int) -> jax.Array:
    """Apply a diagonal 2-qubit gate (reference `q2gate_diag`,
    primitives.cu:649-686); ``diag`` holds the 4 diagonal entries indexed
    ``(q2 q1)``."""
    return apply_diag(state, diag, (pos2, pos1))


# ---------------------------------------------------------------------------
# Observables
# ---------------------------------------------------------------------------

def density(state: jax.Array, positions: Sequence[int]) -> jax.Array:
    """Reduced density matrix of the given qubits: ``rho = Tr_rest |psi><psi|``.

    Generalizes `get_q1density` (primitives.cu:689-776) / `get_q2density`
    (primitives.cu:779-876): ``rho[i, j] = sum_b psi[i, b] conj(psi[j, b])``
    with ``i``/``j`` ranging over the target-qubit subspace in ``positions``
    bit order. One ``(2^k, M) @ (M, 2^k)`` contraction — the reference's
    shared-memory tree reduction + host-side block sum (primitives.cu:234-288)
    collapses into a single fused XLA reduce.
    """
    n = num_qubits(state)
    positions = tuple(int(p) for p in positions)
    _check_positions(positions, n)
    mat, _ = _qubits_to_front(state, positions, n)
    return jnp.matmul(mat, mat.conj().T, precision=config.matmul_precision())


def density_1q(state: jax.Array, pos: int) -> jax.Array:
    """2x2 reduced density matrix of one qubit (primitives.cu:741)."""
    return density(state, (pos,))


def density_2q(state: jax.Array, pos2: int, pos1: int) -> jax.Array:
    """4x4 reduced density matrix of a qubit pair, indexed ``(q2 q1)``
    (primitives.cu:839)."""
    return density(state, (pos2, pos1))


def expectation(state: jax.Array, op: jax.Array, positions: Sequence[int]) -> jax.Array:
    """``<psi| (Op ⊗ I) |psi>`` for a k-qubit operator (complex scalar)."""
    n = num_qubits(state)
    positions = tuple(int(p) for p in positions)
    _check_positions(positions, n)
    k = len(positions)
    o = _as_matrix(op, k).astype(state.dtype)
    mat, _ = _qubits_to_front(state, positions, n)
    return jnp.vdot(mat, jnp.matmul(o, mat, precision=config.matmul_precision()))


def norm(state: jax.Array) -> jax.Array:
    """L2 norm of the statevector."""
    return jnp.sqrt(jnp.sum(jnp.abs(state) ** 2))


def fidelity(a: jax.Array, b: jax.Array) -> jax.Array:
    """|<a|b>|^2."""
    return jnp.abs(jnp.vdot(a, b, precision=config.matmul_precision())) ** 2


# ---------------------------------------------------------------------------
# Adjoint-pass contractions (used by the O(1)-memory custom_vjp)
# ---------------------------------------------------------------------------

def gate_grad(fwd: jax.Array, bwd: jax.Array, positions: Sequence[int]) -> jax.Array:
    """Cotangent of a dense k-qubit gate.

    ``G_bar[p, q] = sum_b bwd[p, b] * fwd[q, b]`` — the reference's `q1grad`
    holomorphic cotangent product without conjugation (primitives.cu:219-230),
    where ``fwd`` is the state *entering* the gate (recovered by uncompute)
    and ``bwd`` the cotangent state. Returned square ``(2^k, 2^k)``.
    """
    n = num_qubits(fwd)
    positions = tuple(int(p) for p in positions)
    f, _ = _qubits_to_front(fwd, positions, n)
    b, _ = _qubits_to_front(bwd, positions, n)
    return jnp.matmul(b, f.T, precision=config.matmul_precision())


def diag_gate_grad(fwd: jax.Array, bwd: jax.Array, positions: Sequence[int]) -> jax.Array:
    """Cotangent of a diagonal k-qubit gate: ``d_bar[i] = sum_b bwd[i,b]*fwd[i,b]``
    (reference `q2grad_diag`, primitives.cu:420-428)."""
    n = num_qubits(fwd)
    positions = tuple(int(p) for p in positions)
    f, _ = _qubits_to_front(fwd, positions, n)
    b, _ = _qubits_to_front(bwd, positions, n)
    return jnp.sum(b * f, axis=1)


def apply_gate_adjoint(state: jax.Array, gate: jax.Array, positions: Sequence[int]) -> jax.Array:
    """Apply ``G^dagger`` — uncompute step for unitary gates (the reference's
    `_conj_tr` host-side swap trick, quantized_tensor.rs:110-143)."""
    g = _as_matrix(gate, len(positions))
    return apply_gate(state, g.conj().T, positions)


def apply_gate_transpose(state: jax.Array, gate: jax.Array, positions: Sequence[int]) -> jax.Array:
    """Apply ``G^T`` — cotangent transport (quantized_tensor.rs:110-114)."""
    g = _as_matrix(gate, len(positions))
    return apply_gate(state, g.T, positions)


def apply_gate_inverse(state: jax.Array, gate: jax.Array, positions: Sequence[int],
                       ctx: str = "gate") -> jax.Array:
    """Apply ``G^-1`` — uncompute for non-unitary gates (reference
    `q1gate_inv`/`q2gate_inv` via cuBLAS batched inversion,
    primitives.cu:547-570, 622-646). Singularity is diagnosed per
    ops/inversion.py (the reference reports "U(i,i) is zero",
    primitives.cu:128-132)."""
    from dqc_tpu.ops import inversion

    g = _as_matrix(gate, len(positions))
    return apply_gate(state, inversion.invert_gate(g, unitary=False, ctx=ctx), positions)


def probabilities(state: jax.Array) -> jax.Array:
    """Measurement probabilities |psi_i|^2 (real, sums to 1 for normalized
    states)."""
    return jnp.real(state * state.conj())


def sample_bitstrings(state: jax.Array, key, shots: int) -> jax.Array:
    """Sample computational-basis measurement outcomes.

    Returns ``(shots,)`` int32 basis indices (qubit 0 = least-significant
    bit, the framework's convention). An extension beyond the reference,
    which exposes only density-matrix observables.
    """
    logp = jnp.log(probabilities(state) + 1e-38)
    return jax.random.categorical(key, logp, shape=(shots,)).astype(jnp.int32)
