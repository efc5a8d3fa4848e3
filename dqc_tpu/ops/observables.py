"""Observables and measurement utilities.

The reference's only observable is the reduced density matrix
(`get_q1density`/`get_q2density`, reference primitives.cu:689-876); losses
are arbitrary JAX functions of densities. This module layers the standard
quantum-workflow conveniences on top of that contract — Pauli-sum
expectations read from the circuit's density requests, bitstring sampling,
fidelity — all pure jnp (jit/grad/vmap/shard_map-composable).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dqc_tpu import config

_PAULI = {
    "I": np.eye(2, dtype=np.complex128),
    "X": np.array([[0, 1], [1, 0]], dtype=np.complex128),
    "Y": np.array([[0, -1j], [1j, 0]], dtype=np.complex128),
    "Z": np.array([[1, 0], [0, -1]], dtype=np.complex128),
}


def pauli_matrix(s: str, dtype=None) -> np.ndarray:
    """Kron of single-qubit Paulis, msb-first: ``pauli_matrix("ZX")`` acts
    with Z on the higher (first) listed qubit — matching the density index
    convention ``rho[(q2 q1), (p2 p1)]`` (reference primitives.cu:596)."""
    dtype = config.canonicalize_complex(dtype)
    m = np.eye(1, dtype=np.complex128)
    for ch in s:
        m = np.kron(m, _PAULI[ch.upper()])
    return m.astype(dtype)


def expval_from_density(rho: jax.Array, op) -> jax.Array:
    """``tr(rho O)`` (real part — O is assumed Hermitian)."""
    return jnp.einsum("ij,ji->", rho, jnp.asarray(op, dtype=rho.dtype),
                      precision=config.matmul_precision()).real


class PauliSum:
    """A weighted sum of Pauli strings evaluated from density requests.

    ``terms``: list of ``(coefficient, {qubit: "X"|"Y"|"Z"})``. Call
    :meth:`attach` while building a circuit to append one diff-density
    request per term (in term order), then :meth:`expval` on the densities
    returned by ``autodiff_run`` — fully differentiable.

    >>> h = PauliSum([(1.0, {0: "Z", 1: "Z"}), (0.5, {0: "X"})])
    >>> h.attach(circuit)
    >>> _, run = circuit.build()
    >>> energy = h.expval(run(var_gates, const_gates))
    """

    def __init__(self, terms: Sequence[Tuple[float, Dict[int, str]]]):
        self.terms: List[Tuple[float, Tuple[Tuple[int, str], ...]]] = []
        for coef, ops in terms:
            if not ops:
                raise ValueError("identity terms: add the constant directly")
            items = tuple(sorted(((int(q), p.upper()) for q, p in ops.items()),
                                 reverse=True))  # msb-first, matches densities
            for _, p in items:
                if p not in ("X", "Y", "Z"):
                    raise ValueError(f"unknown Pauli {p!r}")
            self.terms.append((float(coef), items))
        self._attached = False

    def attach(self, circuit) -> None:
        """Append one diff-density request per term (msb-first positions)."""
        for _, items in self.terms:
            circuit.get_dens_op(tuple(q for q, _ in items), with_grad=True)
        self._attached = True

    def expval(self, densities: Sequence[jax.Array],
               offset: int = 0) -> jax.Array:
        """Sum of ``coef * tr(rho_term O_term)`` over this sum's terms,
        reading ``densities[offset:offset+len(terms)]`` (the slice appended
        by :meth:`attach`)."""
        total = 0.0
        for i, (coef, items) in enumerate(self.terms):
            op = pauli_matrix("".join(p for _, p in items))
            total = total + coef * expval_from_density(
                jnp.asarray(densities[offset + i]), op)
        return total


def sample(state: jax.Array, shots: int, key) -> jax.Array:
    """``shots`` basis-state indices drawn from ``|psi_i|^2`` (the
    measurement layer the reference leaves to the user)."""
    state = jnp.asarray(state).reshape(-1)
    logp = 2.0 * jnp.log(jnp.abs(state) + 1e-30)
    return jax.random.categorical(key, logp, shape=(shots,))


def sample_counts(state: jax.Array, shots: int, key) -> jax.Array:
    """Histogram of :func:`sample` over the full computational basis."""
    idx = sample(state, shots, key)
    n = jnp.asarray(state).reshape(-1).shape[0]
    return jnp.bincount(idx, length=n)


def fidelity(state_a: jax.Array, state_b: jax.Array) -> jax.Array:
    """``|<a|b>|^2`` for normalized statevectors."""
    a = jnp.asarray(state_a).reshape(-1)
    b = jnp.asarray(state_b).reshape(-1)
    return jnp.abs(jnp.vdot(a, b, precision=config.matmul_precision())) ** 2
