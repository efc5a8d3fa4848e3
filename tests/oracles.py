"""Independent numpy oracles for statevector operations.

Deliberately implemented by *dense full-operator construction* and explicit
index loops — a different algorithm from the library's reshape/matmul path —
so parity tests are meaningful (same role as the reference's
ndarray_einsum_beta CPU oracles, reference src/quantized_tensor.rs:287-387).
Only used at small n.
"""

import numpy as np


def bits_to_index(bits, positions):
    """Scatter gate-subspace bits into a full-register index.

    ``positions`` is msb-first (framework convention); bit ``j`` of the
    gate-subspace index corresponds to ``reversed(positions)[j]``.
    """
    idx = 0
    for j, p in enumerate(reversed(positions)):
        idx |= ((bits >> j) & 1) << p
    return idx


def full_operator(gate, positions, n):
    """Expand a k-qubit gate into the dense 2^n x 2^n operator."""
    k = len(positions)
    G = np.asarray(gate).reshape(1 << k, 1 << k)
    d = 1 << n
    mask = 0
    for p in positions:
        mask |= 1 << p
    U = np.zeros((d, d), dtype=complex)
    for i in range(d):
        base = i & ~mask
        inbits = 0
        for j, p in enumerate(reversed(positions)):
            inbits |= ((i >> p) & 1) << j
        for outbits in range(1 << k):
            j_full = base | bits_to_index(outbits, positions)
            U[j_full, i] += G[outbits, inbits]
    return U


def apply_oracle(state, gate, positions):
    n = int(np.log2(state.size))
    return full_operator(gate, positions, n) @ np.asarray(state)


def apply_diag_oracle(state, diag, positions):
    n = int(np.log2(state.size))
    diag = np.asarray(diag).reshape(-1)
    out = np.array(state, dtype=complex, copy=True)
    for i in range(state.size):
        bits = 0
        for j, p in enumerate(reversed(positions)):
            bits |= ((i >> p) & 1) << j
        out[i] *= diag[bits]
    return out


def density_oracle(state, positions):
    n = int(np.log2(state.size))
    k = len(positions)
    d = 1 << k
    psi = np.asarray(state)
    others = [q for q in range(n) if q not in positions]
    rho = np.zeros((d, d), dtype=complex)
    for a in range(d):
        for b in range(d):
            s = 0.0 + 0.0j
            ia0 = bits_to_index(a, positions)
            ib0 = bits_to_index(b, positions)
            for rest in range(1 << len(others)):
                extra = 0
                for j, q in enumerate(others):
                    extra |= ((rest >> j) & 1) << q
                s += psi[ia0 | extra] * np.conj(psi[ib0 | extra])
            rho[a, b] = s
    return rho


def random_state(rng, n):
    v = rng.normal(size=(1 << n,)) + 1j * rng.normal(size=(1 << n,))
    return v  # intentionally unnormalized, like the reference's tests


def random_gate(rng, k):
    d = 1 << k
    return rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))


def random_unitary(rng, k):
    q, _ = np.linalg.qr(random_gate(rng, k))
    return q


def random_diag_unitary(rng, k):
    return np.exp(1j * rng.normal(size=(1 << k,)))
