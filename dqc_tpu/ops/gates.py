"""Common gate library.

TPU-native counterpart of the reference's `common_gates.rs` (get_hadamard
common_gates.rs:19-24, get_cnot common_gates.rs:27-34) plus the parameterized
gates its examples build by hand (`zz`/`x`, example_vqse_ising.py:15-28).

All constructors return gates in the framework's canonical layouts:

* dense k-qubit gates: ``(2^k, 2^k)`` complex matrices — pass ``.reshape(-1)``
  anywhere a reference-style flat gate is expected (both are accepted);
* 2-qubit matrices are indexed ``G[(q2 q1), (p2 p1)]`` with the *first*
  circuit position the most significant bit (reference primitives.cu:596);
* diagonal gates: length ``2^k`` vectors of diagonal entries.

Parameterized constructors are pure jnp functions of traced scalars, so they
compose with jit/grad/vmap.
"""

from __future__ import annotations

import jax.numpy as jnp

from dqc_tpu import config


def _c(x, dtype):
    return jnp.asarray(x, dtype=config.canonicalize_complex(dtype))


# --- fixed 1-qubit gates ----------------------------------------------------

def identity(k: int = 1, dtype=None):
    """Identity on k qubits."""
    return _c(jnp.eye(1 << k), dtype)


def hadamard(dtype=None):
    return _c([[1, 1], [1, -1]], dtype) / jnp.sqrt(_c(2.0, dtype))


def pauli_x(dtype=None):
    return _c([[0, 1], [1, 0]], dtype)


def pauli_y(dtype=None):
    return _c([[0, -1j], [1j, 0]], dtype)


def pauli_z(dtype=None):
    return _c([[1, 0], [0, -1]], dtype)


def s_gate(dtype=None):
    return _c([[1, 0], [0, 1j]], dtype)


def t_gate(dtype=None):
    return _c([[1, 0], [0, jnp.exp(1j * jnp.pi / 4)]], dtype)


# --- parameterized 1-qubit rotations ----------------------------------------

def rx(theta, dtype=None):
    """exp(-i theta/2 X)."""
    dtype = config.canonicalize_complex(dtype)
    c = jnp.cos(theta / 2).astype(dtype)
    s = (-1j * jnp.sin(theta / 2)).astype(dtype)
    return jnp.stack([jnp.stack([c, s]), jnp.stack([s, c])])


def ry(theta, dtype=None):
    """exp(-i theta/2 Y)."""
    dtype = config.canonicalize_complex(dtype)
    c = jnp.cos(theta / 2).astype(dtype)
    s = jnp.sin(theta / 2).astype(dtype)
    return jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])


def rz(theta, dtype=None):
    """exp(-i theta/2 Z)."""
    dtype = config.canonicalize_complex(dtype)
    th = jnp.asarray(theta)
    em = jnp.exp(-0.5j * th).astype(dtype)
    ep = jnp.exp(0.5j * th).astype(dtype)
    z = jnp.zeros((), dtype)
    return jnp.stack([jnp.stack([em, z]), jnp.stack([z, ep])])


def phase(phi, dtype=None):
    """diag(1, e^{i phi})."""
    dtype = config.canonicalize_complex(dtype)
    one = jnp.ones((), dtype)
    z = jnp.zeros((), dtype)
    return jnp.stack([jnp.stack([one, z]), jnp.stack([z, jnp.exp(1j * jnp.asarray(phi)).astype(dtype)])])


def x_rotation(beta, dtype=None):
    """The reference example's `x(beta)` gate: [[cos b, -i sin b], [-i sin b, cos b]]
    (example_vqse_ising.py:24-28) — i.e. RX(2*beta)."""
    dtype = config.canonicalize_complex(dtype)
    c = jnp.cos(beta).astype(dtype)
    s = (-1j * jnp.sin(beta)).astype(dtype)
    return jnp.stack([jnp.stack([c, s]), jnp.stack([s, c])])


# --- fixed 2-qubit gates -----------------------------------------------------

def cnot(dtype=None):
    """CNOT with the most-significant position (pos2) as control
    (reference src/test_ghz.py:13)."""
    return _c([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype)


def cz(dtype=None):
    return _c(jnp.diag(jnp.asarray([1, 1, 1, -1])), dtype)


def swap(dtype=None):
    return _c([[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype)


def cz_diag(dtype=None):
    """CZ as a diagonal gate (for `apply_2q_diag`)."""
    return _c([1, 1, 1, -1], dtype)


# --- parameterized 2-qubit gates ----------------------------------------------

def zz(gamma, dtype=None):
    """Diagonal ZZ-interaction gate exp(-i gamma Z⊗Z) as 4 diagonal entries
    (reference example_vqse_ising.py:15-21)."""
    dtype = config.canonicalize_complex(dtype)
    g = jnp.asarray(gamma)
    e_m = jnp.exp(-1j * g).astype(dtype)
    e_p = jnp.exp(1j * g).astype(dtype)
    return jnp.stack([e_m, e_p, e_p, e_m])


def cphase(phi, dtype=None):
    """Controlled-phase as 4 diagonal entries: diag(1, 1, 1, e^{i phi})."""
    dtype = config.canonicalize_complex(dtype)
    one = jnp.ones((), dtype)
    return jnp.stack([one, one, one, jnp.exp(1j * jnp.asarray(phi)).astype(dtype)])


def controlled(u, dtype=None):
    """Promote a 1-qubit gate to its controlled 2-qubit version
    (control = most-significant position)."""
    dtype = config.canonicalize_complex(dtype)
    u = jnp.asarray(u, dtype=dtype).reshape(2, 2)
    out = jnp.eye(4, dtype=dtype)
    return out.at[2:, 2:].set(u)
