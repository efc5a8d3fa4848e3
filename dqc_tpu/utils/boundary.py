"""Complex <-> real-pair marshalling at the jit boundary.

TPU backends compute complex64 fine *inside* a compiled program (XLA
decomposes it into real planes on the VPU/MXU), and embed complex constants,
but cannot transfer complex arrays across the host<->device boundary: passing
a complex array as a jit argument or fetching a complex output raises
UNIMPLEMENTED. (Empirically pinned on TPU v5e; this is also why the state
layout keeps complex strictly device-side.)

The rule this module enforces for every public circuit function:

* called with **traced** inputs (inside a user's jit/grad) -> pass through,
  complex tracers are legal there;
* called with **concrete** inputs (eager, reference-style usage) -> split
  each complex leaf into a stacked real pair ``(2, ...)`` on the host, run a
  cached jitted core that reassembles ``lax.complex`` inside the program, and
  return densities re-assembled to numpy complex on the host.

This is what lets reference-style code (complex gate lists, eager calls —
e.g. the GHZ test pattern of reference src/test_ghz.py:32-33) run unmodified
on TPU hardware while staying one-compilation fast.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np


def tree_has_tracer(*trees: Any) -> bool:
    """True when the call must take the TRACED path: any leaf is a JAX
    tracer, OR a trace is active (the caller sits inside someone else's
    jit/grad/vmap with all-concrete gate inputs — the core's outputs would
    be tracers there, so host-side unpacking is illegal even though the
    inputs are plain numpy)."""
    for tree in trees:
        for leaf in jax.tree_util.tree_leaves(tree):
            if isinstance(leaf, jax.core.Tracer):
                return True
    return _trace_active()


def _trace_active() -> bool:
    """True when called under an active jit/grad/vmap trace."""
    try:  # current jax: the ambient trace is EvalTrace only outside traces
        return type(jax.core.trace_ctx.trace).__name__ != "EvalTrace"
    except AttributeError:
        pass
    try:  # older jax
        return not jax.core.trace_state_clean()
    except AttributeError:
        return False


def split_pair(x) -> np.ndarray:
    """Host-side: complex array -> stacked real pair ``(2, *shape)``."""
    a = np.asarray(x)
    if np.iscomplexobj(a):
        return np.stack([a.real, a.imag]).astype(_real_dtype(a.dtype))
    return np.stack([a, np.zeros_like(a)])


def merge_pair(p):
    """Trace-side: stacked real pair -> complex array (``lax.complex``)."""
    return lax.complex(p[0], p[1])


def pack_complex(z):
    """Trace-side: complex array -> stacked real pair for safe jit output."""
    return jnp.stack([jnp.real(z), jnp.imag(z)])


def unpack_to_numpy(p) -> np.ndarray:
    """Host-side: fetched real pair -> numpy complex array."""
    a = np.asarray(p)
    return a[0] + 1j * a[1]


def _real_dtype(cdtype):
    return np.float64 if np.dtype(cdtype) == np.complex128 else np.float32
