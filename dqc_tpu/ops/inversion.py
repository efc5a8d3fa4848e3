"""Checked gate inversion for the non-unitary uncompute.

The O(1)-memory adjoint rolls the forward state back by applying ``G^-1``
for non-unitary gates; a (near-)singular gate silently turns every gradient
into inf/nan. The reference detects exact singularity inside cuBLAS and
reports "U(i,i) is zero" (reference primitives.cu:128-132); this module is
the TPU rebuild's stronger equivalent:

* concrete gates (constants, or any gate in eager execution) are inverted
  host-side with a conditioning check — a singular/ill-conditioned gate
  raises an actionable ``ValueError`` naming the gate, *before* any device
  work;
* traced gates (var gates under jit) cannot raise at runtime; with
  ``config.set_singularity_checks("debug")`` the inverse is guarded by a
  ``lax.cond`` + ``jax.debug.print`` host callback that fires only when the
  inverse is non-finite (costs one tiny reduction per non-unitary gate).

``config.set_singularity_checks("off")`` disables everything (the
reference's behavior minus the cuBLAS info check).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dqc_tpu import config
from dqc_tpu.ops import groups as gr


def _msg(ctx: str, detail: str) -> str:
    return (
        f"singular non-unitary gate during uncompute ({ctx}): {detail}. "
        "The O(1)-memory adjoint inverts non-unitary gates to roll the "
        "forward state back (reference primitives.cu:128-132); regularize "
        "the gate (e.g. unitary + small perturbation) so its inverse is "
        "well-conditioned."
    )


def _cond_limit(dtype) -> float:
    # past ~0.1/eps the uncomputed state has no correct bits left
    return 0.1 / float(np.finfo(np.dtype(dtype).type(0).real.dtype).eps)


def _traced_guard(inv, ctx: str):
    if config.singularity_checks() != "debug":
        return inv
    bad = jnp.logical_not(jnp.all(jnp.isfinite(jnp.abs(inv))))

    def warn():
        jax.debug.print(
            "dqc_tpu: non-finite inverse of a non-unitary gate during "
            "uncompute (" + ctx + ") - gradients will be non-finite"
        )

    jax.lax.cond(bad, warn, lambda: None)
    return inv


def invert_gate(m, unitary: bool, ctx: str = "gate"):
    """``G^-1`` (``G^dagger`` for unitary), checked per the module policy.
    Concrete inputs stay host-side numpy (constant-dedup friendly)."""
    c = gr.concrete_or_none(m)
    if c is not None:
        if unitary:
            return c.conj().T
        if config.singularity_checks() == "off":
            return np.linalg.inv(c)
        try:
            inv = np.linalg.inv(c)
        except np.linalg.LinAlgError as e:
            raise ValueError(_msg(ctx, str(e))) from None
        cond = float(np.linalg.cond(c))
        if not np.all(np.isfinite(inv)) or cond > _cond_limit(c.dtype):
            raise ValueError(_msg(ctx, f"condition number {cond:.3e}"))
        return inv
    if unitary:
        return m.conj().T
    return _traced_guard(jnp.linalg.inv(m), ctx)


def invert_diag(d, unitary: bool, ctx: str = "diag gate"):
    """Elementwise inverse of a diagonal gate, checked like invert_gate."""
    c = gr.concrete_or_none(d)
    if c is not None:
        if unitary:
            return c.conj()
        if config.singularity_checks() == "off":
            return 1.0 / c
        mags = np.abs(c)
        if mags.min() == 0.0 or mags.max() / mags.min() > _cond_limit(c.dtype):
            detail = ("zero diagonal entry" if mags.min() == 0.0
                      else f"entry magnitude ratio {mags.max() / mags.min():.3e}")
            raise ValueError(_msg(ctx, detail))
        return 1.0 / c
    if unitary:
        return d.conj()
    return _traced_guard(1.0 / d, ctx)
