"""Layer-scanned execution: O(1) program size for deep layered circuits.

A deep ansatz (the reference example runs 26 layers x 52 gates,
example_vqse_ising.py:52-75) unrolled into XLA is a program whose size grows
with depth — slow to compile and, through a remote-compile service, too big
to ship. Here the repeated layer becomes ONE ``lax.scan`` body:

* forward: ``scan`` of the fused layer tape over per-layer stacked gate
  values (leading axis = layers);
* backward (custom_vjp): a **reverse scan** of the same uncompute adjoint —
  the carry is ``(fwd_state, cotangent_state)`` and each step re-derives the
  layer's gate cotangents with the blockwise machinery
  (fused_autograd._backward_gate_step), stacking them into ``(L, ...)``
  gradients. Memory stays O(1) statevectors at any depth *and* the compiled
  program stays O(one layer).

The layer tape must be gate-only (densities belong in an epilogue tape —
compose ``scanned_layers(...)`` with ``fused_tape_forward``; JAX chains the
custom_vjps).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from dqc_tpu.circuit.fused_autograd import (
    _backward_gate_step,
    fused_run,
)
from dqc_tpu.circuit.fusion import FDensity, FusedTape, fuse_tape
from dqc_tpu.circuit.ir import Tape
from dqc_tpu.ops import groups as gr


def fuse_layer(tape: Tape) -> FusedTape:
    """Fuse a gate-only layer tape (rejects density instructions)."""
    ftape = fuse_tape(tape)
    if any(isinstance(fi, FDensity) for fi in ftape.instructions):
        raise ValueError("layer tapes must contain gates only; put density "
                         "ops in an epilogue tape")
    return ftape


import os
_SCAN_UNROLL = int(os.environ.get("DQC_SCAN_UNROLL", "1"))


def scanned_layers(ftape: FusedTape, initial_state, stacked_var_gates, const_gates):
    """Apply the layer ``L`` times: leaves of ``stacked_var_gates`` carry a
    leading layer axis; ``const_gates`` are shared by every layer. Returns
    the final statevector (flat).

    Dispatches to the plane-layout Pallas engine (circuit/plane_scan.py) when
    eligible — >=14 qubits, complex64, no dense cross-group gates; see
    ``config.set_plane_engine`` — else runs the complex XLA path below.
    """
    from dqc_tpu.circuit import plane_scan

    if plane_scan.use_plane_engine(ftape, jnp.asarray(initial_state).dtype):
        return plane_scan.plane_scanned_layers(
            ftape, initial_state, stacked_var_gates, const_gates)
    return _scanned_layers_xla(ftape, initial_state, stacked_var_gates, const_gates)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _scanned_layers_xla(ftape: FusedTape, initial_state, stacked_var_gates, const_gates):
    """Complex-einsum scan path (every backend/dtype/tape shape).
    DQC_SCAN_UNROLL unrolls the scan body (compile-size/time tradeoff)."""
    def body(state, layer_gates):
        _, state = fused_run(ftape, state, layer_gates, const_gates)
        return state, None

    final, _ = jax.lax.scan(body, jnp.asarray(initial_state), stacked_var_gates,
                            unroll=_SCAN_UNROLL)
    return final


def _fwd(ftape, initial_state, stacked_var_gates, const_gates):
    final = _scanned_layers_xla(ftape, initial_state, stacked_var_gates, const_gates)
    return final, (final, initial_state, stacked_var_gates, const_gates)


def _bwd(ftape, residuals, ct):
    final, initial_state, stacked_var_gates, const_gates = residuals
    n = ftape.n
    sizes = gr.group_sizes_low_first(n)

    def body(carry, layer_gates):
        fwd_flat, bwd_flat = carry
        fwd = gr.to_grouped(fwd_flat, n)
        bwd = gr.to_grouped(bwd_flat, n)
        var_cts = {}
        for fi in reversed(ftape.instructions):
            fwd, bwd = _backward_gate_step(
                fi, fwd, bwd, layer_gates, const_gates, sizes, n, var_cts
            )
        layer_cts = tuple(
            _match_ct(var_cts[q], layer_gates[q]) for q in range(len(layer_gates))
        )
        return (gr.from_grouped(fwd), gr.from_grouped(bwd)), layer_cts

    (fwd0, bwd0), stacked_cts = jax.lax.scan(
        body,
        (jnp.asarray(final), jnp.asarray(ct).astype(jnp.asarray(final).dtype)),
        stacked_var_gates,
        reverse=True,
        unroll=_SCAN_UNROLL,
    )
    init_ref = jnp.asarray(initial_state)
    state_ct = bwd0.astype(init_ref.dtype)
    const_cts = tuple(jnp.zeros_like(jnp.asarray(g)) for g in const_gates)
    return state_ct, stacked_cts, const_cts


def _match_ct(ct, ref):
    ref = jnp.asarray(ref)
    ct = ct.reshape(ref.shape)
    if jnp.issubdtype(ref.dtype, jnp.complexfloating):
        return ct.astype(ref.dtype)
    return ct.real.astype(ref.dtype)


_scanned_layers_xla.defvjp(_fwd, _bwd)
