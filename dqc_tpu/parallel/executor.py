"""Distributed tape execution + O(1)-memory adjoint (inside ``shard_map``).

The multi-device analog of circuit/autograd.py: the same uncompute-based
reverse pass (reference src/circuit.rs:266-429), with two additions:

* ``DSwap`` qubit-permutation all-to-alls are unitary permutations, so the
  backward pass uncomputes them by *re-applying the identical swap* (a block
  swap is an involution) for both the rolled-back forward state and the
  cotangent state — transpose of a permutation is its inverse;
* density matrices finish with a ``psum``; their cotangents arrive replicated
  and seed each shard locally (d(psum)/d(shard) is the identity per shard).

Everything runs on local shards; gates and densities are replicated
(they are tiny), only the two statevector-sized arrays are sharded.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from dqc_tpu.circuit.ir import InstrKind
from dqc_tpu.ops import statevector as sv
from dqc_tpu.parallel import dist
from dqc_tpu.parallel.layout import DApply, DDensity, DistProgram, DSwap


def _gate_for(di: DApply, var_gates, const_gates):
    return var_gates[di.queue_idx] if di.var else const_gates[di.queue_idx]


def _apply(local, di: DApply, gate):
    if di.kind is InstrKind.GATE:
        return sv.apply_gate(local, gate, di.positions)
    return sv.apply_diag(local, gate, di.positions)


def _uncompute(local, di: DApply, gate):
    if di.kind is InstrKind.GATE:
        if di.unitary:
            return sv.apply_gate_adjoint(local, gate, di.positions)
        return sv.apply_gate_inverse(local, gate, di.positions,
                                     ctx=f"gate at positions {di.positions}")
    from dqc_tpu.ops import inversion

    inv = inversion.invert_diag(gate.reshape(-1), di.unitary,
                                ctx=f"diag gate at positions {di.positions}")
    return sv.apply_diag(local, inv, di.positions)


def _transport(local, di: DApply, gate):
    if di.kind is InstrKind.GATE:
        return sv.apply_gate_transpose(local, gate, di.positions)
    return sv.apply_diag(local, gate, di.positions)


def dist_run(
    program: DistProgram,
    axis: str,
    local_state: jax.Array,
    var_gates,
    const_gates,
    *,
    only_diff: bool = False,
    stop_after: Optional[int] = None,
):
    """Forward fold over the distributed program (inside shard_map)."""
    densities: List[jax.Array] = []
    state = jnp.asarray(local_state)
    for idx, di in enumerate(program.instructions):
        if stop_after is not None and idx > stop_after:
            break
        if isinstance(di, DSwap):
            state = dist.swap_global_block(state, di.local_positions, axis)
        elif isinstance(di, DDensity):
            if di.diff or not only_diff:
                densities.append(dist.local_density(state, di.positions, axis))
        else:
            state = _apply(state, di, jnp.asarray(_gate_for(di, var_gates, const_gates)).astype(state.dtype))
    return tuple(densities), state


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def dist_tape_forward(program: DistProgram, axis: str, local_state, var_gates, const_gates):
    """Differentiable distributed execution returning diff-density matrices
    (replicated across the mesh)."""
    densities, _ = dist_run(program, axis, local_state, var_gates, const_gates, only_diff=True)
    return densities


def _fwd(program: DistProgram, axis: str, local_state, var_gates, const_gates):
    last = program.last_diff_density_index()
    densities, state = dist_run(
        program, axis, local_state, var_gates, const_gates,
        only_diff=True, stop_after=last if last >= 0 else -1,
    )
    if last < 0:
        state = jnp.asarray(local_state)
    return densities, (state, local_state, var_gates, const_gates)


def _bwd(program: DistProgram, axis: str, residuals, density_cts):
    state, local_state, var_gates, const_gates = residuals
    last = program.last_diff_density_index()

    diff_indices = [
        i for i, di in enumerate(program.instructions)
        if isinstance(di, DDensity) and di.diff
    ]
    ct_of = dict(zip(diff_indices, density_cts))

    fwd = jnp.asarray(state)
    bwd = None
    var_cts_rev: List[jax.Array] = []

    for idx in range(len(program.instructions) - 1, last, -1):
        di = program.instructions[idx]
        if isinstance(di, DApply) and di.var:
            var_cts_rev.append(jnp.zeros_like(jnp.asarray(_gate_for(di, var_gates, const_gates))))

    for idx in range(last, -1, -1):
        di = program.instructions[idx]
        if isinstance(di, DSwap):
            fwd = dist.swap_global_block(fwd, di.local_positions, axis)
            if bwd is not None:
                bwd = dist.swap_global_block(bwd, di.local_positions, axis)
            continue
        if isinstance(di, DDensity):
            if not di.diff:
                continue
            ct = ct_of[idx]
            d = 1 << len(di.positions)
            ct_m = jnp.asarray(ct).reshape(d, d).astype(fwd.dtype)
            seed = sv.apply_gate(fwd.conj(), ct_m + ct_m.conj().T, di.positions)
            bwd = seed if bwd is None else bwd + seed
            continue
        g = jnp.asarray(_gate_for(di, var_gates, const_gates)).astype(fwd.dtype)
        fwd = _uncompute(fwd, di, g)
        if di.var:
            if bwd is None:
                var_cts_rev.append(jnp.zeros_like(g))
            elif di.kind is InstrKind.DIAG:
                # per-shard partial; summed across the mesh below
                var_cts_rev.append(sv.diag_gate_grad(fwd, bwd, di.positions))
            else:
                var_cts_rev.append(sv.gate_grad(fwd, bwd, di.positions))
        if bwd is not None:
            bwd = _transport(bwd, di, g)

    init_ref = jnp.asarray(local_state)
    state_ct = jnp.zeros_like(init_ref) if bwd is None else bwd.astype(init_ref.dtype)

    # Gate-gradient contractions above sum only over the local batch axis;
    # the full gradient sums over every amplitude, so finish with a psum
    # (cheap: gradients are gate-sized). Replicated-out contract for the
    # replicated gate inputs.
    var_cts = []
    for ct, ref in zip(reversed(var_cts_rev), var_gates):
        ref = jnp.asarray(ref)
        summed = jax.lax.psum(ct, axis)
        var_cts.append(_match(summed, ref))
    const_cts = tuple(jnp.zeros_like(jnp.asarray(g)) for g in const_gates)
    return state_ct, tuple(var_cts), const_cts


def _match(ct, ref):
    ct = ct.reshape(ref.shape)
    if jnp.issubdtype(ref.dtype, jnp.complexfloating):
        return ct.astype(ref.dtype)
    return ct.real.astype(ref.dtype)


dist_tape_forward.defvjp(_fwd, _bwd)
