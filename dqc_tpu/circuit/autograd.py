"""Tape execution + the O(1)-memory adjoint as a ``jax.custom_vjp``.

This reimplements, functionally, the reference's three Rust interpreters:

* :func:`run_tape`      — `Circuit::run` / `Circuit::forward`
  (reference src/circuit.rs:164-212 / 214-264),
* :func:`tape_forward`  — the ``custom_vjp`` wrapper whose backward rule is
  `Circuit::backward` (reference src/circuit.rs:266-429): instead of letting
  JAX checkpoint ~depth statevectors, the reverse pass **uncomputes** the
  forward state by applying ``G^dagger`` (unitary) or ``G^-1`` (non-unitary)
  while transporting a single cotangent state, so exactly 2-3 statevectors
  are live regardless of circuit depth (reference README.md:17).

Correctness contract: gradients produced here are **bit-for-bit the same
convention as plain JAX AD** of the equivalent jnp program (verified in
tests/test_autodiff.py by direct comparison and by the reference's 8th-order
finite-difference gauntlet, reference src/test_autodiff.py:152-165). In
JAX's complex-cotangent convention this means, for ``psi' = G psi``:

* input-state cotangent:  ``psi_bar = G^T psi'_bar``        (plain transpose),
* gate cotangent:         ``G_bar[p,q] = sum psi'_bar[p] psi[q]``  (no conj),
* density ``rho = psi psi^H`` seeds ``psi_bar += (L + L^H) conj(psi)`` for an
  incoming density cotangent ``L``.

(The reference implements the same algebra with the conjugation shuffled to
the Python boundary — circuit.py:193 conjugates incoming density cotangents —
and relies on density cotangents of real losses being Hermitian; here the
exact ``(L + L^H)`` seed is used so *any* downstream JAX computation is
differentiated correctly, not only real losses of Hermitian form.)

Unlike the reference, everything here is jit/grad/vmap-composable (the
reference forbids jit across the circuit, README.md:15), and the tape is a
``nondiff_argnums`` static so XLA sees one flat, fully-fusable program.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from dqc_tpu.circuit.ir import InstrKind, Instruction, Tape
from dqc_tpu.ops import statevector as sv


# ---------------------------------------------------------------------------
# Gate/queue bookkeeping (pure Python, trace-time only)
# ---------------------------------------------------------------------------

def _gates_by_instruction(tape: Tape, var_gates, const_gates) -> List[Optional[object]]:
    """Assign each instruction its gate payload (None for densities).

    Mirrors the reference's two VecDeque queues consumed in tape order
    (circuit.rs:172-173).
    """
    out: List[Optional[object]] = []
    vi, ci = iter(var_gates), iter(const_gates)
    for inst in tape.instructions:
        if inst.is_gate:
            out.append(next(vi) if inst.var else next(ci))
        else:
            out.append(None)
    return out


def _apply(state, inst: Instruction, gate):
    if inst.kind is InstrKind.GATE:
        return sv.apply_gate(state, gate, inst.positions)
    if inst.kind is InstrKind.DIAG:
        return sv.apply_diag(state, gate, inst.positions)
    raise AssertionError(inst)


def _uncompute(state, inst: Instruction, gate):
    """Roll the forward state back through one gate (circuit.rs:282-314)."""
    if inst.kind is InstrKind.GATE:
        if inst.unitary:
            return sv.apply_gate_adjoint(state, gate, inst.positions)
        return sv.apply_gate_inverse(state, gate, inst.positions,
                                     ctx=f"gate at positions {inst.positions}")
    if inst.kind is InstrKind.DIAG:
        from dqc_tpu.ops import inversion

        inv = inversion.invert_diag(gate.reshape(-1), inst.unitary,
                                    ctx=f"diag gate at positions {inst.positions}")
        return sv.apply_diag(state, inv, inst.positions)
    raise AssertionError(inst)


def _transport(ct_state, inst: Instruction, gate):
    """Pull the cotangent state back through one gate: ``G^T`` (plain
    transpose; diagonal gates are their own transpose). Reference
    apply_*_gate_tr calls at circuit.rs:284-316."""
    if inst.kind is InstrKind.GATE:
        return sv.apply_gate_transpose(ct_state, gate, inst.positions)
    if inst.kind is InstrKind.DIAG:
        return sv.apply_diag(ct_state, gate, inst.positions)
    raise AssertionError(inst)


def _match_cotangent(ct, ref):
    """Project a computed cotangent onto the dtype/shape of the primal input
    (real inputs get the real part — the vjp of the implicit complex cast)."""
    ct = ct.reshape(jnp.shape(ref))
    ref_dtype = jnp.result_type(ref)
    if jnp.issubdtype(ref_dtype, jnp.complexfloating):
        return ct.astype(ref_dtype)
    return ct.real.astype(ref_dtype)


# ---------------------------------------------------------------------------
# Forward execution
# ---------------------------------------------------------------------------

def run_tape(
    tape: Tape,
    state: jax.Array,
    var_gates: Sequence,
    const_gates: Sequence,
    *,
    only_diff: bool = False,
    stop_after: Optional[int] = None,
) -> Tuple[Tuple[jax.Array, ...], jax.Array]:
    """Fold the tape over the state; collect requested density matrices.

    ``only_diff=False`` is `Circuit::run` (all densities, circuit.rs:201-206);
    ``only_diff=True`` is `Circuit::forward` (grad-participating densities
    only, circuit.rs:252-258). ``stop_after`` truncates execution after the
    given instruction index (used by the adjoint to avoid dead trailing work).

    Returns ``(densities_in_tape_order, state_after_last_executed_instr)``.
    """
    state = jnp.asarray(state)
    gates = _gates_by_instruction(tape, var_gates, const_gates)
    densities: List[jax.Array] = []
    for idx, (inst, gate) in enumerate(zip(tape.instructions, gates)):
        if stop_after is not None and idx > stop_after:
            break
        if inst.kind is InstrKind.DENSITY:
            if inst.diff or not only_diff:
                densities.append(sv.density(state, inst.positions))
        else:
            state = _apply(state, inst, gate)
    return tuple(densities), state


# ---------------------------------------------------------------------------
# custom_vjp: O(1)-memory adjoint
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0,))
def tape_forward(tape: Tape, initial_state, var_gates, const_gates):
    """Differentiable tape execution returning the diff-density matrices.

    Gradients flow to ``var_gates`` and ``initial_state`` (the latter is a
    capability beyond the reference, whose initial state is frozen inside the
    Rust object); ``const_gates`` receive zero cotangents by contract
    (reference returns no const-gate gradients, circuit.py:197).
    """
    densities, _ = run_tape(tape, initial_state, var_gates, const_gates, only_diff=True)
    return densities


def _tape_forward_fwd(tape: Tape, initial_state, var_gates, const_gates):
    last = tape.last_diff_density_index()
    densities, state = run_tape(
        tape, initial_state, var_gates, const_gates,
        only_diff=True, stop_after=last if last >= 0 else -1,
    )
    # Residuals: the state at the last diff density + the gate values — never
    # the per-gate intermediate states (the whole point; reference
    # circuit.py:184-189 saves only the gates, the state lives in Rust).
    if last < 0:
        state = initial_state
    return densities, (state, initial_state, var_gates, const_gates)


def _tape_forward_bwd(tape: Tape, residuals, density_cts):
    state, initial_state, var_gates, const_gates = residuals
    last = tape.last_diff_density_index()
    gates = _gates_by_instruction(tape, var_gates, const_gates)

    # Map each diff-density instruction index -> its cotangent.
    diff_indices = [
        i for i, inst in enumerate(tape.instructions)
        if inst.kind is InstrKind.DENSITY and inst.diff
    ]
    ct_of = dict(zip(diff_indices, density_cts))

    fwd = jnp.asarray(state)  # rolls backwards: state *entering* each instruction
    bwd = None             # cotangent state (lazy; None == exact zero)
    var_cts_rev: List[jax.Array] = []

    # Trailing var gates (after the last diff density) get static zeros —
    # the reference's bwd_option=None branches (circuit.rs:327-332) — and
    # are never executed or uncomputed here.
    for idx in range(len(tape.instructions) - 1, last, -1):
        inst = tape.instructions[idx]
        if inst.is_gate and inst.var:
            var_cts_rev.append(jnp.zeros_like(jnp.asarray(gates[idx])))

    for idx in range(last, -1, -1):
        inst = tape.instructions[idx]
        gate = gates[idx]
        if inst.kind is InstrKind.DENSITY:
            if not inst.diff:
                continue
            ct = ct_of[idx]
            d = 1 << inst.k
            ct_m = jnp.asarray(ct).reshape(d, d).astype(fwd.dtype)
            # vjp of rho = psi psi^H:  psi_bar += (L + L^H) conj(psi)
            seed = sv.apply_gate(fwd.conj(), ct_m + ct_m.conj().T, inst.positions)
            bwd = seed if bwd is None else bwd + seed
            continue

        g = jnp.asarray(gate).astype(fwd.dtype)
        fwd = _uncompute(fwd, inst, g)  # fwd is now the state entering this gate
        if inst.var:
            if bwd is None:
                var_cts_rev.append(jnp.zeros_like(g))
            elif inst.kind is InstrKind.DIAG:
                var_cts_rev.append(sv.diag_gate_grad(fwd, bwd, inst.positions))
            else:
                var_cts_rev.append(sv.gate_grad(fwd, bwd, inst.positions))
        if bwd is not None:
            bwd = _transport(bwd, inst, g)

    # Initial-state cotangent (zero if no diff densities touched it).
    init_ref = jnp.asarray(initial_state)
    if bwd is None:
        state_ct = jnp.zeros_like(init_ref)
    else:
        state_ct = bwd.astype(init_ref.dtype)

    var_cts = tuple(
        _match_cotangent(ct, ref)
        for ct, ref in zip(reversed(var_cts_rev), var_gates)
    )
    const_cts = tuple(jnp.zeros_like(jnp.asarray(g)) for g in const_gates)
    return state_ct, var_cts, const_cts


tape_forward.defvjp(_tape_forward_fwd, _tape_forward_bwd)
