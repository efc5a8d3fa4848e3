"""Static qubit-layout planning for the distributed statevector.

Compiles a logical :class:`~dqc_tpu.circuit.ir.Tape` into a *distributed
program*: the same gate/density stream rewritten to physical local slots,
with :class:`DSwap` qubit-permutation all-to-alls inserted wherever an
instruction touches a qubit currently living on a device bit. All planning is
pure Python at trace time — the compiled program is static, so XLA sees a
fixed sequence of local sweeps and collectives.

Swap placement uses Belady's rule: when the k-bit device block must be
brought local, it lands in the local slots whose current logical qubits are
needed furthest in the future — minimizing subsequent swaps. (A layered
ansatz such as the reference's VQE example, example_vqse_ising.py:68-75,
plans to roughly one all-to-all per layer, i.e. O(layers) collectives rather
than O(gates).)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

from dqc_tpu.circuit.ir import InstrKind, Tape


@dataclass(frozen=True)
class DApply:
    kind: InstrKind                 # GATE or DIAG
    positions: Tuple[int, ...]      # physical local slots, msb-first
    var: bool
    unitary: bool
    queue_idx: int                  # index into the var or const gate list


@dataclass(frozen=True)
class DSwap:
    local_positions: Tuple[int, ...]  # k local slots, msb-first


@dataclass(frozen=True)
class DCycle:
    """Two composed DSwaps in one all-to-all (dist.cycle_global_block):
    globals <- out, out <- in, in <- globals. Equals applying
    DSwap(in_positions) then DSwap(out_positions); the inverse cycle swaps
    the two tuples. Emitted by the fused-program swap peephole
    (parallel/fused_executor.fuse_adjacent_swaps)."""
    out_positions: Tuple[int, ...]  # k local slots -> device axis, msb-first
    in_positions: Tuple[int, ...]   # k local slots <- device axis, msb-first


@dataclass(frozen=True)
class DDensity:
    positions: Tuple[int, ...]      # physical local slots, msb-first
    diff: bool
    dens_idx: int                   # index among the tape's density requests


@dataclass(frozen=True)
class DistProgram:
    """A hashable compiled distributed circuit (usable as a jit static)."""
    n: int                          # logical qubits
    k: int                          # device bits (mesh axis = 2^k devices)
    instructions: Tuple[object, ...]
    num_var_gates: int
    num_const_gates: int
    num_densities: int
    diff_flags: Tuple[bool, ...]    # per density request, in tape order
    final_phys: Tuple[int, ...]     # layout after the program (phys slot per logical qubit)

    @property
    def m(self) -> int:
        return self.n - self.k

    def last_diff_density_index(self) -> int:
        for i in range(len(self.instructions) - 1, -1, -1):
            di = self.instructions[i]
            if isinstance(di, DDensity) and di.diff:
                return i
        return -1


_NO_USE = 1 << 30


def _belady_swap(phys: List[int], needs, nxt_row, m: int, k: int):
    """One swap-planning step shared by the planner and the locality
    reorder's layout simulation: pick the k local slots whose logical
    qubits are needed furthest in the future (Belady), mutate ``phys`` to
    the post-swap layout and return the msb-first slot tuple. Raises
    ValueError when ``needs`` protects too many slots."""
    protected = {phys[q] for q in needs if phys[q] < m}
    if m - len(protected) < k:
        raise ValueError(
            f"instruction on {needs} touches too many qubits to localize "
            f"a {1 << k}-device block"
        )
    logical_at = {p: q for q, p in enumerate(phys) if p < m}
    candidates = [p for p in range(m) if p not in protected]
    candidates.sort(key=lambda p: int(nxt_row[logical_at[p]]), reverse=True)
    slots = sorted(candidates[:k], reverse=True)  # msb-first, deterministic
    for j in range(k):
        l = slots[k - 1 - j]
        g = m + j
        ql, qg = logical_at[l], None
        for q, p in enumerate(phys):
            if p == g:
                qg = q
                break
        phys[ql], phys[qg] = g, l
    return tuple(slots)


def _next_use_table(tape: Tape):
    """``nxt[i, q]`` = index of the first instruction at-or-after ``i``
    touching logical qubit ``q`` (``_NO_USE`` if none), built in ONE reverse
    sweep — O(T*n) instead of the O(T^2) per-query scan (each Belady
    eviction used to rescan the tape tail per candidate)."""
    import numpy as np

    T = len(tape.instructions)
    nxt = np.full((T + 1, tape.n), _NO_USE, dtype=np.int64)
    for i in range(T - 1, -1, -1):
        nxt[i] = nxt[i + 1]
        for q in tape.instructions[i].positions:
            nxt[i, q] = i
    return nxt


def _commutes(a, b) -> bool:
    """Whether two tape instructions commute (reordering-legal): disjoint
    supports always; overlapping supports only when BOTH are diagonal.
    Densities are barriers (observations do not commute with anything)."""
    if a.kind is InstrKind.DENSITY or b.kind is InstrKind.DENSITY:
        return False
    if not set(a.positions) & set(b.positions):
        return True
    return a.kind is InstrKind.DIAG and b.kind is InstrKind.DIAG


def reorder_for_locality(tape: Tape, k: int):
    """Commutation-aware gate batching for the distribution planner: before
    each forced layout swap, hoist every later instruction that (a) is
    executable in the CURRENT layout and (b) commutes past all not-yet-run
    instructions it jumps over. A rotations-then-entanglers layer stops
    splitting its entangler run across three layouts: the local czs run
    before the swap, so the hardware-efficient layer plans in TWO layouts
    (one swap + its restore) instead of three (measured at 20q/8dev:
    segment passes 4 fwd + 8 bwd -> 3 + 6, collectives 3 + 6 -> 2 + 4).

    Returns ``(tape2, var_perm, const_perm)``: ``var_perm[j]`` is the
    ORIGINAL queue index of the j-th var gate of ``tape2`` (likewise for
    const). Only commuting instructions are reordered, so the circuit —
    and every gradient — is identical; callers permute the gate tuples in
    and inverse-permute cotangents out (parallel/scan.py wrappers).
    Disable with DQC_DIST_REORDER=0."""
    import os

    insts = list(tape.instructions)
    T = len(insts)
    if (k <= 0 or T == 0
            or os.environ.get("DQC_DIST_REORDER", "1") == "0"):
        return tape, None, None

    n = tape.n
    m = n - k
    phys: List[int] = list(range(n))
    nxt = _next_use_table(tape)
    done = [False] * T
    order: List[int] = []

    def local(i: int) -> bool:
        return all(phys[q] < m for q in insts[i].positions)

    def hoistable(i: int) -> bool:
        # commutes past every earlier not-yet-emitted instruction
        for j in range(i):
            if not done[j] and not _commutes(insts[i], insts[j]):
                return False
        return True

    i0 = 0
    while i0 < T:
        if done[i0]:
            i0 += 1
            continue
        if local(i0):
            done[i0] = True
            order.append(i0)
            i0 += 1
            continue
        # i0 forces a swap: first drain everything already local that can
        # legally jump ahead of the deferred instructions
        progressed = True
        while progressed:
            progressed = False
            for i in range(i0 + 1, T):
                if not done[i] and local(i) and hoistable(i):
                    done[i] = True
                    order.append(i)
                    progressed = True
        # plan i0's swap with the same Belady step the planner uses
        # (_belady_swap) so the simulated layout tracks the real one; the
        # original-order next-use row is an approximation of the reordered
        # stream's — the plan-count guard below catches any divergence
        try:
            _belady_swap(phys, insts[i0].positions, nxt[i0], m, k)
        except ValueError:
            return tape, None, None  # planner will raise; don't reorder
        done[i0] = True
        order.append(i0)
        i0 += 1

    if order == list(range(T)):
        return tape, None, None

    tape2 = Tape(n, tuple(insts[t] for t in order))
    # guard: keep the reorder only if it actually reduces the swap count
    # of the REAL plan (the simulation's next-use approximation could
    # otherwise regress the layout count silently)
    n_swaps = sum(isinstance(di, DSwap)
                  for di in plan_distribution(tape, k).instructions)
    n_swaps2 = sum(isinstance(di, DSwap)
                   for di in plan_distribution(tape2, k).instructions)
    if n_swaps2 >= n_swaps:
        return tape, None, None
    var_of: List[int] = []
    const_of: List[int] = []
    vi = ci = 0
    idx_of = {}
    for t, inst in enumerate(insts):
        if inst.kind is InstrKind.DENSITY:
            continue
        idx_of[t] = (True, vi) if inst.var else (False, ci)
        if inst.var:
            vi += 1
        else:
            ci += 1
    var_perm: List[int] = []
    const_perm: List[int] = []
    for t in order:
        if insts[t].kind is InstrKind.DENSITY:
            continue
        is_var, qi = idx_of[t]
        (var_perm if is_var else const_perm).append(qi)
    return tape2, tuple(var_perm), tuple(const_perm)


def plan_distribution(tape: Tape, k: int, use_native: bool = None) -> DistProgram:
    """Compile ``tape`` for a ``2^k``-device mesh. Uses the native C++
    planner when built (identical output; tests/test_native.py), falling
    back to the Python reference implementation below."""
    import os
    if use_native is None:
        use_native = os.environ.get("DQC_USE_NATIVE", "1") != "0"
    if use_native:
        from dqc_tpu import native
        out = native.try_plan_distribution(tape, k)
        if out is not None:
            return out
        # None: library absent / k>4 gates (silent), or a planner error
        # (try_plan_distribution warned once) — Python path takes over
    return _plan_distribution_py(tape, k)


def _plan_distribution_py(tape: Tape, k: int) -> DistProgram:
    n = tape.n
    m = n - k
    if k == 0:
        pass  # degenerate single-device plan still valid
    if m < k:
        raise ValueError(
            f"{1 << k} devices need at least {2 * k} qubits (n={n}, k={k}): "
            "the device block must fit among local qubits to swap in"
        )
    # phys[q] = physical slot of logical qubit q; slots >= m are device bits
    phys: List[int] = list(range(n))
    prog: List[object] = []
    var_idx = const_idx = dens_idx = 0
    diff_flags: List[bool] = []
    nxt = _next_use_table(tape)

    for idx, inst in enumerate(tape.instructions):
        needs = inst.positions
        if any(phys[q] >= m for q in needs) and k > 0:
            # Belady: evict local slots whose logical qubits are needed last
            # (slot msb-first: local_positions[k-1-j] <-> device bit j)
            prog.append(DSwap(_belady_swap(phys, needs, nxt[idx], m, k)))
        positions = tuple(phys[q] for q in needs)
        if inst.kind is InstrKind.DENSITY:
            prog.append(DDensity(positions, inst.diff, dens_idx))
            diff_flags.append(inst.diff)
            dens_idx += 1
        elif inst.kind is InstrKind.GATE:
            prog.append(DApply(InstrKind.GATE, positions, inst.var, inst.unitary,
                               var_idx if inst.var else const_idx))
            if inst.var:
                var_idx += 1
            else:
                const_idx += 1
        elif inst.kind is InstrKind.DIAG:
            prog.append(DApply(InstrKind.DIAG, positions, inst.var, inst.unitary,
                               var_idx if inst.var else const_idx))
            if inst.var:
                var_idx += 1
            else:
                const_idx += 1
        else:
            raise AssertionError(inst)

    return DistProgram(
        n=n,
        k=k,
        instructions=tuple(prog),
        num_var_gates=var_idx,
        num_const_gates=const_idx,
        num_densities=dens_idx,
        diff_flags=tuple(diff_flags),
        final_phys=tuple(phys),
    )
