"""`AutoGradCircuit` — the reference-compatible builder API.

Drop-in replacement for the reference's Python entry point
(``qdc.AutoGradCircuit``, reference src/qdc/circuit.py:8-202): the same
builder methods append instructions to a :class:`~dqc_tpu.circuit.ir.Tape`,
and :meth:`build` returns ``(simple_run, autodiff_run)`` with the same
calling convention ``fn(var_gates, const_gates) -> [density_matrices]``.

Differences (all strict upgrades):

* both returned functions are **pure jittable JAX functions** — the reference
  explicitly forbids ``jit`` across its circuit functions (README.md:15);
* gates may be flat (reference convention) or square matrices;
* dtype is a runtime parameter, not an install-time build flag;
* generic k-qubit gate/density methods beyond the reference's 1q/2q set;
* the initial state is differentiable via :func:`tape_forward`.

Qubit convention: positions count from the innermost (fastest-varying) bit;
for 2-qubit ops ``pos2`` is the gate's most-significant qubit, documented as
"control" in the reference (src/qdc/circuit.py:27-28).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dqc_tpu import config
from dqc_tpu.circuit.autograd import run_tape, tape_forward
from dqc_tpu.circuit.ir import InstrKind, Instruction, Tape
from dqc_tpu.ops import statevector as sv
from dqc_tpu.utils import boundary


class AutoGradCircuit:
    """Quantum circuit with automatic differentiation (TPU-native)."""

    def __init__(self, qubits_number: int, dtype=None):
        if qubits_number < 1:
            raise ValueError("qubits_number must be >= 1")
        self.n = int(qubits_number)
        self.dtype = config.canonicalize_complex(dtype)
        self.tape = Tape(self.n)
        self._initial_state: Optional[jax.Array] = None

    # -- initial state -------------------------------------------------------

    def set_state_from_vector(self, vec) -> None:
        """Set the initial state from an array of ``2**n`` amplitudes
        (reference circuit.py:14-22).

        Stored host-side (numpy) and embedded as a program constant at trace
        time — complex arrays must never cross the device boundary eagerly
        (TPU backends reject complex transfers; see utils/boundary.py).
        """
        if isinstance(vec, jax.core.Tracer):
            raise TypeError(
                "set_state_from_vector needs a concrete array; for traced "
                "initial states call dqc_tpu.circuit.tape_forward directly"
            )
        vec = np.asarray(vec)
        if vec.size != (1 << self.n):
            raise ValueError(
                f"state must have {1 << self.n} amplitudes, got {vec.size}"
            )
        self._initial_state = vec.reshape(-1).astype(self.dtype)

    def initial_state(self) -> np.ndarray:
        """The circuit's initial state (|0...0> unless overridden), host-side."""
        if self._initial_state is None:
            v = np.zeros(1 << self.n, dtype=self.dtype)
            v[0] = 1.0
            return v
        return self._initial_state

    # -- generic instruction appenders (extension beyond the reference) ------

    def add_gate(self, positions: Sequence[int], *, var: bool, unitary: bool = True):
        """Append a dense k-qubit gate on ``positions`` (msb first)."""
        self.tape = self.tape.append(
            Instruction(InstrKind.GATE, tuple(positions), var=var, unitary=unitary)
        )

    def add_diag_gate(self, positions: Sequence[int], *, var: bool, unitary: bool = True):
        """Append a diagonal k-qubit gate on ``positions`` (msb first)."""
        self.tape = self.tape.append(
            Instruction(InstrKind.DIAG, tuple(positions), var=var, unitary=unitary)
        )

    def get_dens_op(self, positions: Sequence[int], *, with_grad: bool = False):
        """Append a k-qubit reduced-density-matrix request."""
        self.tape = self.tape.append(
            Instruction(InstrKind.DENSITY, tuple(positions), diff=with_grad)
        )

    # -- reference-compatible 1q/2q methods (circuit.py:24-158) --------------

    def add_q1_const_gate(self, pos: int):
        self.add_gate((pos,), var=False, unitary=True)

    def add_q1_const_gate_nonu(self, pos: int):
        self.add_gate((pos,), var=False, unitary=False)

    def add_q1_var_gate(self, pos: int):
        self.add_gate((pos,), var=True, unitary=True)

    def add_q1_var_gate_nonu(self, pos: int):
        self.add_gate((pos,), var=True, unitary=False)

    def add_q2_const_gate(self, pos2: int, pos1: int):
        self.add_gate((pos2, pos1), var=False, unitary=True)

    def add_q2_const_gate_nonu(self, pos2: int, pos1: int):
        self.add_gate((pos2, pos1), var=False, unitary=False)

    def add_q2_const_gate_diag(self, pos2: int, pos1: int):
        self.add_diag_gate((pos2, pos1), var=False, unitary=True)

    def add_q2_var_gate(self, pos2: int, pos1: int):
        self.add_gate((pos2, pos1), var=True, unitary=True)

    def add_q2_var_gate_nonu(self, pos2: int, pos1: int):
        self.add_gate((pos2, pos1), var=True, unitary=False)

    def add_q2_var_gate_diag(self, pos2: int, pos1: int):
        self.add_diag_gate((pos2, pos1), var=True, unitary=True)

    def get_q1_dens_op(self, pos: int):
        self.get_dens_op((pos,), with_grad=False)

    def get_q2_dens_op(self, pos2: int, pos1: int):
        self.get_dens_op((pos2, pos1), with_grad=False)

    def get_q1_dens_op_with_grad(self, pos: int):
        self.get_dens_op((pos,), with_grad=True)

    def get_q2_dens_op_with_grad(self, pos2: int, pos1: int):
        self.get_dens_op((pos2, pos1), with_grad=True)

    # -- build ----------------------------------------------------------------

    def build(self, fused: Optional[bool] = None) -> Tuple[Callable, Callable]:
        """Return ``(simple_run, autodiff_run)`` (reference circuit.py:160-202).

        ``simple_run(var_gates, const_gates)`` evaluates *all* requested
        density matrices with no AD support needed; ``autodiff_run`` returns
        only the ``*_with_grad`` densities and supports reverse-mode AD with
        the O(1)-memory adjoint. Both are jit/vmap-compatible.

        ``fused`` (default: ``config.default_fusion()``) selects the
        gate-fusion execution engine (circuit/fusion.py) — semantically
        identical, one HBM sweep per fused block instead of per gate.
        ``fused=False`` is the per-gate reference path: correct everywhere
        and fine on CPU, but on TPU its strided state views tile-pad badly —
        keep fusion on for real hardware.
        """
        tape = self.tape
        fused = config.default_fusion() if fused is None else fused
        if self._initial_state is None:
            # build |0...0> inside the trace — embedding a 2^n constant
            # vector costs 2^n literal bytes in the lowered program
            n, dtype = self.n, self.dtype
            make_init = lambda: sv.standard_state(n, dtype)
        else:
            init_np = self._initial_state  # host numpy custom state
            make_init = lambda: jnp.asarray(init_np)

        if fused:
            from dqc_tpu.circuit.fused_autograd import fused_run, fused_tape_forward
            from dqc_tpu.circuit.fusion import fuse_tape

            ftape = fuse_tape(tape)

            def _run_all(vg, cg):
                densities, _ = fused_run(ftape, make_init(), vg, cg, only_diff=False)
                return list(densities)

            def _run_diff(vg, cg):
                from dqc_tpu.circuit.plane_scan import plane_tape_forward, use_plane_tape

                if use_plane_tape(ftape, self.dtype):
                    # Pallas plane-layout engine (TPU default for >=14
                    # qubits, complex64; see circuit/plane_scan.py)
                    return list(plane_tape_forward(ftape, make_init(), vg, cg))
                return list(fused_tape_forward(ftape, make_init(), vg, cg))
        else:
            def _run_all(vg, cg):
                densities, _ = run_tape(tape, make_init(), vg, cg, only_diff=False)
                return list(densities)

            def _run_diff(vg, cg):
                return list(tape_forward(tape, make_init(), vg, cg))

        @jax.jit
        def _simple_core(var_pairs, const_pairs):
            vg = tuple(boundary.merge_pair(p) for p in var_pairs)
            cg = tuple(boundary.merge_pair(p) for p in const_pairs)
            return [boundary.pack_complex(d) for d in _run_all(vg, cg)]

        @jax.jit
        def _autodiff_core(var_pairs, const_pairs):
            vg = tuple(boundary.merge_pair(p) for p in var_pairs)
            cg = tuple(boundary.merge_pair(p) for p in const_pairs)
            return [boundary.pack_complex(d) for d in _run_diff(vg, cg)]

        def _dispatch(core, var_gates, const_gates, only_diff):
            tape.validate(var_gates, const_gates)
            if boundary.tree_has_tracer(var_gates, const_gates):
                # inside a user's jit/grad: complex tracers are legal
                vg, cg = tuple(var_gates), tuple(const_gates)
                return _run_diff(vg, cg) if only_diff else _run_all(vg, cg)
            # eager (reference-style) call: marshal complex through real pairs
            vp = tuple(boundary.split_pair(g) for g in var_gates)
            cp = tuple(boundary.split_pair(g) for g in const_gates)
            out = core(vp, cp)
            return [boundary.unpack_to_numpy(p) for p in out]

        def simple_run(var_gates, const_gates):
            return _dispatch(_simple_core, var_gates, const_gates, only_diff=False)

        def autodiff_run(var_gates, const_gates):
            return _dispatch(_autodiff_core, var_gates, const_gates, only_diff=True)

        return simple_run, autodiff_run

    def build_state_fn(self) -> Callable:
        """Extension: ``fn(var_gates, const_gates) -> final statevector``.

        The reference exposes no way to read the evolved state; this returns
        a differentiable (standard JAX AD) pure function producing it.
        """
        tape = self.tape
        if self._initial_state is None:
            n, dtype = self.n, self.dtype
            make_init = lambda: sv.standard_state(n, dtype)
        else:
            init_np = self._initial_state
            make_init = lambda: jnp.asarray(init_np)

        @jax.jit
        def _state_core(var_pairs, const_pairs):
            vg = tuple(boundary.merge_pair(p) for p in var_pairs)
            cg = tuple(boundary.merge_pair(p) for p in const_pairs)
            _, state = run_tape(tape, make_init(), vg, cg, only_diff=True)
            return boundary.pack_complex(state)

        def state_run(var_gates, const_gates):
            tape.validate(var_gates, const_gates)
            if boundary.tree_has_tracer(var_gates, const_gates):
                _, state = run_tape(
                    tape, make_init(), tuple(var_gates), tuple(const_gates),
                    only_diff=True,
                )
                return state
            vp = tuple(boundary.split_pair(g) for g in var_gates)
            cp = tuple(boundary.split_pair(g) for g in const_gates)
            return boundary.unpack_to_numpy(_state_core(vp, cp))

        return state_run
