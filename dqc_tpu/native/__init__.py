"""ctypes bindings for the native tape compiler (native/dqc_planner.cpp).

The native library is optional: every entry point has a pure-Python
reference implementation (circuit/fusion.py, parallel/layout.py) and the
Python side transparently falls back when the .so is absent. When present,
:func:`fuse_tape_native` / :func:`plan_distribution_native` produce
*identical* programs (enforced by tests/test_native.py).

Build: ``make -C native`` (no dependencies beyond g++).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False
_WARNED = False

TAPE_W = 9
_KIND_CODE = {"gate": 0, "diag": 1, "density": 2}

NATIVE_MAX_K = 4  # widest gate the planner ABI row format encodes


def warn_fallback(where: str, why) -> None:
    """One warning per process when the native planner errors and the
    Python planner silently takes over — a planner bug or ABI drift must
    not degrade invisibly (the reference hard-errors instead,
    circuit.rs:209-210)."""
    global _WARNED
    if _WARNED:
        return
    _WARNED = True
    import warnings

    warnings.warn(
        f"native planner failed in {where} ({why}); using the Python "
        "planner for the rest of this process (set DQC_USE_NATIVE=0 to "
        "silence, or rebuild native/libdqc_planner.so)",
        RuntimeWarning,
        stacklevel=3,
    )


def tape_supported(tape) -> bool:
    """True when every instruction fits the planner's wire format (k <= 4);
    wider gates skip the native path without warning (expected limit)."""
    return all(inst.k <= NATIVE_MAX_K for inst in tape.instructions)


def _find_library():
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [
        os.path.join(here, "native", "libdqc_planner.so"),
        os.path.join(os.path.dirname(__file__), "libdqc_planner.so"),
    ]
    env = os.environ.get("DQC_PLANNER_LIB")
    if env:
        candidates.insert(0, env)
    for c in candidates:
        if os.path.exists(c):
            return c
    return None


def bind(path: str) -> ctypes.CDLL:
    """Load + type a planner library from an explicit path (raises on
    version/ABI mismatch). Used by load() and by the rebuild-from-source
    parity test, which compiles a fresh .so and binds it directly."""
    lib = ctypes.CDLL(path)
    lib.dqc_fuse_tape.restype = ctypes.c_int32
    lib.dqc_fuse_tape.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ]
    lib.dqc_plan_distribution.restype = ctypes.c_int32
    lib.dqc_plan_distribution.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.dqc_planner_version.restype = ctypes.c_int32
    if lib.dqc_planner_version() != 3:
        raise OSError(f"planner ABI version mismatch in {path}")
    return lib


def load() -> Optional[ctypes.CDLL]:
    """The native library, or None (cached). A library file that EXISTS but
    fails to bind (corrupt .so, ABI drift) warns once — that is an error
    condition, not a normal absence."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_library()
    if path is None:
        return None
    try:
        _LIB = bind(path)
    except OSError as e:
        warn_fallback("load", e)
        _LIB = None
    return _LIB


def available() -> bool:
    return load() is not None


def encode_tape(tape) -> np.ndarray:
    """Serialize a Tape to the planner's int32 row format."""
    from dqc_tpu.circuit.ir import InstrKind

    rows = []
    for inst in tape.instructions:
        kind = {InstrKind.GATE: 0, InstrKind.DIAG: 1, InstrKind.DENSITY: 2}[inst.kind]
        if inst.k > 4:
            raise ValueError("native planner supports gates on up to 4 qubits")
        pos = list(inst.positions) + [-1] * (4 - inst.k)
        rows.append([
            kind, int(inst.var), int(inst.unitary), int(inst.diff), inst.k, *pos,
        ])
    return np.asarray(rows, dtype=np.int32).reshape(-1, TAPE_W)


def _int_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def fuse_tape_native(tape, group_bits: int):
    """Native fusion -> FusedTape, or None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    from dqc_tpu.circuit.fusion import FBlock, FCross, FDensity, FusedTape, GateRef
    from dqc_tpu.circuit.ir import InstrKind

    enc = encode_tape(tape)
    cap = max(1024, enc.size * 16)
    out = np.zeros(cap, dtype=np.int32)
    ln = lib.dqc_fuse_tape(_int_ptr(enc), len(tape.instructions), tape.n,
                           group_bits, _int_ptr(out), cap)
    if ln < 0:
        if ln != -2:  # -2 = invalid input: the Python path raises properly
            warn_fallback("fuse_tape", f"planner error code {ln}")
        return None
    stream = out[:ln]
    instrs: List[object] = []
    i = 0
    while i < ln:
        tag = stream[i]
        if tag == 1:  # block
            group, mcount = int(stream[i + 1]), int(stream[i + 2])
            i += 3
            gates = []
            for _ in range(mcount):
                var, qidx, diag, unit, kk = (int(x) for x in stream[i:i + 5])
                rels = tuple(int(x) for x in stream[i + 5:i + 5 + kk])
                gates.append(GateRef(bool(var), qidx, rels, bool(diag), bool(unit)))
                i += 9
            instrs.append(FBlock(group, tuple(gates)))
        elif tag == 2:  # cross (any k): [2, k, p0..p3, var, unitary, qidx, diag]
            kk = int(stream[i + 1])
            pos = tuple(int(x) for x in stream[i + 2:i + 2 + kk])
            var, unit, qidx, diag = (int(x) for x in stream[i + 6:i + 10])
            instrs.append(FCross(pos, bool(var), bool(unit), qidx, bool(diag)))
            i += 10
        elif tag == 3:  # density
            diff, kk = int(stream[i + 1]), int(stream[i + 2])
            pos = tuple(int(x) for x in stream[i + 3:i + 3 + kk])
            instrs.append(FDensity(pos, bool(diff)))
            i += 7
        else:
            warn_fallback("fuse_tape", f"unknown stream tag {tag}")
            return None

    var_shapes = []
    nv = nc = 0
    for inst in tape.instructions:
        if inst.is_gate:
            if inst.var:
                nv += 1
                var_shapes.append(
                    ("diag" if inst.kind is InstrKind.DIAG else "dense", inst.k)
                )
            else:
                nc += 1
    return FusedTape(
        n=tape.n, instructions=tuple(instrs),
        num_var_gates=nv, num_const_gates=nc, var_shapes=tuple(var_shapes),
    )


def plan_distribution_native(tape, k: int):
    """Native distributed plan -> DistProgram, or None if unavailable."""
    lib = load()
    if lib is None:
        return None
    from dqc_tpu.parallel.layout import DApply, DDensity, DistProgram, DSwap
    from dqc_tpu.circuit.ir import InstrKind

    enc = encode_tape(tape)
    cap = max(1024, enc.size * 16)
    out = np.zeros(cap, dtype=np.int32)
    final_phys = np.zeros(tape.n, dtype=np.int32)
    ln = lib.dqc_plan_distribution(_int_ptr(enc), len(tape.instructions), tape.n,
                                   k, _int_ptr(out), cap, _int_ptr(final_phys))
    if ln < 0:
        if ln != -2:  # -2 = invalid input: the Python path raises properly
            warn_fallback("plan_distribution", f"planner error code {ln}")
        return None
    stream = out[:ln]
    instrs: List[object] = []
    diff_flags: List[bool] = []
    nv = nc = nd = 0
    i = 0
    kinds = {0: InstrKind.GATE, 1: InstrKind.DIAG}
    while i < ln:
        tag = stream[i]
        if tag == 1:  # apply
            kind, var, unit, qidx, kk = (int(x) for x in stream[i + 1:i + 6])
            pos = tuple(int(x) for x in stream[i + 6:i + 6 + kk])
            instrs.append(DApply(kinds[kind], pos, bool(var), bool(unit), qidx))
            if var:
                nv += 1
            else:
                nc += 1
            i += 10
        elif tag == 2:  # swap
            ks = int(stream[i + 1])
            slots = tuple(int(x) for x in stream[i + 2:i + 2 + ks])
            instrs.append(DSwap(slots))
            i += 2 + ks
        elif tag == 3:  # density
            diff, didx, kk = (int(x) for x in stream[i + 1:i + 4])
            pos = tuple(int(x) for x in stream[i + 4:i + 4 + kk])
            instrs.append(DDensity(pos, bool(diff), didx))
            diff_flags.append(bool(diff))
            nd += 1
            i += 8
        else:
            warn_fallback("plan_distribution", f"unknown stream tag {tag}")
            return None
    return DistProgram(
        n=tape.n, k=k, instructions=tuple(instrs),
        num_var_gates=nv, num_const_gates=nc, num_densities=nd,
        diff_flags=tuple(diff_flags), final_phys=tuple(int(x) for x in final_phys),
    )


def try_fuse_tape(tape, group_bits: int):
    """fuse_tape_native with the fallback policy applied: None (silently)
    when the library is absent or the tape uses gates wider than the wire
    format; None WITH a once-per-process warning on a genuine planner
    error (the Python planner then takes over)."""
    if not tape_supported(tape) or load() is None:
        return None
    try:
        return fuse_tape_native(tape, group_bits)
    except Exception as e:  # ctypes faults, decode bugs: warn, fall back
        warn_fallback("fuse_tape", e)
        return None


def try_plan_distribution(tape, k: int):
    """plan_distribution_native with the same fallback policy as
    :func:`try_fuse_tape`."""
    if not tape_supported(tape) or load() is None:
        return None
    try:
        return plan_distribution_native(tape, k)
    except Exception as e:
        warn_fallback("plan_distribution", e)
        return None
