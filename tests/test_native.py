"""Native planner parity: the C++ tape compiler must produce byte-identical
programs to the Python reference implementations."""

import os
import subprocess
import sys

import numpy as np
import pytest

from dqc_tpu import native
from dqc_tpu.circuit.fusion import _fuse_tape_py as fuse_tape
from dqc_tpu.ops.groups import GROUP_BITS
from dqc_tpu.parallel.layout import _plan_distribution_py as plan_distribution

from test_autodiff import build_gauntlet
from test_sharded import build_mixed_circuit


needs_native = pytest.mark.skipif(
    not native.available(), reason="native planner not built (make -C native)"
)


@needs_native
def test_fusion_parity_gauntlet():
    tape = build_gauntlet(9, 2).tape
    want = fuse_tape(tape)
    got = native.fuse_tape_native(tape, GROUP_BITS)
    assert got is not None
    assert got == want


@needs_native
def test_fusion_parity_mixed():
    c, _, _ = build_mixed_circuit(10)
    want = fuse_tape(c.tape)
    got = native.fuse_tape_native(c.tape, GROUP_BITS)
    assert got == want


@needs_native
def test_distribution_parity():
    for n, k, seed in [(8, 3, 0), (10, 2, 1), (10, 3, 2), (9, 1, 3)]:
        c, _, _ = build_mixed_circuit(n, seed=seed)
        want = plan_distribution(c.tape, k)
        got = native.plan_distribution_native(c.tape, k)
        assert got == want, f"n={n} k={k}"


@needs_native
def test_distribution_error_cases():
    c, _, _ = build_mixed_circuit(4)
    # 8 devices on 4 qubits: device block cannot fit locally
    assert native.plan_distribution_native(c.tape, 3) is None


def test_native_build_from_source(tmp_path, monkeypatch):
    """A fresh compile of dqc_planner.cpp must match the Python planner —
    a stale checked-in .so cannot mask source drift."""
    import shutil

    repo = __file__.rsplit("/tests/", 1)[0]
    cxx = shutil.which("g++") or shutil.which("c++")
    if cxx is None:
        pytest.skip("no C++ compiler on PATH")
    so = tmp_path / "libdqc_planner_fresh.so"
    r = subprocess.run(
        [cxx, "-O2", "-std=c++17", "-fPIC", "-Wall", "-shared",
         "-o", str(so), f"{repo}/native/dqc_planner.cpp"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    fresh = native.bind(str(so))

    # route the module-level cache through the fresh library and check parity
    monkeypatch.setattr(native, "_LIB", fresh)
    monkeypatch.setattr(native, "_TRIED", True)
    tape = build_gauntlet(9, 2).tape
    assert native.fuse_tape_native(tape, GROUP_BITS) == fuse_tape(tape)
    c, _, _ = build_mixed_circuit(10)
    assert (native.plan_distribution_native(c.tape, 3)
            == plan_distribution(c.tape, 3))


def test_native_unit_tests_build_and_pass(tmp_path):
    """The C++ planner's own test binary (native/test_planner.cpp) compiles
    from source and passes."""
    import shutil

    repo = __file__.rsplit("/tests/", 1)[0]
    cxx = shutil.which("g++") or shutil.which("c++")
    if cxx is None:
        pytest.skip("no C++ compiler on PATH")
    exe = tmp_path / "test_planner"
    r = subprocess.run(
        [cxx, "-O2", "-std=c++17", "-o", str(exe),
         f"{repo}/native/test_planner.cpp", f"{repo}/native/dqc_planner.cpp"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run([str(exe)], capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr


def test_corrupt_library_warns_and_falls_back(tmp_path):
    """A library file that exists but cannot bind (corrupted .so) must warn
    ONCE and fall back to the Python planner — never degrade silently
    (VERDICT round-2: fusion.py's old blanket except swallowed planner
    errors)."""
    bad = tmp_path / "libdqc_planner.so"
    bad.write_bytes(b"\x7fELF not really a library")
    code = (
        "import warnings, os\n"
        "from dqc_tpu.circuit.builder import AutoGradCircuit\n"
        "from dqc_tpu.circuit.fusion import fuse_tape, _fuse_tape_py\n"
        "c = AutoGradCircuit(4)\n"
        "c.add_q1_var_gate(0); c.add_q2_const_gate(1, 2)\n"
        "c.get_q1_dens_op_with_grad(0)\n"
        "with warnings.catch_warnings(record=True) as rec:\n"
        "    warnings.simplefilter('always')\n"
        "    out = fuse_tape(c.tape)\n"
        "    out2 = fuse_tape(c.tape)\n"
        "msgs = [str(w.message) for w in rec\n"
        "        if issubclass(w.category, RuntimeWarning)\n"
        "        and 'native planner' in str(w.message)]\n"
        "assert len(msgs) == 1, msgs  # once per process, not per call\n"
        "assert out == _fuse_tape_py(c.tape)\n"
        "assert out2 == out\n"
        "print('OK')\n"
    )
    env = dict(os.environ, DQC_PLANNER_LIB=str(bad), JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "OK" in r.stdout


def test_wide_gate_skips_native_silently():
    """Gates wider than the planner wire format (k > 4) must skip the native
    path with NO warning (an expected limit, not an error) and compile
    through the Python planner."""
    import warnings

    from dqc_tpu.circuit.builder import AutoGradCircuit
    from dqc_tpu.circuit.fusion import _fuse_tape_py, fuse_tape

    c = AutoGradCircuit(7)
    c.add_gate((0, 1, 2, 3, 4), var=False)  # 5-qubit gate: k > NATIVE_MAX_K
    c.get_q1_dens_op_with_grad(0)
    assert not native.tape_supported(c.tape)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = fuse_tape(c.tape)
    assert out == _fuse_tape_py(c.tape)
    assert not [w for w in rec if "native planner" in str(w.message)]
