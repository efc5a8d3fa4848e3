"""Runtime configuration for dqc_tpu.

The reference makes precision a *compile-time* cargo feature (``f64`` →
``-DF64``; reference Cargo.toml:26-27, build.rs:19-20) so users must install
either an f32 or an f64 extension. Here dtype is a plain runtime parameter:
every public entry point takes ``dtype=`` (complex64 / complex128) and the
default is process-wide configurable.

Note: complex128 on TPU is emulated and slow; it exists for the f64 gradient
gauntlet (reference src/test_autodiff.py:165, rel. err < 1e-9) which runs on
CPU in our test suite. complex64 is the TPU production dtype.
"""

from __future__ import annotations

import jax.numpy as jnp

import jax

_DEFAULT_COMPLEX = jnp.complex64

_REAL_OF = {
    jnp.dtype("complex64"): jnp.dtype("float32"),
    jnp.dtype("complex128"): jnp.dtype("float64"),
}

# TPUs default to bfloat16 matmul inputs; a statevector sweep needs full-f32
# accumulation or amplitudes drift ~1e-4 per gate (measured on v5e). All core
# contractions use this precision; tune down only for throughput experiments.
_MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def set_matmul_precision(p) -> None:
    """Set contraction precision for gate/density/grad matmuls
    (jax.lax.Precision or the strings 'default'/'high'/'highest')."""
    global _MATMUL_PRECISION
    _MATMUL_PRECISION = p


def matmul_precision():
    return _MATMUL_PRECISION


# Gate fusion (circuit/fusion.py): compose consecutive same-group gates into
# one full-group operator so each HBM sweep applies up to 7 qubits' worth of
# gates. Semantically identical to per-gate execution; on by default.
_FUSION = True


def set_fusion(enabled: bool) -> None:
    global _FUSION
    _FUSION = bool(enabled)


def default_fusion() -> bool:
    return _FUSION


# Plane-layout Pallas engine (circuit/plane_scan.py): inside layer scans the
# complex64 state lives as two f32 planes and gate blocks execute as fused
# Pallas kernels (one HBM pass per dual-group block; one-pass blockwise
# adjoint). "auto" = on for TPU backends when the layer tape is eligible;
# True forces it everywhere (CPU runs kernels in interpret mode — slow, for
# tests); False disables.
import os as _os

_PLANE_ENGINE = _os.environ.get("DQC_PLANE_ENGINE", "auto")
if _PLANE_ENGINE not in ("auto",):
    _PLANE_ENGINE = _PLANE_ENGINE not in ("0", "false", "False")


def set_plane_engine(mode) -> None:
    """Plane-engine mode: True / False / 'auto'."""
    global _PLANE_ENGINE
    if mode not in (True, False, "auto"):
        raise ValueError("plane engine mode must be True, False or 'auto'")
    _PLANE_ENGINE = mode


def plane_engine():
    return _PLANE_ENGINE


# In-kernel matmul strategy for the plane-layout Pallas kernels
# (ops/pallas/dots.py): "f32" = Precision.HIGHEST (6 MXU passes, exact f32,
# the default — keeps the 1e-6 gradient-parity bar); "bf16x3" = manual
# 3-pass split, an opt-in throughput mode (measured 26q x 8L: 366 ms/step vs
# 461 f32 = 1.26x faster, value drift ~5e-4 and grad rel err ~2.4e-3 over 8
# layers — fine for variational optimization, not for parity tests).
_KERNEL_DOT_MODE = _os.environ.get("DQC_KERNEL_DOT", "f32")


def set_kernel_dot_mode(mode: str) -> None:
    if mode not in ("f32", "bf16x3"):
        raise ValueError("kernel dot mode must be 'f32' or 'bf16x3'")
    global _KERNEL_DOT_MODE
    _KERNEL_DOT_MODE = mode


def kernel_dot_mode() -> str:
    return _KERNEL_DOT_MODE


# Kronecker-factorized merged-top (hpair) kernels: the merged (top, top-1)
# operator is always kron(E_top, E_low); the factorized kernels run the low
# factor as Xl-wide MXU contractions and the tiny top factor on the VPU —
# ~Xt x less MXU work per element than the expanded (Xt*Xl)-wide sweep (the
# slowest kernel of the 29q/30q flagship step). Off = round-3 merged path.
_HPAIR_FACTORIZED = _os.environ.get("DQC_HPAIR_FACT", "1") != "0"


def set_hpair_factorized(enabled: bool) -> None:
    global _HPAIR_FACTORIZED
    _HPAIR_FACTORIZED = bool(enabled)


def hpair_factorized() -> bool:
    return _HPAIR_FACTORIZED


# Scan full-unroll threshold (effectively OFF by default). Full unroll was
# the round-2 workaround for the 29q lax.scan carry double-buffering OOM;
# after the memory diet (plane_std_scan_densities + merged-axis kernels +
# in-kernel seeds, BENCHMARKS.md) the scan fits, runs at the same speed
# (measured 29q x 8L: 3.599 s/step scan vs 3.587 unrolled), and compiles
# 3-5x faster — so the knob remains only for experiments.
_FULL_UNROLL_QUBITS = int(_os.environ.get("DQC_FULL_UNROLL_QUBITS", "99"))


def set_full_unroll_qubits(n: int) -> None:
    global _FULL_UNROLL_QUBITS
    _FULL_UNROLL_QUBITS = int(n)


def full_unroll_qubits() -> int:
    return _FULL_UNROLL_QUBITS


# Singular-gate diagnosis for the non-unitary uncompute (ops/inversion.py).
# "host": concrete gates raise an actionable ValueError (default);
# "debug": traced gates additionally get a lax.cond + debug.print guard;
# "off": no checks (reference parity minus the cuBLAS info report).
_SINGULARITY_CHECKS = "host"


def set_singularity_checks(mode: str) -> None:
    if mode not in ("host", "debug", "off"):
        raise ValueError("singularity checks mode must be 'host', 'debug' or 'off'")
    global _SINGULARITY_CHECKS
    _SINGULARITY_CHECKS = mode


def singularity_checks() -> str:
    return _SINGULARITY_CHECKS


def set_default_complex(dtype) -> None:
    """Set the process-wide default complex dtype (complex64 or complex128)."""
    global _DEFAULT_COMPLEX
    dtype = jnp.dtype(dtype)
    if dtype not in _REAL_OF:
        raise ValueError(f"expected complex64 or complex128, got {dtype}")
    _DEFAULT_COMPLEX = dtype


def default_complex():
    """The process-wide default complex dtype."""
    return jnp.dtype(_DEFAULT_COMPLEX)


def real_of(dtype):
    """The real dtype matching a complex dtype (c64→f32, c128→f64)."""
    return _REAL_OF[jnp.dtype(dtype)]


def canonicalize_complex(dtype):
    """Validate + normalize a complex dtype argument (None → default)."""
    if dtype is None:
        return default_complex()
    dtype = jnp.dtype(dtype)
    if dtype not in _REAL_OF:
        raise ValueError(f"expected complex64 or complex128, got {dtype}")
    return dtype


# State-plane STORAGE dtype for the Pallas plane engine (ops/planes.py,
# circuit/plane_scan.py). Compute inside kernels is always f32 in VMEM;
# this sets the dtype the (xr, xi) planes are STORED in between passes:
#   "f32"   - exact f32 storage (default; the parity-test configuration).
#   "mixed" - forward planes f32, backward/cotangent planes bf16: the value
#             stays exact-f32 while the adjoint's second statevector halves.
#             30 qubits fwd+grad fits a 16 GB chip (8 GB fwd + 4 GB bwd vs
#             2 x 8 GB for f32 — the same two-statevector floor as the
#             reference, circuit.rs:266-429); gradient error ~ bf16 rounding
#             per backward pass (measured numbers in BENCHMARKS.md).
#   "f16"   - forward planes f32, backward/cotangent planes float16: same
#             memory as "mixed" but 10 mantissa bits instead of 8 = 4x
#             lower per-store rounding (measured grad rms 7e-3 -> ~2e-3 at
#             the depth-100 structure, BENCHMARKS.md round 5). f16's narrow
#             exponent range is handled by a power-of-2 cotangent prescale
#             (plane_scan._ct_prescale; grams are linear in the cotangent,
#             so one final rescale is exact). Losses with per-element
#             cotangent seeds above ~2^4 in magnitude would overflow to
#             inf (visible, not silent) — fine for expectation-value
#             losses, the production workload.
#   "bf16"  - both state pairs stored bf16 (max headroom / HBM throughput;
#             value AND grad carry bf16 rounding).
_STATE_STORAGE = _os.environ.get("DQC_STATE_STORAGE", "f32")


def set_state_storage(mode: str) -> None:
    if mode not in ("f32", "mixed", "f16", "bf16"):
        raise ValueError(
            "state storage must be 'f32', 'mixed', 'f16' or 'bf16'")
    global _STATE_STORAGE
    _STATE_STORAGE = mode


def state_storage() -> str:
    return _STATE_STORAGE


def fwd_plane_dtype():
    """Storage dtype of the forward statevector planes."""
    return jnp.bfloat16 if _STATE_STORAGE == "bf16" else jnp.float32


def bwd_plane_dtype():
    """Storage dtype of the cotangent statevector planes. "f16" stores
    IEEE-half BIT PATTERNS in uint16 (Mosaic's dialect rejects the f16
    type itself; ops/pallas/common.f32_of / store_as are the codec)."""
    if _STATE_STORAGE == "f32":
        return jnp.float32
    if _STATE_STORAGE == "f16":
        return jnp.uint16
    return jnp.bfloat16


# Dot mode for the COTANGENT-side contractions of the backward kernels
# (cotangent transport ``b' = E^T b`` and the pair-grams). "auto": when the
# cotangent planes are stored bf16 ("mixed"/"bf16" storage), these dots run
# bf16x3 — the b operands are bf16-rounded at every store anyway, so the
# 6-pass f32-HIGHEST decomposition buys nothing there (the added dot error
# ~1e-5 sits well under the ~4e-3 per-pass storage rounding) while the
# backward kernels are MXU-bound (BENCHMARKS.md round 3). The forward-state
# UNCOMPUTE always keeps the exact dot mode: its error would compound into
# every earlier layer's gram. Override with DQC_BWD_KERNEL_DOT=f32|bf16x3.
_BWD_KERNEL_DOT_MODE = _os.environ.get("DQC_BWD_KERNEL_DOT", "auto")


def set_bwd_kernel_dot_mode(mode: str) -> None:
    if mode not in ("auto", "f32", "bf16x3"):
        raise ValueError("bwd kernel dot mode must be 'auto', 'f32' or "
                         "'bf16x3'")
    global _BWD_KERNEL_DOT_MODE
    _BWD_KERNEL_DOT_MODE = mode


def bwd_kernel_dot_mode() -> str:
    if _BWD_KERNEL_DOT_MODE == "auto":
        if _STATE_STORAGE in ("mixed", "f16", "bf16"):
            # reduced cotangent storage: bf16x3 dot error (~2^-17/dot) sits
            # well under the per-store rounding (bf16 2^-9, f16 2^-11)
            return "bf16x3"
        return kernel_dot_mode()
    return _BWD_KERNEL_DOT_MODE


# Dot mode for the PAIR-GRAM contractions alone (T0 = bwd^T fwd_in inside
# the backward kernels). Unlike the uncompute (compounds into every earlier
# layer's recomputed state) and the transport (compounds into every earlier
# layer's cotangent), each gram is a per-gate LEAF output — a 3-pass
# bf16x3 gram adds non-compounding ~2x-f32-dot noise to that one gate's
# gradient while removing 3 of the backward's 9 (dual: 6 of 18) six-pass
# dot sites. Measured (round 5): every backward kernel ~10% faster
# (tools/gram_ab.py) at depth-100 grad error rms 2.5e-6 -> 4.1e-6 vs a
# complex128 oracle (tools/gram_accuracy.py) — still at the f32 engine's
# roundoff grade, so "auto" resolves to bf16x3 ALWAYS (exact-f32 uncompute
# and transport are untouched). DQC_GRAM_KERNEL_DOT=f32 restores 6-pass
# grams.
_GRAM_KERNEL_DOT_MODE = _os.environ.get("DQC_GRAM_KERNEL_DOT", "auto")


def set_gram_kernel_dot_mode(mode: str) -> None:
    if mode not in ("auto", "f32", "bf16x3"):
        raise ValueError("gram kernel dot mode must be 'auto', 'f32' or "
                         "'bf16x3'")
    global _GRAM_KERNEL_DOT_MODE
    _GRAM_KERNEL_DOT_MODE = mode


def gram_kernel_dot_mode() -> str:
    if _GRAM_KERNEL_DOT_MODE == "auto":
        return "bf16x3"
    return _GRAM_KERNEL_DOT_MODE
