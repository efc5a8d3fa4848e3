"""Watchdog-bounded segmented execution of the scanned plane engine.

Serving-class TPU backends bound single device executions (the axon
backend kills any execution past ~60-80 s). One fwd+grad step of a 30q
depth-100 circuit is an ~80 s device program: it fits HBM under mixed
state storage but can never run as ONE jit call on such a backend. This
module splits the O(1)-memory adjoint step into a host-driven sequence
of bounded jit calls — forward layer chunks, a density + seed epilogue,
reverse layer chunks — carrying the plane pairs between calls as
device-resident ``jax.Array``s (real pairs, so nothing trips the
complex64 host-boundary restriction).

Chunk boundaries are pure scan splits: the same plane program, the same
kernels, the same order as :func:`plane_scan.plane_std_scan_densities`,
so values and gradients match the single-call engine to f32 roundoff
(bit-exact when XLA fuses identically; pinned by
tests/test_segmented.py). The const-trailing-diag scan rotation is
applied at the OUTER level — head once, rotated body chunks, the run
once — exactly mirroring ``_scan_layers_forward``.

The reference has no analog: its per-gate CUDA kernel launches are
already micro-bounded (reference primitives.cu:513-620 — one launch per
gate); it is the TPU's fused megastep that needs explicit segmentation.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from dqc_tpu import config
from dqc_tpu.circuit.fusion import FusedTape
from dqc_tpu.circuit import plane_scan as ps
from dqc_tpu.ops import planes as pl
from dqc_tpu.utils import boundary


# ---------------------------------------------------------------------------
# Host<->device marshalling for the segmented driver.
#
# Serving TPU backends cannot move complex64 across the host boundary (jit
# args or fetches raise UNIMPLEMENTED — utils/boundary.py) and, measured on
# the axon backend, one such attempt POISONS the PJRT client: every later
# dispatch fails too. The single-call engine never trips this (one jit, all
# complex constants embedded in the program), but the segmented driver hands
# arrays between many jit calls, so every complex input must be lifted to a
# device-resident array first (real-pair split on host, ``lax.complex``
# inside a tiny cached jit), and every host-side stage that touches complex
# math — the loss epilogue, the gate-parameterization vjp — must itself run
# jitted, never eagerly (an eager op with a complex constant is a complex
# host->device transfer of that constant).
# ---------------------------------------------------------------------------

_merge_pair_jit = jax.jit(boundary.merge_pair)


def _lift_arrays(arrs) -> Tuple[jax.Array, ...]:
    """Host arrays -> device arrays without a complex host->device
    transfer; device-resident arrays pass through untouched."""
    out = []
    for g in arrs:
        if isinstance(g, jax.Array):
            out.append(g)
        elif jnp.iscomplexobj(g):
            out.append(_merge_pair_jit(boundary.split_pair(g)))
        else:
            out.append(jnp.asarray(g))
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _loss_cts_fn(loss_from_densities):
    """value + density cotangents in ONE jitted call (the observable
    matrices inside the loss are complex constants — legal only embedded
    in a compiled program). Cached on the loss function object: callers
    must pass a stable function (e.g. a per-model-instance closure) or
    they pay a recompile per call."""

    @jax.jit
    def f(densities):
        value, vjp = jax.vjp(loss_from_densities, densities)
        (density_cts,) = vjp(jnp.ones_like(value))
        return value, density_cts

    return f


def chunk_sizes(layers: int, max_chunk: int) -> List[int]:
    """Split ``layers`` into at most two distinct chunk lengths (so the
    per-chunk jit compiles at most twice), each <= max_chunk."""
    if layers <= 0:
        return []
    n_chunks = -(-layers // max_chunk)  # ceil
    base = layers // n_chunks
    extra = layers % n_chunks
    return [base + 1] * extra + [base] * (n_chunks - extra)


def _slice_stacked(stacked, start: int, length: int):
    return tuple(g[start:start + length] for g in stacked)


def _cfg_key():
    """Trace-affecting runtime config, included in every jitted-piece cache
    key: the pieces read config at TRACE time (plane dtypes, kernel dot
    modes, hpair factorization), so flipping config between steps must miss
    the cache — without this a storage-mode switch silently reused the
    previous mode's compiled programs (caught by tools/mixed_seg_accuracy)."""
    return (config.state_storage(), config.kernel_dot_mode(),
            config.bwd_kernel_dot_mode(), config.gram_kernel_dot_mode(),
            config.hpair_factorized(),
            str(config.matmul_precision()), config.plane_engine())


# ---------------------------------------------------------------------------
# Jitted pieces, cached per (ftape hash, program variant) so repeated steps
# and repeated chunks of the same length reuse compilations.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _fwd_chunk_fn(ftape: FusedTape, rotated: bool, ck=None):
    program = ps.plane_program(ftape)
    if rotated:
        rot = ps._rotatable_const_diag(program, ftape)
        assert rot is not None
        _, program, _ = rot
    n = ftape.n

    # donate the carried planes: without donation a chunk call holds input
    # AND output pairs live (2 x 8 GB at 30q — over HBM); the in-call
    # kernels alias anyway
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def f(xr, xi, seg_gates, const_gates):
        def body(carry, layer_gates):
            cr, ci = carry
            cr, ci = ps._apply_forward(cr, ci, program, ftape, layer_gates,
                                       const_gates)
            return (cr, ci), None

        (xr2, xi2), _ = jax.lax.scan(body, (xr, xi), seg_gates,
                                     unroll=ps._scan_unroll(n, seg_gates))
        return xr2, xi2

    return f


@functools.lru_cache(maxsize=None)
def _bwd_chunk_fn(ftape: FusedTape, rotated: bool, ck=None):
    program = ps.plane_program(ftape)
    if rotated:
        rot = ps._rotatable_const_diag(program, ftape)
        assert rot is not None
        _, program, _ = rot
    n = ftape.n

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def f(fxr, fxi, bxr, bxi, seg_gates, const_gates):
        def body(carry, layer_gates):
            cfr, cfi, cbr, cbi = carry
            var_cts: Dict[int, jax.Array] = {}
            cfr, cfi, cbr, cbi = ps._backward_program(
                cfr, cfi, cbr, cbi, program, ftape, layer_gates, const_gates,
                var_cts)
            layer_cts = tuple(
                ps._match_ct(var_cts[q], layer_gates[q])
                for q in range(len(layer_gates)))
            return (cfr, cfi, cbr, cbi), layer_cts

        return jax.lax.scan(body, (fxr, fxi, bxr, bxi), seg_gates,
                            reverse=True,
                            unroll=ps._scan_unroll(n, seg_gates))

    return f


@functools.lru_cache(maxsize=None)
def _head_fn(ftape: FusedTape, rotated: bool, ck=None):
    """Initial |0..0> planes; under rotation, also the first layer's
    pre-rotation program (all but its trailing const diag run)."""
    program = ps.plane_program(ftape)
    head: Tuple = ()
    if rotated:
        rot = ps._rotatable_const_diag(program, ftape)
        assert rot is not None
        head, _, _ = rot
    n = ftape.n

    @jax.jit
    def f(first_gates, const_gates):
        xr, xi = pl.standard_planes(n, config.fwd_plane_dtype())
        if head:
            xr, xi = ps._apply_forward(xr, xi, head, ftape, first_gates,
                                       const_gates)
        return xr, xi

    return f


@functools.lru_cache(maxsize=None)
def _tail_fn(ftape: FusedTape, ck=None):
    """The rotation's trailing const diag run, applied once after the body."""
    program = ps.plane_program(ftape)
    rot = ps._rotatable_const_diag(program, ftape)
    assert rot is not None
    _, _, diag_item = rot

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def f(xr, xi, first_gates, const_gates):
        return ps._apply_forward(xr, xi, (diag_item,), ftape, first_gates,
                                 const_gates)

    return f


@functools.lru_cache(maxsize=None)
def _epilogue_fn(epi_ftape: FusedTape, ck=None):
    n = epi_ftape.n

    @jax.jit
    def f(xr, xi):
        return ps._epilogue_density_list(epi_ftape, xr, xi, n)

    return f


@functools.lru_cache(maxsize=None)
def _seed_fn(ftape: FusedTape, epi_ftape: FusedTape, rotated: bool, ck=None):
    """Density-cotangent seeds ``(L + L^H) conj(psi)`` -> initial cotangent
    planes; under rotation, also uncomputes the trailing const diag run
    (the first backward item) so the chunks see rotated-body state."""
    n = ftape.n
    diag_item = None
    if rotated:
        rot = ps._rotatable_const_diag(ps.plane_program(ftape), ftape)
        assert rot is not None
        _, _, diag_item = rot

    # fwd planes donated (they return, possibly rotated-back); the epilogue
    # call has already read them un-donated
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def f(fxr, fxi, density_cts, first_gates, const_gates):
        pending = ps._collect_seed_pending(epi_ftape, density_cts, n)
        bxr, bxi = ps._seed_apply(fxr, fxi, pending, n, ps._interpret())
        if diag_item is not None:
            no_cts: Dict[int, jax.Array] = {}
            fxr2, fxi2, bxr, bxi = ps._backward_program(
                fxr, fxi, bxr, bxi, (diag_item,), ftape, first_gates,
                const_gates, no_cts)
            return fxr2, fxi2, bxr, bxi
        return fxr, fxi, bxr, bxi

    return f


@functools.lru_cache(maxsize=None)
def _bwd_head_fn(ftape: FusedTape, ck=None):
    """Backward of the rotation head (the first layer minus its trailing
    diag run), producing the first layer's cotangents."""
    program = ps.plane_program(ftape)
    rot = ps._rotatable_const_diag(program, ftape)
    assert rot is not None
    head, _, _ = rot

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def f(fxr, fxi, bxr, bxi, first_gates, const_gates):
        var_cts: Dict[int, jax.Array] = {}
        fxr, fxi, bxr, bxi = ps._backward_program(
            fxr, fxi, bxr, bxi, head, ftape, first_gates, const_gates,
            var_cts)
        first_cts = tuple(ps._match_ct(var_cts[q], first_gates[q])
                          for q in range(len(first_gates)))
        return (fxr, fxi, bxr, bxi), first_cts

    return f


# ---------------------------------------------------------------------------
# The host-driven segmented step
# ---------------------------------------------------------------------------

def segmented_scan_value_and_grad(ftape: FusedTape, epi_ftape: FusedTape,
                                  stacked_var_gates, const_gates,
                                  loss_from_densities, *,
                                  max_chunk: int = 32):
    """``value_and_grad`` of ``loss_from_densities(densities)`` over L
    scanned layers of ``ftape`` from |0..0>, executed as bounded device
    calls of at most ``max_chunk`` layers each.

    Returns ``(value, stacked_cts)`` with ``stacked_cts`` matching
    ``stacked_var_gates``'s structure. Same contract as differentiating
    :func:`plane_scan.plane_std_scan_densities` wrt the var gates; requires
    plane-engine eligibility (caller checks ``use_plane_engine``).
    """
    stacked_var_gates = _lift_arrays(stacked_var_gates)
    const_gates = _lift_arrays(const_gates)
    L = ps._num_layers(stacked_var_gates)
    program = ps.plane_program(ftape)
    rotated = (ps._rotatable_const_diag(program, ftape) is not None
               and L >= 2)

    if rotated:
        first = tuple(g[0] for g in stacked_var_gates)
        body_gates = tuple(g[1:] for g in stacked_var_gates)
        body_L = L - 1
    else:
        first = tuple(g[0] for g in stacked_var_gates)  # only planes init
        body_gates = stacked_var_gates
        body_L = L

    sizes = chunk_sizes(body_L, max_chunk)

    # ---- forward: head, body chunks, (rotation tail) ----
    xr, xi = _head_fn(ftape, rotated, _cfg_key())(first, const_gates)
    fwd = _fwd_chunk_fn(ftape, rotated, _cfg_key())
    off = 0
    for c in sizes:
        xr, xi = fwd(xr, xi, _slice_stacked(body_gates, off, c), const_gates)
        off += c
    if rotated:
        xr, xi = _tail_fn(ftape, _cfg_key())(xr, xi, first, const_gates)

    # ---- epilogue: densities -> value + density cotangents (tiny) ----
    densities = _epilogue_fn(epi_ftape, _cfg_key())(xr, xi)
    value, density_cts = _loss_cts_fn(loss_from_densities)(densities)

    # ---- seeds (+ rotation-tail uncompute) ----
    fxr, fxi, bxr, bxi = _seed_fn(ftape, epi_ftape, rotated, _cfg_key())(
        xr, xi, density_cts, first, const_gates)

    # ---- backward: body chunks in reverse, then the rotation head ----
    bwd = _bwd_chunk_fn(ftape, rotated, _cfg_key())
    cts_chunks: List[Tuple[jax.Array, ...]] = []
    for c in reversed(sizes):
        off -= c
        (fxr, fxi, bxr, bxi), seg_cts = bwd(
            fxr, fxi, bxr, bxi, _slice_stacked(body_gates, off, c),
            const_gates)
        cts_chunks.append(seg_cts)
    cts_chunks.reverse()

    if cts_chunks:
        stacked_cts = tuple(
            jnp.concatenate([ch[q] for ch in cts_chunks], axis=0)
            for q in range(len(stacked_var_gates)))
    else:
        stacked_cts = tuple(g[:0] for g in stacked_var_gates)

    if rotated:
        _, first_cts = _bwd_head_fn(ftape, _cfg_key())(fxr, fxi, bxr, bxi, first,
                                                       const_gates)
        stacked_cts = tuple(
            jnp.concatenate([c0[None], cs], axis=0)
            for c0, cs in zip(first_cts, stacked_cts))

    return value, stacked_cts


def segmented_cache_clear():
    """Drop the jitted-piece caches (used by tests that flip config)."""
    for f in (_fwd_chunk_fn, _bwd_chunk_fn, _head_fn, _tail_fn,
              _epilogue_fn, _seed_fn, _bwd_head_fn, _loss_cts_fn):
        f.cache_clear()
