"""Pallas Poseidon2 sponge kernel — field-native Merkle layers in VMEM.

The lane-layout XLA path (OPT-0009) still writes the width-16 state back to
HBM between rounds when XLA's fusion gives up; this kernel is the Poseidon2
twin of ``pallas_keccak.py`` (OPT-0013): one ``pallas_call`` absorbs rate-8
chunks and runs ALL rounds of every permutation inside a VMEM scratch, so a
leaf hash touches HBM once for the input block and once for the 8-element
digest.  The TPU analog of the reference's fused shader keeping its tile in
workgroup memory (``/root/reference/native/shaders/fft_stage_fused.wgsl``).

Layout: the caller transposes the (N, k) Monty row matrix to ``(k_pad, N)``
so each field column is a contiguous (sublane, lane) tile; the leaf axis
fills the VPU exactly as the reference fills SIMD lanes across Merkle leaves
(fib_air.rs:41-42).  Grid = (batch blocks, rate chunks); the (16, R, 128)
state scratch persists across the sequential chunk steps, so arbitrarily
wide rows stream through a fixed VMEM budget.

Semantics are exactly ``poseidon2_mmcs.hash_rows_batched`` (PaddingFreeSponge
<Poseidon2_16, 16, 8, 8>: overwrite-absorb, permute per chunk including the
final partial one) and ``compress_batched`` (TruncatedPermutation: one
full-width absorb + permute = the sponge with rate 16, one chunk).  Data
stays in the Monty domain end to end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import babybear as bb
from . import poseidon2

WIDTH = 16
RATE = 8
OUT = 8
_LANES = 128
def _vmem_in_budget() -> int:
    """Per-input-block VMEM budget (double-buffered), from the device policy
    (backend/policy.py): ~VMEM/8, 2 MiB on 16 MiB cores."""
    from ..backend.policy import current_policy

    return current_policy().sponge_vmem_in_budget


def _permute_lanes(lanes, n_ext: int, n_int: int):
    """Unrolled Poseidon2 over 16 (R, 128) Monty lane arrays with host
    constants.  ``n_ext``/``n_int`` < full round counts exist only for the
    interpret-mode CI tests (see pallas_keccak.py rationale — the round
    functions themselves are pinned by tests/test_poseidon2.py)."""
    ext_rc, int_rc, _diag = poseidon2._consts_monty(WIDTH)
    mulers = poseidon2._diag_mulers(WIDTH)
    half = n_ext // 2
    lanes = poseidon2._external_mds_lanes(list(lanes))
    for r in range(half):
        lanes = poseidon2._ext_round_lanes(lanes, ext_rc[r])
    for r in range(n_int):
        lanes = poseidon2._int_round_lanes(lanes, int_rc[r], mulers)
    for r in range(half, n_ext):
        lanes = poseidon2._ext_round_lanes(lanes, ext_rc[r])
    return lanes


def _sponge_kernel(x_ref, o_ref, st_ref, *, rate: int, n_items: int,
                   n_ext: int, n_int: int):
    """Grid (batch blocks, chunks).  x_ref: (rate, R, 128) Monty block of the
    transposed input; o_ref: (8, R, 128) digest block; st_ref: (16, R, 128)
    VMEM state scratch persisting across the chunk axis."""
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        st_ref[...] = jnp.zeros_like(st_ref)

    lanes = [st_ref[i] for i in range(WIDTH)]

    # overwrite-absorb: column i of this chunk exists iff rate*c + i < n_items
    # (c is a traced program id, so the mask is a traced select)
    base = c * rate
    for i in range(rate):
        exists = base + i < n_items
        lanes[i] = jnp.where(exists, x_ref[i], lanes[i])

    lanes = _permute_lanes(lanes, n_ext, n_int)

    for i in range(WIDTH):
        st_ref[i] = lanes[i]

    @pl.when(c == n_chunks - 1)
    def _():
        for i in range(OUT):
            o_ref[i] = lanes[i]


def _batch_rows(n_rows: int) -> int:
    """Sublane rows R per batch block (same policy as pallas_keccak)."""
    per_row = RATE * _LANES * 4
    r = max(1, min(32, _vmem_in_budget() // per_row))
    return min(r, max(1, n_rows // _LANES))


def supports(n_rows: int, k_cols: int) -> bool:
    """Kernel preconditions: batch divisible into (R, 128) tiles, >=1 col."""
    r = _batch_rows(n_rows)
    block = r * _LANES
    return k_cols >= 1 and n_rows >= block and n_rows % block == 0


@functools.lru_cache(maxsize=None)
def _sponge_call(k_pad: int, n_tiles: int, *, rate: int, n_items: int, r: int,
                 interpret: bool, n_ext: int, n_int: int):
    """Shape-keyed compiled sponge (per-shape plan cache; interpret mode
    stays un-jitted — see pallas_keccak._sponge_call)."""
    n_chunks = k_pad // rate
    block = r * _LANES

    def run(x):
        return pl.pallas_call(
            functools.partial(_sponge_kernel, rate=rate, n_items=n_items,
                              n_ext=n_ext, n_int=n_int),
            grid=(n_tiles * _LANES // block, n_chunks),
            in_specs=[
                pl.BlockSpec(
                    (rate, r, _LANES),
                    lambda j, c: (c, j, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (OUT, r, _LANES), lambda j, c: (0, j, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((OUT, n_tiles, _LANES), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((WIDTH, r, _LANES), jnp.uint32)],
            interpret=interpret,
        )(x)

    return run if interpret else jax.jit(run)


def hash_rows_transposed(mat_t: jnp.ndarray, n_items: int, *, rate: int = RATE,
                         interpret: bool = False, n_ext: int = poseidon2.ROUNDS_F,
                         n_int: int | None = None) -> jnp.ndarray:
    """Core entry: ``mat_t`` is (k_pad, N) Monty with k_pad a multiple of
    ``rate`` (zero-padded); absorbs ``n_items`` field columns per leaf.
    Returns (8, N) Monty digests."""
    if n_int is None:
        n_int = poseidon2.rounds_p(WIDTH)
    k_pad, n = mat_t.shape
    assert k_pad % rate == 0, "columns must be padded to a rate multiple"
    r = _batch_rows(n)
    block = r * _LANES
    assert n % block == 0, (n, block)
    x = mat_t.reshape(k_pad, n // _LANES, _LANES)
    call = _sponge_call(
        k_pad, n // _LANES, rate=rate, n_items=n_items, r=r,
        interpret=interpret, n_ext=n_ext, n_int=n_int,
    )
    return call(x)  # (8, n_tiles, 128)


def _absorb_kernel(st_in_ref, x_ref, o_ref, st_ref, *, rate: int,
                   n_items: int, n_ext: int, n_int: int, first: bool):
    """Carry-state sponge absorb: like ``_sponge_kernel`` but the state
    arrives from / returns to HBM, so a row absorb can span many
    ``pallas_call``s — the streaming wide-trace commit (prover/wide.py)
    absorbs a 30 GB LDE in recomputed column chunks that never coexist."""
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        if first:
            st_ref[...] = jnp.zeros_like(st_ref)
        else:
            st_ref[...] = st_in_ref[...]

    lanes = [st_ref[i] for i in range(WIDTH)]
    base = c * rate
    for i in range(rate):
        exists = base + i < n_items
        lanes[i] = jnp.where(exists, x_ref[i], lanes[i])
    lanes = _permute_lanes(lanes, n_ext, n_int)
    for i in range(WIDTH):
        st_ref[i] = lanes[i]

    @pl.when(c == n_chunks - 1)
    def _():
        for i in range(WIDTH):
            o_ref[i] = lanes[i]


@functools.lru_cache(maxsize=None)
def _absorb_call(k_pad: int, n_tiles: int, *, rate: int, n_items: int, r: int,
                 interpret: bool, n_ext: int, n_int: int, first: bool):
    n_chunks = k_pad // rate
    block = r * _LANES

    def run(state, x):
        return pl.pallas_call(
            functools.partial(_absorb_kernel, rate=rate, n_items=n_items,
                              n_ext=n_ext, n_int=n_int, first=first),
            grid=(n_tiles * _LANES // block, n_chunks),
            in_specs=[
                pl.BlockSpec(
                    (WIDTH, r, _LANES), lambda j, c: (0, j, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (rate, r, _LANES), lambda j, c: (c, j, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (WIDTH, r, _LANES), lambda j, c: (0, j, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((WIDTH, n_tiles, _LANES), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((WIDTH, r, _LANES), jnp.uint32)],
            input_output_aliases={0: 0},  # state buffer reused in place
            interpret=interpret,
        )(state, x)

    return run if interpret else jax.jit(run)


def absorb_rows_transposed(state_t: jnp.ndarray, mat_t: jnp.ndarray,
                           n_items: int, *, first: bool = False,
                           interpret: bool = False,
                           n_ext: int = poseidon2.ROUNDS_F,
                           n_int: int | None = None) -> jnp.ndarray:
    """Continue (or start, ``first=True``) a PaddingFreeSponge absorb.
    state_t: (16, N) Monty; mat_t: (k_pad, N) Monty, k_pad a rate multiple,
    first ``n_items`` columns real.  Returns the new (16, N) state."""
    if n_int is None:
        n_int = poseidon2.rounds_p(WIDTH)
    k_pad, n = mat_t.shape
    assert k_pad % RATE == 0 and state_t.shape == (WIDTH, n)
    r = _batch_rows(n)
    block = r * _LANES
    assert n % block == 0, (n, block)
    call = _absorb_call(k_pad, n // _LANES, rate=RATE, n_items=n_items, r=r,
                        interpret=interpret, n_ext=n_ext, n_int=n_int,
                        first=first)
    out = call(
        state_t.reshape(WIDTH, n // _LANES, _LANES),
        mat_t.reshape(k_pad, n // _LANES, _LANES),
    )
    return out.reshape(WIDTH, n)


def _pad_transpose(mat_monty: jnp.ndarray, rate: int = RATE):
    n, k = mat_monty.shape
    k_pad = -(-max(k, 1) // rate) * rate
    mat_t = mat_monty.T
    if k_pad > k:
        mat_t = jnp.concatenate(
            [mat_t, jnp.zeros((k_pad - k, n), dtype=jnp.uint32)], axis=0
        )
    return mat_t, k


def hash_rows(mat_monty: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ``poseidon2_mmcs.hash_rows_batched``: (N, k) Monty rows ->
    (N, 8) Monty digests."""
    n = mat_monty.shape[0]
    mat_t, k = _pad_transpose(mat_monty)
    out = hash_rows_transposed(mat_t, n_items=k, interpret=interpret)
    return out.reshape(OUT, n).T


def compress(left: jnp.ndarray, right: jnp.ndarray,
             *, interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ``poseidon2_mmcs.compress_batched``: two (N, 8) Monty
    digest arrays -> (N, 8).  TruncatedPermutation = the sponge with one
    full-width (rate-16) chunk."""
    n = left.shape[0]
    state_t = jnp.concatenate([left.T, right.T], axis=0)  # (16, N)
    out = hash_rows_transposed(state_t, n_items=WIDTH, rate=WIDTH,
                               interpret=interpret)
    return out.reshape(OUT, n).T
