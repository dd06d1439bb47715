"""Pallas Keccak sponge kernel — Merkle-layer hashing at HBM speed-of-light.

The XLA lane-layout path (``keccak.py``, OPT-0008) runs the 24 rounds as a
``lax.scan``: every round reads and writes the full 200-byte state per leaf
from HBM (~9.6 KB of traffic per permutation).  This kernel is the TPU analog
of the reference's *fused* shader (``/root/reference/native/shaders/
fft_stage_fused.wgsl`` keeps a tile resident in workgroup memory across
stages): one ``pallas_call`` absorbs the input rows and runs all 24 rounds of
every permutation inside VMEM, touching HBM once for the input block and once
for the 32-byte digest — the permutation becomes VPU-compute-bound instead of
HBM-bound.

Layout: the caller transposes the (N, k) canonical-u32 row matrix to
``(n_chunks*34, N/128, 128)`` so each u32 column is a contiguous
(sublane, lane) tile; the batch (leaf) axis fills the VPU exactly as the
reference fills SIMD lanes across Merkle leaves (fib_air.rs:41-42).  The grid
is (batch blocks, rate chunks); sponge state lives in a VMEM scratch that
persists across the sequential chunk steps, so arbitrarily wide rows (the
3608-column keccak-air trace) stream through a fixed VMEM budget.

Semantics are exactly ``sponge.hash_field_rows_batched``: PaddingFreeSponge
<KeccakF, 25, 17, 4> with overwrite-absorb of little-endian u32 pairs and a
permutation after every rate chunk (including the final partial one).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import keccak

RATE = 17
RATE_U32 = 2 * RATE  # 34 u32 columns per rate chunk
_LANES = 128
def _vmem_in_budget() -> int:
    """Per-input-block VMEM budget (double-buffered by pallas), from the
    device policy (backend/policy.py): ~VMEM/8, 2 MiB on 16 MiB cores."""
    from ..backend.policy import current_policy

    return current_policy().sponge_vmem_in_budget


def _round(lo, hi, rc_lo, rc_hi):
    """One Keccak round over 25 (lo, hi) uint32 array pairs (tuples in/out).
    Identical math to keccak._round_static; rc_* may be traced scalars."""
    new_lo, new_hi = keccak._round_static(list(lo), list(hi), rc_lo, rc_hi)
    return tuple(new_lo), tuple(new_hi)


def _sponge_kernel(x_ref, o_ref, st_lo, st_hi, *, n_items: int,
                   n_rounds: int = 24):
    """Grid (batch_blocks, n_chunks).  x_ref: (34, R, 128) u32 block of the
    transposed input; o_ref: (8, R, 128) digest block (4 u64 words as
    lo,hi,lo,hi...); st_lo/st_hi: (25, R, 128) VMEM state scratch."""
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        st_lo[...] = jnp.zeros_like(st_lo)
        st_hi[...] = jnp.zeros_like(st_hi)

    lo = [st_lo[i] for i in range(25)]
    hi = [st_hi[i] for i in range(25)]

    # overwrite-absorb: lane i of this chunk exists iff item 17c + i < n_items
    base = c * RATE
    for i in range(RATE):
        exists = base + i < n_items
        lo[i] = jnp.where(exists, x_ref[2 * i], lo[i])
        hi[i] = jnp.where(exists, x_ref[2 * i + 1], hi[i])

    # keccak-f[1600]: all 24 rounds in VMEM, unrolled with host constants
    # (n_rounds < 24 exists only for the interpret-mode tests: the CI
    # interpreter's cost grows superlinearly with kernel size, and the round
    # function itself is bit-exactly covered by tests/test_hash.py)
    rc_lo, rc_hi = _rc_host()
    lo, hi = tuple(lo), tuple(hi)
    for r in range(n_rounds):
        lo, hi = _round(lo, hi, rc_lo[r], rc_hi[r])

    for i in range(25):
        st_lo[i] = lo[i]
        st_hi[i] = hi[i]

    @pl.when(c == n_chunks - 1)
    def _():
        for w in range(4):
            o_ref[2 * w] = lo[w]
            o_ref[2 * w + 1] = hi[w]


@functools.lru_cache(maxsize=None)
def _rc_host():
    return (
        np.asarray(keccak._RC_LO, dtype=np.uint32),
        np.asarray(keccak._RC_HI, dtype=np.uint32),
    )


def _batch_rows(n_rows: int, k_cols: int) -> int:
    """Sublane rows R per batch block: keep the (34, R, 128) input block
    under the VMEM budget, at least 1 and at most 32 (4096 leaves), and
    no larger than the batch itself."""
    per_row = RATE_U32 * _LANES * 4
    r = max(1, min(32, _vmem_in_budget() // per_row))
    return min(r, max(1, n_rows // _LANES))


def supports(n_rows: int, k_cols: int) -> bool:
    """Kernel preconditions: batch divisible into (R, 128) tiles."""
    r = _batch_rows(n_rows, k_cols)
    block = r * _LANES
    return n_rows >= block and n_rows % block == 0


def hash_rows_transposed(mat_t: jnp.ndarray, n_items: int | None = None,
                         *, interpret: bool = False,
                         n_rounds: int = 24) -> jnp.ndarray:
    """Core entry: ``mat_t`` is (k_pad, N) canonical u32 with k_pad a multiple
    of 34 (zero-padded); hashes ceil(k/2) u64 items per column.  Returns
    (8, N) digests (u64 words interleaved lo,hi).  ``n_items`` defaults to
    k_pad//2 (pass the true item count when the zero pad must be skipped)."""
    k_pad, n = mat_t.shape
    assert k_pad % RATE_U32 == 0, "columns must be padded to a rate multiple"
    n_chunks = k_pad // RATE_U32
    if n_items is None:
        n_items = k_pad // 2
    r = _batch_rows(n, n_items * 2)
    block = r * _LANES
    assert n % block == 0, (n, block)
    x = mat_t.reshape(k_pad, n // _LANES, _LANES)
    call = _sponge_call(
        k_pad, n // _LANES, n_items=n_items, r=r, interpret=interpret,
        n_rounds=n_rounds,
    )
    return call(x).reshape(8, n)


@functools.lru_cache(maxsize=None)
def _sponge_call(k_pad: int, n_tiles: int, *, n_items: int, r: int,
                 interpret: bool, n_rounds: int = 24):
    """Shape-keyed compiled sponge (the reference's per-log_n plan cache,
    backend_vulkan.rs:977-996, applied to pallas executables).  Interpret
    mode stays un-jitted: tracing the interpreter's grid loop into one XLA
    program blows compile time up; eager interpret runs each grid step."""
    n_chunks = k_pad // RATE_U32
    block = r * _LANES

    def run(x):
        return pl.pallas_call(
            functools.partial(_sponge_kernel, n_items=n_items,
                              n_rounds=n_rounds),
            grid=(n_tiles * _LANES // block, n_chunks),
            in_specs=[
                pl.BlockSpec(
                    (RATE_U32, r, _LANES),
                    lambda j, c: (c, j, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (8, r, _LANES), lambda j, c: (0, j, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((8, n_tiles, _LANES), jnp.uint32),
            scratch_shapes=[
                pltpu.VMEM((25, r, _LANES), jnp.uint32),
                pltpu.VMEM((25, r, _LANES), jnp.uint32),
            ],
            interpret=interpret,
        )(x)

    return run if interpret else jax.jit(run)


def _pad_transpose(mat_u32: jnp.ndarray) -> tuple[jnp.ndarray, int]:
    """(N, k) -> ((k_pad, N), n_items) with k_pad the rate-chunk multiple."""
    n, k = mat_u32.shape
    n_items = -(-k // 2)
    k_pad = -(-max(k, 1) // RATE_U32) * RATE_U32
    mat_t = mat_u32.T
    if k_pad > k:
        mat_t = jnp.concatenate(
            [mat_t, jnp.zeros((k_pad - k, n), dtype=jnp.uint32)], axis=0
        )
    return mat_t, n_items


def hash_field_rows(mat_u32: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ``sponge.hash_field_rows_batched``: (N, k) canonical u32
    rows -> (N, 4, 2) digests."""
    n = mat_u32.shape[0]
    mat_t, n_items = _pad_transpose(mat_u32)
    out = hash_rows_transposed(mat_t, n_items=n_items, interpret=interpret)  # (8, N)
    return out.T.reshape(n, 4, 2)


def compress_digests(left: jnp.ndarray, right: jnp.ndarray,
                     *, interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ``sponge.compress_digests_batched``: two (N, 4, 2) digest
    arrays -> (N, 4, 2).  The 16-u32 concatenation is exactly the sponge's
    little-endian pair serialization, so this reuses the row kernel."""
    n = left.shape[0]
    rows = jnp.concatenate([left.reshape(n, 8), right.reshape(n, 8)], axis=1)
    return hash_field_rows(rows, interpret=interpret)
