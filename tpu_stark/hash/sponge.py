"""Sponge / serializing-hasher / compression constructions over Keccak-f.

TPU-native rebuild of the ``p3-symmetric`` stack assembled by the reference at
``/root/reference/native/src/fib_air.rs:28-51``:

* ``PaddingFreeSponge<KeccakF, 25, 17, 4>`` — absorb u64 items in rate-17
  chunks by **overwriting** the first len(chunk) state lanes, permute after
  every chunk (including the final partial one), squeeze the first 4 lanes.
* ``SerializingHasher`` — hash BabyBear values by serializing canonical u32s
  and packing little-endian pairs into u64 items (first element = low half).
* ``CompressionFunctionFromHasher<_, 2, 4>`` — compress two 4-u64 digests by
  hashing their concatenation.

Host versions (python ints) drive the sequential transcript; batched versions
(uint32 (lo, hi) pairs, arbitrary leading leaf axis) drive Merkle layers on
the VPU.
"""

from __future__ import annotations

import os
from typing import Iterable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from . import keccak

WIDTH = 25
RATE = 17
OUT = 4


# ---------------------------------------------------------------------------
# Host (sequential, python ints)
# ---------------------------------------------------------------------------
def sponge_hash_u64s(items: Sequence[int]) -> Tuple[int, int, int, int]:
    """PaddingFreeSponge over u64 items (overwrite-absorb, permute per chunk).
    Dispatches to the C helper when built (bit-identical; golden-vector
    pinned) — the 100-query production verifier runs ~30k of these."""
    state = [0] * WIDTH
    items = list(items)
    if not items:
        return (0, 0, 0, 0)
    from ..compat.native import sponge_u64_native

    native = sponge_u64_native(items)
    if native is not None:
        return native
    for off in range(0, len(items), RATE):
        chunk = items[off : off + RATE]
        for i, v in enumerate(chunk):
            state[i] = v & keccak.U64
        state = keccak.keccak_f(state)
    return tuple(state[:OUT])  # type: ignore[return-value]


def pack_u32s_to_u64s(values_u32: Sequence[int]) -> List[int]:
    """Little-endian pair packing: u64 = lo | (hi << 32); odd tail zero-padded
    high (SerializingHasher semantics for 32-bit fields into a u64 sponge)."""
    out = []
    vals = list(values_u32)
    for i in range(0, len(vals), 2):
        lo = vals[i] & 0xFFFFFFFF
        hi = (vals[i + 1] & 0xFFFFFFFF) if i + 1 < len(vals) else 0
        out.append(lo | (hi << 32))
    return out


def hash_field_row(values_u32: Sequence[int]) -> Tuple[int, int, int, int]:
    """SerializingHasher(PaddingFreeSponge) of canonical u32 field values."""
    return sponge_hash_u64s(pack_u32s_to_u64s(values_u32))


def compress_digests(
    left: Sequence[int], right: Sequence[int]
) -> Tuple[int, int, int, int]:
    """CompressionFunctionFromHasher<_, 2, 4>: H(left || right)."""
    return sponge_hash_u64s(list(left) + list(right))


# ---------------------------------------------------------------------------
# Batched (jnp, leading leaf axis)
# ---------------------------------------------------------------------------
LanePair = keccak.LanePair


def _zeros_state(batch_shape) -> List[LanePair]:
    z = jnp.zeros(batch_shape, dtype=jnp.uint32)
    return [(z, z) for _ in range(WIDTH)]


# Wide rows (many rate-chunks, e.g. keccak-air's 3608-column trace) absorb
# under lax.scan so the traced graph stays one unrolled permutation instead
# of one per chunk; narrow rows unroll the chunk loop too (maximal fusion).
_SCAN_MIN_CHUNKS = 4


def _absorb_full_blocks(
    state: List[LanePair], items: Sequence[LanePair]
) -> List[LanePair]:
    """Absorb whole rate-RATE blocks (len(items) % RATE == 0) into an
    existing sponge state: overwrite the first RATE lanes, permute, repeat.
    Scans when there are many blocks (one permutation body in the graph)."""
    import jax

    items = list(items)
    assert len(items) % RATE == 0
    n_full = len(items) // RATE
    batch_shape = items[0][0].shape if items else None
    if n_full >= _SCAN_MIN_CHUNKS:
        lo_stack = jnp.stack(
            [items[k][0] for k in range(n_full * RATE)]
        ).reshape((n_full, RATE) + batch_shape)
        hi_stack = jnp.stack(
            [items[k][1] for k in range(n_full * RATE)]
        ).reshape((n_full, RATE) + batch_shape)

        def body(carry, chunk):
            lo, hi = carry
            c_lo, c_hi = chunk
            lanes = [(c_lo[i], c_hi[i]) for i in range(RATE)] + [
                (lo[i], hi[i]) for i in range(RATE, WIDTH)
            ]
            out = keccak.keccak_f_batched(lanes)
            return (
                tuple(p[0] for p in out),
                tuple(p[1] for p in out),
            ), None

        init = (
            tuple(p[0] for p in state),
            tuple(p[1] for p in state),
        )
        (lo_t, hi_t), _ = jax.lax.scan(body, init, (lo_stack, hi_stack))
        return [(lo_t[i], hi_t[i]) for i in range(WIDTH)]
    for off in range(0, len(items), RATE):
        chunk = items[off : off + RATE]
        state = list(state)
        for i, v in enumerate(chunk):
            state[i] = v
        state = keccak.keccak_f_batched(state)
    return state


def sponge_hash_u64s_batched(items: Sequence[LanePair]) -> List[LanePair]:
    """Batched PaddingFreeSponge: `items` is a sequence of (lo, hi) uint32
    array pairs (one u64 item each, shared batch shape). Returns 4 lane pairs."""
    assert items, "empty sponge input"
    batch_shape = items[0][0].shape
    state = _zeros_state(batch_shape)
    items = list(items)
    n_full = len(items) // RATE
    state = _absorb_full_blocks(state, items[: n_full * RATE])
    items = items[n_full * RATE :]
    if items:
        state = list(state)
        for i, v in enumerate(items):
            state[i] = v
        state = keccak.keccak_f_batched(state)
    return state[:OUT]


class KeccakRowStream:
    """Incremental SerializingHasher(PaddingFreeSponge) over COLUMN chunks of
    a row batch — the carry-state absorb that lets the streaming wide prover
    (prover/wide.py) commit with the Keccak stack even though 17-u64 rate
    blocks straddle column-chunk boundaries: the partial block (and a split
    u32 pair when a chunk width is odd) ride the carried state between
    chunks.  ``finalize`` permutes the final partial block exactly like
    ``sponge_hash_u64s_batched`` — digests are bit-identical to hashing the
    whole rows at once (tested, tests/test_wide_prove.py)."""

    def __init__(self, n_rows: int):
        self._state = _zeros_state((n_rows,))
        self._pend: List[LanePair] = []  # < RATE carried u64 items
        self._half: Optional[jnp.ndarray] = None  # odd split of a u32 pair
        self._n = n_rows

    def absorb_cols(self, mat_u32: jnp.ndarray) -> None:
        n, k = int(mat_u32.shape[0]), int(mat_u32.shape[1])
        assert n == self._n
        if self._half is not None:
            mat_u32 = jnp.concatenate([self._half, mat_u32], axis=1)
            k += 1
            self._half = None
        if k % 2:
            self._half = mat_u32[:, -1:]
            mat_u32 = mat_u32[:, :-1]
            k -= 1
        if k:
            self._pend.extend(pack_matrix_rows_to_u64s(mat_u32))
        n_full = len(self._pend) // RATE
        if n_full:
            self._state = _absorb_full_blocks(
                self._state, self._pend[: n_full * RATE]
            )
            self._pend = self._pend[n_full * RATE :]

    def finalize(self) -> jnp.ndarray:
        """(N, 4, 2) digests."""
        if self._half is not None:
            self._pend.append(
                (self._half[:, 0], jnp.zeros((self._n,), dtype=jnp.uint32))
            )
            self._half = None
        if self._pend:
            state = list(self._state)
            for i, v in enumerate(self._pend):
                state[i] = v
            self._state = keccak.keccak_f_batched(state)
            self._pend = []
        out = self._state[:OUT]
        return jnp.stack([jnp.stack([lo, hi], axis=-1) for lo, hi in out], axis=-2)


def pack_matrix_rows_to_u64s(mat_u32: jnp.ndarray) -> List[LanePair]:
    """(N, k) canonical uint32 matrix -> k/2 rounded-up u64 items per row,
    little-endian pair packing along the row."""
    n, k = mat_u32.shape
    items: List[LanePair] = []
    for i in range(0, k, 2):
        lo = mat_u32[:, i]
        hi = (
            mat_u32[:, i + 1]
            if i + 1 < k
            else jnp.zeros((n,), dtype=jnp.uint32)
        )
        items.append((lo, hi))
    return items


def _keccak_impl() -> str:
    """Merkle-layer sponge implementation: the Pallas kernel (all 24 rounds
    VMEM-resident; measured 5.3x the XLA scan path at 2^20 leaves on 1x v5e —
    160 Mleaves/s leaf hash, 163 Mpairs/s compress) on accelerators, the XLA
    lane/stacked path on CPU (Mosaic is TPU-only).
    Override with TPU_STARK_KECCAK_IMPL=pallas|xla."""
    env = os.environ.get("TPU_STARK_KECCAK_IMPL")
    if env:
        return env
    import jax

    return "pallas" if jax.default_backend() != "cpu" else "xla"


def _hash_block_rows() -> int:
    """Row-block bound for one leaf-hash launch.  The Pallas kernel pads each
    row to a whole 34-u32 rate block and transposes — at 2^26 x 6 (the 2^24
    zk fib trace's committed leaves) the padded buffer alone is ~9 GB.
    Blocking rows keeps the transient at ~1 GB and every block shares one
    compiled program.  Override with TPU_STARK_HASH_BLOCK (log2)."""
    return 1 << int(os.environ.get("TPU_STARK_HASH_BLOCK", "23"))


def hash_field_rows_batched(
    mat_u32: jnp.ndarray, impl: Optional[str] = None
) -> jnp.ndarray:
    """Hash each row of an (N, k) canonical-u32 matrix -> (N, 4, 2) uint32
    digests (dim 2 = [lo, hi] of each u64 digest word)."""
    n = int(mat_u32.shape[0])
    blk = _hash_block_rows()
    if n > blk:
        return jnp.concatenate(
            [
                hash_field_rows_batched(mat_u32[off : off + blk], impl)
                for off in range(0, n, blk)
            ],
            axis=0,
        )
    impl = impl or _keccak_impl()
    if impl == "pallas":
        from . import pallas_keccak

        if pallas_keccak.supports(int(mat_u32.shape[0]), int(mat_u32.shape[1])):
            return pallas_keccak.hash_field_rows(mat_u32)
    out = sponge_hash_u64s_batched(pack_matrix_rows_to_u64s(mat_u32))
    return jnp.stack([jnp.stack([lo, hi], axis=-1) for lo, hi in out], axis=-2)


def compress_digests_batched(
    left: jnp.ndarray, right: jnp.ndarray, impl: Optional[str] = None
) -> jnp.ndarray:
    """Compress (N, 4, 2) digest arrays pairwise -> (N, 4, 2)."""
    n = int(left.shape[0])
    blk = _hash_block_rows()
    if n > blk:
        return jnp.concatenate(
            [
                compress_digests_batched(
                    left[off : off + blk], right[off : off + blk], impl
                )
                for off in range(0, n, blk)
            ],
            axis=0,
        )
    impl = impl or _keccak_impl()
    if impl == "pallas":
        from . import pallas_keccak

        if pallas_keccak.supports(int(left.shape[0]), 16):
            return pallas_keccak.compress_digests(left, right)
    items = [(left[:, i, 0], left[:, i, 1]) for i in range(OUT)] + [
        (right[:, i, 0], right[:, i, 1]) for i in range(OUT)
    ]
    out = sponge_hash_u64s_batched(items)
    return jnp.stack([jnp.stack([lo, hi], axis=-1) for lo, hi in out], axis=-2)
