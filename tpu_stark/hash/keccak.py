"""Keccak-f[1600] and Keccak-256 — host scalar + TPU-batched implementations.

TPU-native rebuild of ``p3-keccak`` as used by the reference hash stack
(``/root/reference/native/src/fib_air.rs:12,28-38``): ``KeccakF`` (the raw
permutation, used by the sponge that hashes Merkle leaves) and
``Keccak256Hash`` (the byte hash driving the Fiat-Shamir challenger).
Keccak-256 here is the **original Keccak padding (0x01)**, as in tiny-keccak /
p3 — NOT NIST SHA3 (0x06).

Two implementations:

* Host scalar (python ints) — for the sequential challenger transcript and as
  the differential oracle.
* Batched jnp — u64 lanes as (lo, hi) uint32 pairs (TPU has no u64), state =
  25 lane pairs, vectorized over an arbitrary leading batch axis. This is the
  TPU answer to the reference's SIMD-vectorized Keccak lanes across Merkle
  leaves (``[Val; p3_keccak::VECTOR_LEN]``, fib_air.rs:41-42): the "vector
  length" becomes the whole leaf axis on the VPU.

All 24 round constants / rotations validated by the published Keccak-256 test
vectors (see tests/test_hash.py).
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

U64 = (1 << 64) - 1

ROUND_CONSTANTS = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# Rotation offset for lane (x, y) at flat index x + 5*y.
_ROT = [
    0, 1, 62, 28, 27,
    36, 44, 6, 55, 20,
    3, 10, 43, 25, 39,
    41, 45, 15, 21, 8,
    18, 2, 61, 56, 14,
]


# ---------------------------------------------------------------------------
# Host scalar permutation + Keccak-256 byte hash.
# ---------------------------------------------------------------------------
def _rotl64(v: int, r: int) -> int:
    r %= 64
    return ((v << r) | (v >> (64 - r))) & U64


def keccak_f(state: Sequence[int], n_rounds: int = 24) -> List[int]:
    """One Keccak-f[1600] permutation over 25 u64 lanes (flat x + 5y).
    ``n_rounds`` < 24 is used only as a differential-test oracle for the
    reduced-round Pallas kernel tests."""
    a = list(state)
    for rc in ROUND_CONSTANTS[:n_rounds]:
        # theta
        c = [a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl64(c[(x + 1) % 5], 1) for x in range(5)]
        a = [a[i] ^ d[i % 5] for i in range(25)]
        # rho + pi
        b = [0] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = _rotl64(a[x + 5 * y], _ROT[x + 5 * y])
        # chi (i = x + 5y; neighbors (x+1)%5 + 5y, (x+2)%5 + 5y)
        a = [
            b[i] ^ ((~b[(i // 5) * 5 + (i + 1) % 5]) & U64 & b[(i // 5) * 5 + (i + 2) % 5])
            for i in range(25)
        ]
        # iota
        a[0] ^= rc
    return a


def keccak256(data: bytes) -> bytes:
    """Keccak-256 (original 0x01 padding), rate 136 bytes, 32-byte digest —
    the ``Keccak256Hash`` of the challenger stack (fib_air.rs:28).

    Dispatches to the native C implementation when available (bit-identical;
    the python path below is the oracle and fallback)."""
    from ..compat.native import keccak256_native

    native = keccak256_native(data)
    if native is not None:
        return native
    return _keccak256_py(data)


def _keccak256_py(data: bytes) -> bytes:
    rate = 136
    state = [0] * 25
    # pad10*1 with 0x01 domain byte
    padded = bytearray(data)
    pad_len = rate - (len(padded) % rate)
    padded += b"\x00" * pad_len
    padded[len(data)] ^= 0x01
    padded[-1] ^= 0x80
    for off in range(0, len(padded), rate):
        block = padded[off : off + rate]
        for i in range(rate // 8):
            state[i] ^= int.from_bytes(block[8 * i : 8 * i + 8], "little")
        state = keccak_f(state)
    out = b"".join(state[i].to_bytes(8, "little") for i in range(4))
    return out


# ---------------------------------------------------------------------------
# Batched jnp permutation — TWO layouts, dispatched per backend (OPT-0008):
#
# * "lanes" (TPU default): the 25 u64 lanes live as SEPARATE (lo, hi) uint32
#   arrays.  The batch (Merkle-leaf) axis fills the VPU's 8x128 vector lanes
#   at full occupancy, and rho/pi becomes a STATIC relabeling of Python list
#   slots (zero gathers, zero `where` masks; every rotation amount is a
#   compile-time constant so each is 2 shifts + 1 or).  The 24 rounds run
#   under ``lax.scan`` (unroll configurable; measured flat 1..24 on TPU —
#   the ~10x OPT-0008 win comes from the layout itself; see
#   docs/optimization_attempts.md OPT-0008).
# * "stacked" (CPU default): one (..., 25) array per half, rounds under
#   ``lax.fori_loop`` with rho/pi as a static gather.  XLA:CPU (LLVM)
#   compiles the 50-array lane form ~2.4x slower PER SHAPE, and a prove
#   compiles hash kernels at dozens of Merkle-level shapes — the stacked
#   form keeps the CPU/test path fast to compile.
# ---------------------------------------------------------------------------
LanePair = Tuple[jnp.ndarray, jnp.ndarray]  # (lo, hi), identical shapes

# rho+pi as a flat-destination permutation: dest j = y2*5+x2 takes source
# lane SRC[j] rotated left by ROTJ[j].
_SRC = np.zeros(25, dtype=np.int32)
_ROTJ = np.zeros(25, dtype=np.int32)
for _x in range(5):
    for _y in range(5):
        _j = ((2 * _x + 3 * _y) % 5) * 5 + _y
        _SRC[_j] = _x + 5 * _y
        _ROTJ[_j] = _ROT[_x + 5 * _y]

_RC_LO = np.array([rc & 0xFFFFFFFF for rc in ROUND_CONSTANTS], dtype=np.uint32)
_RC_HI = np.array([rc >> 32 for rc in ROUND_CONSTANTS], dtype=np.uint32)


def _rotl_pair(lo, hi, r: int) -> LanePair:
    """64-bit rotl of a (lo, hi) uint32 pair by a compile-time constant."""
    r %= 64
    if r >= 32:
        lo, hi = hi, lo
        r -= 32
    if r == 0:
        return lo, hi
    rl = np.uint32(r)
    rr = np.uint32(32 - r)
    return (lo << rl) | (hi >> rr), (hi << rl) | (lo >> rr)


def _round_static(lo, hi, rc_lo, rc_hi):
    """One Keccak round over 25 separate (lo, hi) lane arrays; rho/pi is a
    static list relabeling. ``rc_lo``/``rc_hi`` are the iota constants
    (host np.uint32 or traced scalars)."""
    # theta
    c = [
        (
            lo[x] ^ lo[x + 5] ^ lo[x + 10] ^ lo[x + 15] ^ lo[x + 20],
            hi[x] ^ hi[x + 5] ^ hi[x + 10] ^ hi[x + 15] ^ hi[x + 20],
        )
        for x in range(5)
    ]
    d = []
    for x in range(5):
        r_lo, r_hi = _rotl_pair(c[(x + 1) % 5][0], c[(x + 1) % 5][1], 1)
        d.append((c[(x - 1) % 5][0] ^ r_lo, c[(x - 1) % 5][1] ^ r_hi))
    lo = [lo[i] ^ d[i % 5][0] for i in range(25)]
    hi = [hi[i] ^ d[i % 5][1] for i in range(25)]
    # rho + pi
    b_lo: List = [None] * 25
    b_hi: List = [None] * 25
    for j in range(25):
        b_lo[j], b_hi[j] = _rotl_pair(lo[_SRC[j]], hi[_SRC[j]], int(_ROTJ[j]))
    # chi
    for y in range(0, 25, 5):
        row_lo = b_lo[y : y + 5]
        row_hi = b_hi[y : y + 5]
        for x in range(5):
            lo[y + x] = row_lo[x] ^ (~row_lo[(x + 1) % 5] & row_lo[(x + 2) % 5])
            hi[y + x] = row_hi[x] ^ (~row_hi[(x + 1) % 5] & row_hi[(x + 2) % 5])
    # iota
    lo[0] = lo[0] ^ rc_lo
    hi[0] = hi[0] ^ rc_hi
    return lo, hi


def _default_unroll() -> int:
    """Rounds per traced scan step in the lane layout.  Measured on 1x v5e
    (N=2^20): unroll 1/4/8/24 all land within noise (30.3/28.9/27.4/28.6
    Mperm/s) — the OPT-0008 win is the lane layout, not the unroll — while
    TPU compile time rises 5.2s -> 13.2s per shape (and a prove compiles
    every Merkle-layer shape).  XLA-CPU is far worse (minutes at unroll>=8).
    Default rolled; override with TPU_STARK_KECCAK_UNROLL."""
    env = os.environ.get("TPU_STARK_KECCAK_UNROLL")
    if env:
        return int(env)
    return 1


def _use_lane_layout() -> bool:
    """Lane layout on accelerators, stacked on CPU (see rationale above).
    Override with TPU_STARK_KECCAK_LAYOUT=lanes|stacked."""
    env = os.environ.get("TPU_STARK_KECCAK_LAYOUT")
    if env:
        return env == "lanes"
    import jax

    return jax.default_backend() != "cpu"


def _keccak_f_lanes(lanes: List[LanePair]) -> List[LanePair]:
    import jax

    lo = tuple(p[0] for p in lanes)
    hi = tuple(p[1] for p in lanes)

    def body(carry, rcs):
        clo, chi = carry
        clo, chi = _round_static(list(clo), list(chi), rcs[0], rcs[1])
        return (tuple(clo), tuple(chi)), None

    (lo, hi), _ = jax.lax.scan(
        body,
        (lo, hi),
        (jnp.asarray(_RC_LO), jnp.asarray(_RC_HI)),
        unroll=_default_unroll(),
    )
    return [(lo[i], hi[i]) for i in range(25)]


def _keccak_round_stacked(i, state):
    lo, hi = state  # (..., 25)
    g_lo = lo.reshape(lo.shape[:-1] + (5, 5))  # [..., y, x]
    g_hi = hi.reshape(hi.shape[:-1] + (5, 5))
    # theta
    c_lo = jnp.bitwise_xor.reduce(g_lo, axis=-2)  # (..., 5)
    c_hi = jnp.bitwise_xor.reduce(g_hi, axis=-2)
    cm1_lo = jnp.roll(c_lo, 1, axis=-1)
    cm1_hi = jnp.roll(c_hi, 1, axis=-1)
    cp1_lo = jnp.roll(c_lo, -1, axis=-1)
    cp1_hi = jnp.roll(c_hi, -1, axis=-1)
    d_lo = cm1_lo ^ ((cp1_lo << np.uint32(1)) | (cp1_hi >> np.uint32(31)))
    d_hi = cm1_hi ^ ((cp1_hi << np.uint32(1)) | (cp1_lo >> np.uint32(31)))
    g_lo = (g_lo ^ d_lo[..., None, :]).reshape(lo.shape)
    g_hi = (g_hi ^ d_hi[..., None, :]).reshape(hi.shape)
    # rho + pi: static gather + per-lane 64-bit rotation on (lo, hi) pairs
    b_lo = g_lo[..., _SRC]
    b_hi = g_hi[..., _SRC]
    swap = jnp.asarray((_ROTJ >= 32))
    t_lo = jnp.where(swap, b_hi, b_lo)
    t_hi = jnp.where(swap, b_lo, b_hi)
    r = jnp.asarray((_ROTJ % 32).astype(np.uint32))
    rr = (np.uint32(32) - r) % np.uint32(32)
    rot_lo = jnp.where(r == 0, t_lo, (t_lo << r) | (t_hi >> rr))
    rot_hi = jnp.where(r == 0, t_hi, (t_hi << r) | (t_lo >> rr))
    # chi (within each row y, over x)
    g_lo = rot_lo.reshape(lo.shape[:-1] + (5, 5))
    g_hi = rot_hi.reshape(hi.shape[:-1] + (5, 5))
    b1_lo = jnp.roll(g_lo, -1, axis=-1)
    b1_hi = jnp.roll(g_hi, -1, axis=-1)
    b2_lo = jnp.roll(g_lo, -2, axis=-1)
    b2_hi = jnp.roll(g_hi, -2, axis=-1)
    g_lo = g_lo ^ (~b1_lo & b2_lo)
    g_hi = g_hi ^ (~b1_hi & b2_hi)
    lo = g_lo.reshape(lo.shape)
    hi = g_hi.reshape(hi.shape)
    # iota
    lo = lo.at[..., 0].set(lo[..., 0] ^ jnp.asarray(_RC_LO)[i])
    hi = hi.at[..., 0].set(hi[..., 0] ^ jnp.asarray(_RC_HI)[i])
    return lo, hi


def keccak_f_batched(lanes: List[LanePair]) -> List[LanePair]:
    """Keccak-f[1600] over 25 (lo, hi) uint32 lane-pair arrays (shared batch
    shape = Merkle leaves on the VPU); layout dispatch per backend, see
    rationale above."""
    import jax

    if _use_lane_layout():
        return _keccak_f_lanes(lanes)
    lo = jnp.stack([p[0] for p in lanes], axis=-1)
    hi = jnp.stack([p[1] for p in lanes], axis=-1)
    lo, hi = jax.lax.fori_loop(0, 24, _keccak_round_stacked, (lo, hi))
    return [(lo[..., i], hi[..., i]) for i in range(25)]


def keccak_f_batched_arrays(lo: jnp.ndarray, hi: jnp.ndarray):
    """Compatibility wrapper: state as (..., 25) uint32 (lo, hi) arrays."""
    lanes = [(lo[..., i], hi[..., i]) for i in range(25)]
    out = keccak_f_batched(lanes)
    return (
        jnp.stack([p[0] for p in out], axis=-1),
        jnp.stack([p[1] for p in out], axis=-1),
    )
