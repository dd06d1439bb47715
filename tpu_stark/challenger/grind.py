"""Device-batched FRI proof-of-work grinding (vectorized witness search).

The reference's grind is p3-fri's parallel PoW search (SURVEY.md par2.2 /
par3.1; planned in par7.1 step 10 as "grinding = vectorized hash search").
At production parameters (proof_of_work_bits=16) a scalar host loop costs
~2^16 full-transcript Keccaks in Python — a multi-second latency tail.  Here
the search runs on the TPU: one jitted program hashes a whole chunk of
candidate witnesses through the batched (lo, hi)-lane Keccak and returns the
pass/reject verdicts; the host keeps only the smallest-first scan order.

Exact semantics replicated per candidate w (canonical u32), matching
``Challenger.check_witness`` byte for byte:

* message = transcript-input-buffer || w as 4 LE bytes
* digest  = Keccak-256(message)  (original 0x01 padding, rate 136)
* sample_u32 pops 4 bytes from the END of the digest per draw: draw k reads
  digest[32-4k-4 : 32-4k] big-endian, masks to 31 bits, rejects if >= P
* pass = first accepted draw has its low ``bits`` bits zero

A candidate whose 8 in-digest draws ALL reject (probability ~(1 - P/2^31)^8
~= 6e-10) needs transcript chaining the device path doesn't model; such
candidates are flagged and re-checked on host, preserving bit-exactness.

The split is the OPT-0018 host/device pattern inverted: the *prefix* blocks
of the message are constant across candidates, so they are absorbed once on
host; only the block(s) containing the witness bytes run on device.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np

from ..fields import babybear as bb
from ..hash import keccak as kk

_RATE = 136
_MASK31 = (1 << 31) - 1


def _absorb_block_host(state: List[int], block: bytes) -> List[int]:
    st = list(state)
    for i in range(_RATE // 8):
        st[i] ^= int.from_bytes(block[8 * i : 8 * i + 8], "little")
    return kk.keccak_f(st)


def _plan(input_bytes: bytes):
    """Split the padded message into a host-absorbed constant prefix and the
    device-processed tail blocks; locate the witness bytes in the tail.

    Returns (prefix_state_lo, prefix_state_hi, tail_template, w_off) where
    ``tail_template`` is the padded tail with zeroed witness bytes and
    ``w_off`` is the witness's byte offset within the tail."""
    total = len(input_bytes) + 4
    pad = _RATE - (total % _RATE)
    padded = bytearray(input_bytes) + bytes(4 + pad)
    padded[total] ^= 0x01
    padded[-1] ^= 0x80
    first_w_block = len(input_bytes) // _RATE
    state = [0] * 25
    for off in range(0, first_w_block * _RATE, _RATE):
        state = _absorb_block_host(state, bytes(padded[off : off + _RATE]))
    tail = bytes(padded[first_w_block * _RATE :])
    w_off = len(input_bytes) - first_w_block * _RATE
    lo = np.array([s & 0xFFFFFFFF for s in state], dtype=np.uint32)
    hi = np.array([s >> 32 for s in state], dtype=np.uint32)
    return lo, hi, tail, w_off


@functools.lru_cache(maxsize=8)
def _chunk_fn(n_blocks: int, w_off: int, bits: int, chunk: int):
    """Jitted (per tail-geometry) verdict function: ws (chunk,) uint32 ->
    (passed, needs_host) boolean arrays."""
    import jax
    import jax.numpy as jnp

    # Witness byte i lands at tail offset w_off+i: block b_i, lane l_i,
    # byte-in-lane k_i; half = lo if k_i < 4 else hi.  All compile-time.
    placements = []
    for i in range(4):
        p = w_off + i
        placements.append((p // _RATE, (p % _RATE) // 8, p % 8))

    def fn(ws, prefix_lo, prefix_hi, tail_words):
        # tail_words: (n_blocks, 17, 2) uint32 template (lo, hi per lane)
        lanes = [
            (jnp.broadcast_to(prefix_lo[i], ws.shape), jnp.broadcast_to(prefix_hi[i], ws.shape))
            for i in range(25)
        ]
        for blk in range(n_blocks):
            # xor in the block: template + witness bytes
            blk_lanes = []
            for lane in range(17):
                add_lo = tail_words[blk, lane, 0]
                add_hi = tail_words[blk, lane, 1]
                lo_i, hi_i = lanes[lane]
                lo_i = lo_i ^ add_lo
                hi_i = hi_i ^ add_hi
                for i, (b_i, l_i, k_i) in enumerate(placements):
                    if b_i == blk and l_i == lane:
                        byte = (ws >> np.uint32(8 * i)) & np.uint32(0xFF)
                        if k_i < 4:
                            lo_i = lo_i ^ (byte << np.uint32(8 * k_i))
                        else:
                            hi_i = hi_i ^ (byte << np.uint32(8 * (k_i - 4)))
                blk_lanes.append((lo_i, hi_i))
            lanes = blk_lanes + lanes[17:]
            lanes = kk.keccak_f_batched(lanes)
        # digest = lanes 0..3 LE; draw k reads bytes [32-4k-4, 32-4k) BE =
        # byteswap of the (lo, hi) words in order [hi3, lo3, ..., hi0, lo0]
        def bswap(x):
            return (
                ((x & np.uint32(0xFF)) << np.uint32(24))
                | ((x & np.uint32(0xFF00)) << np.uint32(8))
                | ((x >> np.uint32(8)) & np.uint32(0xFF00))
                | (x >> np.uint32(24))
            )

        words = []
        for lane in (3, 2, 1, 0):
            words.append(lanes[lane][1])  # hi first (later bytes)
            words.append(lanes[lane][0])
        chosen = jnp.zeros_like(ws)
        taken = jnp.zeros(ws.shape, dtype=bool)
        for wv in words:
            v = bswap(wv) & np.uint32(_MASK31)
            ok = v < np.uint32(bb.P)
            chosen = jnp.where(~taken & ok, v, chosen)
            taken = taken | ok
        passed = taken & ((chosen & np.uint32((1 << bits) - 1)) == 0)
        return passed, ~taken

    return jax.jit(fn)


def device_grind(
    input_bytes: bytes,
    bits: int,
    chunk: int = 1 << 17,
    host_check=None,
) -> Optional[int]:
    """Smallest canonical witness w with check_witness(bits, w) true, found by
    chunked device search.  ``host_check(w) -> bool`` is the scalar oracle used
    for the ~6e-10 chaining corner (and in tests); returns None only if the
    full field is exhausted (unreachable for bits < 31)."""
    lo, hi, tail, w_off = _plan(input_bytes)
    n_blocks = len(tail) // _RATE
    tail_np = np.frombuffer(tail, dtype=np.uint8).reshape(n_blocks, _RATE)
    words = tail_np.view("<u4").reshape(n_blocks, 17, 2)  # (lo, hi) per lane
    import jax.numpy as jnp

    fn = _chunk_fn(n_blocks, w_off, bits, chunk)
    prefix_lo = jnp.asarray(lo)
    prefix_hi = jnp.asarray(hi)
    tail_words = jnp.asarray(words)
    for start in range(0, bb.P, chunk):
        ws = jnp.arange(start, start + chunk, dtype=jnp.uint32)
        passed, needs_host = fn(ws, prefix_lo, prefix_hi, tail_words)
        passed = np.asarray(passed)
        needs_host = np.asarray(needs_host)
        hit = passed | needs_host
        for idx in np.flatnonzero(hit):
            w = start + int(idx)
            if w >= bb.P:
                return None
            if needs_host[idx]:
                if host_check is not None and host_check(w):
                    return w
                continue
            return w
    return None
