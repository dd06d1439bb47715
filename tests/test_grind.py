"""Differential tests: device-batched PoW grind vs the scalar host loop.

The device search (challenger/grind.py) must return the exact witness the
scalar smallest-first loop finds, across transcript lengths that exercise
every block geometry: witness entirely in block 0, in a later block, and
straddling a block boundary (rate 136, witness 4 bytes at offset len(input)).
"""

import numpy as np
import pytest

from tpu_stark.challenger.challenger import Challenger, HashChallenger
from tpu_stark.challenger.grind import device_grind

RNG = np.random.default_rng(11)


def _challenger_with(n_bytes: int) -> Challenger:
    c = Challenger(HashChallenger())
    c.inner.observe_bytes(bytes(RNG.integers(0, 256, size=n_bytes, dtype=np.uint8)))
    return c


def _host_grind(ch: Challenger, bits: int) -> int:
    for w in range(1 << 22):
        if ch.clone().check_witness(bits, w):
            return w
    raise AssertionError("no witness found")


# offsets chosen so the witness lands: mid block 0; at 132 (straddles the
# 136-byte boundary: bytes 132..135 + pad in next block... actually 132+4=136
# exactly fills block 0 and padding opens block 1); at 134 (true straddle);
# beyond one block (200); exactly filling two blocks minus pad (268).
@pytest.mark.parametrize("n_bytes", [32, 132, 134, 200, 268])
@pytest.mark.parametrize("bits", [1, 5, 9])
def test_device_matches_host(n_bytes, bits):
    ch = _challenger_with(n_bytes)
    want = _host_grind(ch, bits)
    got = device_grind(
        bytes(ch.inner._input),
        bits,
        chunk=1 << 12,
        host_check=lambda w: ch.clone().check_witness(bits, w),
    )
    assert got == want


def test_grind_method_device_path():
    """Challenger.grind at bits >= threshold goes through the device search
    and leaves the transcript in the same state as the scalar path."""
    ch_a = _challenger_with(64)
    ch_b = ch_a.clone()
    w_dev = ch_a.grind(7)  # >= _GRIND_DEVICE_MIN_BITS -> device path
    import os

    os.environ["TPU_STARK_GRIND"] = "host"
    try:
        w_host = ch_b.grind(7)
    finally:
        del os.environ["TPU_STARK_GRIND"]
    assert w_dev == w_host
    # transcripts advanced identically
    assert ch_a.inner._input == ch_b.inner._input
    assert ch_a.sample_u32() == ch_b.sample_u32()
