"""Native C runtime helpers: build + bit-exact differential vs python."""

import numpy as np
import pytest

from tpu_stark.compat import native
from tpu_stark.compat.smallrng import SmallRng
from tpu_stark.hash.keccak import _keccak256_py, keccak256


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("native toolchain unavailable")
    return l


def test_native_keccak256_matches_python(lib):
    for msg in [b"", b"abc", bytes(range(256)) * 3, b"x" * 135, b"y" * 136, b"z" * 137]:
        assert native.keccak256_native(msg) == _keccak256_py(msg)
    # and the public entry point (whatever path) matches golden
    assert keccak256(b"").hex().startswith("c5d24601")


def test_native_xoshiro_stream_matches_python(lib):
    import ctypes

    py = SmallRng.seed_from_u64(1)
    state = (ctypes.c_uint64 * 4)()
    lib.ts_xoshiro_seed(1, state)
    assert list(state) == py.s
    for _ in range(100):
        assert lib.ts_xoshiro_next_u64(state) == py.next_u64()


def test_native_babybear_fill_matches_python(lib):
    a = SmallRng.seed_from_u64(7)
    b = SmallRng.seed_from_u64(7)
    fast = a.sample_babybear_matrix_monty(64, 4)  # native path
    slow = np.empty(256, dtype=np.uint32)
    for i in range(256):
        slow[i] = b.sample_babybear_monty()
    np.testing.assert_array_equal(fast.reshape(-1), slow)
    # rng state advanced identically: next draws agree
    assert a.sample_babybear_monty() == b.sample_babybear_monty()


def test_bulk_sampling_speed(lib):
    import time

    rng = SmallRng.seed_from_u64(1)
    t0 = time.perf_counter()
    rng.sample_babybear_matrix_monty(1 << 18, 4)  # 1M draws
    dt = time.perf_counter() - t0
    assert dt < 1.0, f"native bulk sampling too slow: {dt:.2f}s"
