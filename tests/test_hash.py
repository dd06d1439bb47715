"""Keccak / sponge / SmallRng tests: published golden vectors + host-vs-device
differentials (SURVEY.md par7.1 steps 5-6)."""

import numpy as np
import jax.numpy as jnp

from tpu_stark.hash import keccak, sponge
from tpu_stark.compat.smallrng import SmallRng
from tpu_stark.fields import babybear as bb

RNG = np.random.default_rng(99)


class TestKeccak256GoldenVectors:
    # Published Keccak-256 (original 0x01 padding) vectors.
    def test_empty(self):
        assert keccak.keccak256(b"").hex() == (
            "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
        )

    def test_abc(self):
        assert keccak.keccak256(b"abc").hex() == (
            "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
        )

    def test_fox(self):
        msg = b"The quick brown fox jumps over the lazy dog"
        assert keccak.keccak256(msg).hex() == (
            "4d741b6f1eb29cb2a9b9911c82f56fa8d73b04959d3d9d222895df6c0b28aa15"
        )

    def test_multiblock(self):
        # > rate (136 bytes) exercises multi-permutation absorption
        msg = bytes(range(256)) * 2
        d1 = keccak.keccak256(msg)
        d2 = keccak.keccak256(msg)
        assert d1 == d2 and len(d1) == 32
        assert d1 != keccak.keccak256(msg + b"\x00")


class TestBatchedKeccakF:
    def test_matches_scalar(self):
        n = 7
        states = RNG.integers(0, 1 << 64, size=(n, 25), dtype=np.uint64)
        lanes = [
            (
                jnp.asarray((states[:, i] & 0xFFFFFFFF).astype(np.uint32)),
                jnp.asarray((states[:, i] >> 32).astype(np.uint32)),
            )
            for i in range(25)
        ]
        out = keccak.keccak_f_batched(lanes)
        for row in range(n):
            want = keccak.keccak_f([int(states[row, i]) for i in range(25)])
            got = [
                int(np.asarray(out[i][0])[row]) | (int(np.asarray(out[i][1])[row]) << 32)
                for i in range(25)
            ]
            assert got == want


class TestLayoutDispatch:
    def test_lane_layout_matches_stacked(self, monkeypatch):
        """The TPU lane layout and the CPU stacked layout are the same
        permutation (the suite runs on CPU, so the lane path needs explicit
        coverage)."""
        states = RNG.integers(0, 1 << 64, size=(5, 25), dtype=np.uint64)
        lanes = [
            (
                jnp.asarray((states[:, i] & 0xFFFFFFFF).astype(np.uint32)),
                jnp.asarray((states[:, i] >> 32).astype(np.uint32)),
            )
            for i in range(25)
        ]
        monkeypatch.setenv("TPU_STARK_KECCAK_LAYOUT", "stacked")
        stacked = keccak.keccak_f_batched(lanes)
        monkeypatch.setenv("TPU_STARK_KECCAK_LAYOUT", "lanes")
        # unroll=24 (the TPU default) is exercised on real TPU runs; XLA-CPU
        # compiles the fully-unrolled form pathologically slowly (minutes).
        for unroll in ("1", "4"):
            monkeypatch.setenv("TPU_STARK_KECCAK_UNROLL", unroll)
            got = keccak.keccak_f_batched(lanes)
            for i in range(25):
                np.testing.assert_array_equal(np.asarray(got[i][0]), np.asarray(stacked[i][0]))
                np.testing.assert_array_equal(np.asarray(got[i][1]), np.asarray(stacked[i][1]))


class TestSponge:
    def test_host_vs_batched(self):
        n, k = 5, 37  # odd width exercises tail packing
        mat = RNG.integers(0, 1 << 32, size=(n, k), dtype=np.uint64).astype(np.uint32)
        dev = sponge.hash_field_rows_batched(jnp.asarray(mat))
        dev_np = np.asarray(dev)
        for row in range(n):
            want = sponge.hash_field_row([int(v) for v in mat[row]])
            got = tuple(
                int(dev_np[row, i, 0]) | (int(dev_np[row, i, 1]) << 32) for i in range(4)
            )
            assert got == want

    def test_rate_boundaries(self):
        # exactly 17 u64s (one chunk), 18 (chunk + partial), 34 (two chunks)
        for n_u64 in (1, 16, 17, 18, 34, 35):
            vals = [int(x) for x in RNG.integers(0, 1 << 64, size=n_u64, dtype=np.uint64)]
            d = sponge.sponge_hash_u64s(vals)
            assert len(d) == 4
            # permutation count differs from a rate-16 sponge; just determinism+sensitivity
            assert d != sponge.sponge_hash_u64s([v ^ 1 for v in vals])

    def test_compress_host_vs_batched(self):
        l = RNG.integers(0, 1 << 64, size=(3, 4), dtype=np.uint64)
        r = RNG.integers(0, 1 << 64, size=(3, 4), dtype=np.uint64)

        def split(x):
            return jnp.stack(
                [
                    jnp.asarray((x & 0xFFFFFFFF).astype(np.uint32)),
                    jnp.asarray((x >> 32).astype(np.uint32)),
                ],
                axis=-1,
            )

        dev = np.asarray(sponge.compress_digests_batched(split(l), split(r)))
        for i in range(3):
            want = sponge.compress_digests([int(v) for v in l[i]], [int(v) for v in r[i]])
            got = tuple(int(dev[i, j, 0]) | (int(dev[i, j, 1]) << 32) for j in range(4))
            assert got == want


class TestSmallRng:
    def test_splitmix_seed_expansion_golden(self):
        # canonical splitmix64(0) first output
        rng = SmallRng.seed_from_u64(0)
        assert rng.s[0] == 0xE220A8397B1DCDAF

    def test_xoshiro_first_output_hand_derived(self):
        rng = SmallRng([1, 2, 3, 4])
        # rotl(s0+s3, 23) + s0 = rotl(5, 23) + 1
        assert rng.next_u64() == (5 << 23) + 1

    def test_next_u32_is_high_word(self):
        a = SmallRng.seed_from_u64(1)
        b = SmallRng.seed_from_u64(1)
        assert a.next_u32() == b.next_u64() >> 32

    def test_babybear_sampling_in_range_and_deterministic(self):
        rng = SmallRng.seed_from_u64(1)
        m1 = rng.sample_babybear_matrix_monty(8, 4)
        assert np.all(m1 < bb.P)
        rng2 = SmallRng.seed_from_u64(1)
        m2 = rng2.sample_babybear_matrix_monty(8, 4)
        np.testing.assert_array_equal(m1, m2)
