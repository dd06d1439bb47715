"""Merkle MMCS + challenger tests (SURVEY.md par7.1 steps 6-7)."""

import numpy as np
import jax.numpy as jnp

from tpu_stark.commit.merkle import MerkleTreeMmcs
from tpu_stark.challenger.challenger import Challenger, HashChallenger
from tpu_stark.fields import babybear as bb
from tpu_stark.hash import sponge

RNG = np.random.default_rng(7)


def rand_monty(h, w):
    return jnp.asarray((RNG.integers(0, bb.P, size=(h, w))).astype(np.uint32))


class TestMerkleMmcs:
    def test_commit_open_verify_single(self):
        mmcs = MerkleTreeMmcs()
        m = rand_monty(16, 3)
        root, data = mmcs.commit([m])
        for idx in range(16):
            op = mmcs.open_batch(idx, data)
            assert mmcs.verify_batch(root, [(16, 3)], idx, op)
        # wrong index fails
        op = mmcs.open_batch(3, data)
        assert not mmcs.verify_batch(root, [(16, 3)], 4, op)

    def test_host_tail_layers_match_device(self):
        """Keccak tree host-tail (upper layers on the CPU backend): same
        root, same verifying openings, mixed-height injection included."""
        import os

        tall, short = rand_monty(64, 5), rand_monty(8, 2)
        base_root, _ = MerkleTreeMmcs().commit([tall, short])
        os.environ["TPU_STARK_MERKLE_HOST_TAIL"] = "4"
        try:
            root, data = MerkleTreeMmcs().commit([tall, short])
        finally:
            del os.environ["TPU_STARK_MERKLE_HOST_TAIL"]
        assert tuple(root) == tuple(base_root)
        assert any(isinstance(l, np.ndarray) for l in data.layers)
        mmcs = MerkleTreeMmcs()
        for idx in (0, 13, 63):
            op = mmcs.open_batch_many([idx], data)[0]
            assert mmcs.verify_batch(root, [(64, 5), (8, 2)], idx, op)

    def test_tamper_detected(self):
        mmcs = MerkleTreeMmcs()
        m = rand_monty(8, 2)
        root, data = mmcs.commit([m])
        op = mmcs.open_batch(5, data)
        op.opened_values[0][0] ^= 1
        assert not mmcs.verify_batch(root, [(8, 2)], 5, op)

    def test_multi_matrix_same_height(self):
        mmcs = MerkleTreeMmcs()
        a, b = rand_monty(8, 2), rand_monty(8, 5)
        root, data = mmcs.commit([a, b])
        op = mmcs.open_batch(6, data)
        assert mmcs.verify_batch(root, [(8, 2), (8, 5)], 6, op)
        # leaf = concat of rows; check against host sponge directly at idx 0
        op0 = mmcs.open_batch(0, data)
        leaf = sponge.hash_field_row(
            [int(v) for v in op0.opened_values[0]] + [int(v) for v in op0.opened_values[1]]
        )
        node = leaf
        idx = 0
        for sib in op0.proof:
            node = sponge.compress_digests(node, sib) if idx % 2 == 0 else sponge.compress_digests(sib, node)
            idx //= 2
        assert tuple(node) == tuple(root)

    def test_mixed_heights_injection(self):
        mmcs = MerkleTreeMmcs()
        tall, short = rand_monty(16, 2), rand_monty(4, 3)
        root, data = mmcs.commit([tall, short])
        for idx in (0, 7, 15):
            op = mmcs.open_batch(idx, data)
            assert mmcs.verify_batch(root, [(16, 2), (4, 3)], idx, op)
        op = mmcs.open_batch(9, data)
        op.opened_values[1][1] ^= 5
        assert not mmcs.verify_batch(root, [(16, 2), (4, 3)], 9, op)

    def test_hiding_salts(self):
        mmcs = MerkleTreeMmcs(hiding=True, rng_seed=1)
        m = rand_monty(8, 2)
        root, data = mmcs.commit([m])
        op = mmcs.open_batch(2, data)
        assert op.opened_salts is not None and op.opened_salts[0].shape == (4,)
        assert mmcs.verify_batch(root, [(8, 2)], 2, op)
        # same seed -> same salts -> same root (determinism for parity)
        root2, _ = MerkleTreeMmcs(hiding=True, rng_seed=1).commit([m])
        assert root == root2
        # different seed -> different root (hiding actually mixes in salt)
        root3, _ = MerkleTreeMmcs(hiding=True, rng_seed=2).commit([m])
        assert root != root3
        # rng state persists across commits on one instance (p3 RefCell<R>)
        chained = MerkleTreeMmcs(hiding=True, rng_seed=1)
        r1, _ = chained.commit([m])
        r2, _ = chained.commit([m])
        assert r1 == root and r2 != root
        # salt tamper detected
        op.opened_salts[0][0] ^= 1
        assert not mmcs.verify_batch(root, [(8, 2)], 2, op)


class TestChallenger:
    def test_hash_challenger_chaining_and_pop_order(self):
        c = HashChallenger()
        c.observe_bytes(b"hello")
        from tpu_stark.hash.keccak import keccak256

        digest = keccak256(b"hello")
        # bytes pop from the end of the digest
        assert c.sample_byte() == digest[-1]
        assert c.sample_byte() == digest[-2]
        # observing invalidates buffered output; next flush hashes chain||new
        c.observe_byte(0x42)
        want = keccak256(digest + bytes([0x42]))
        assert c.sample_byte() == want[-1]

    def test_sample_in_field_and_deterministic(self):
        a, b = Challenger(), Challenger()
        for ch in (a, b):
            ch.observe_u32s([1, 2, 3])
        va = [a.sample_u32() for _ in range(10)]
        vb = [b.sample_u32() for _ in range(10)]
        assert va == vb
        assert all(0 <= v < bb.P for v in va)

    def test_observation_order_matters(self):
        a, b = Challenger(), Challenger()
        a.observe_u32s([1, 2])
        b.observe_u32s([2, 1])
        assert a.sample_u32() != b.sample_u32()

    def test_ext_sample(self):
        c = Challenger()
        c.observe_u32(77)
        e = c.sample_ext()
        assert len(e) == 4 and all(0 <= v < bb.P for v in e)

    def test_grind_and_check(self):
        c = Challenger()
        c.observe_u32s([5, 6, 7])
        v = c.clone()
        w = c.grind(bits=4)
        assert v.clone().check_witness(4, w)
        # wrong witness fails (statistically)
        assert not v.clone().check_witness(4, w + 1) or w + 1 == bb.P

    def test_commitment_observation(self):
        c = Challenger()
        c.observe_commitment((1, 2, 3, (1 << 64) - 1))
        assert 0 <= c.sample_u32() < bb.P
