"""Field-layer differential tests vs the scalar python oracle
(SURVEY.md par4 / par7.1 step 1-2)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_stark.fields import babybear as bb
from tpu_stark.fields import extension as ext4
from tpu_stark.fields import ref_field as rf

RNG = np.random.default_rng(0xB0BBEA12)


def rand_canonical(n):
    return (RNG.integers(0, 1 << 62, size=n) % bb.P).astype(np.uint64)


def to_dev_monty(x):
    return jnp.asarray(bb.np_to_monty(np.asarray(x, dtype=np.uint64).astype(np.uint32)))


def from_dev_monty(x):
    return bb.np_from_monty(np.asarray(x))


class TestBabyBear:
    def test_constants(self):
        assert (bb.P * bb.MU) % (1 << 32) == 1
        assert bb.MONTY_R == (1 << 32) % bb.P
        assert pow(bb.ROOT_27, 1 << 27, bb.P) == 1
        assert pow(bb.ROOT_27, 1 << 26, bb.P) == bb.P - 1

    def test_two_adic_generator_chain(self):
        for k in range(1, 27):
            g = bb.two_adic_generator(k)
            assert pow(g, 1 << k, bb.P) == 1
            assert rf.fmul(bb.two_adic_generator(k + 1), bb.two_adic_generator(k + 1)) == g
        assert bb.two_adic_generator(0) == 1
        assert bb.two_adic_generator(1) == bb.P - 1

    def test_roundtrip_monty(self):
        x = rand_canonical(1000)
        dev = to_dev_monty(x)
        back = from_dev_monty(dev)
        np.testing.assert_array_equal(back, x.astype(np.uint32))
        # device-side to_u32 agrees with host np_from_monty
        np.testing.assert_array_equal(np.asarray(bb.to_u32(dev)), x.astype(np.uint32))
        # from_u32 is its inverse
        np.testing.assert_array_equal(
            np.asarray(bb.from_u32(jnp.asarray(x.astype(np.uint32)))), np.asarray(dev)
        )

    def test_add_sub_neg_mul_vs_oracle(self):
        a = rand_canonical(4096)
        b = rand_canonical(4096)
        da, db = to_dev_monty(a), to_dev_monty(b)
        np.testing.assert_array_equal(
            from_dev_monty(bb.add(da, db)), ((a + b) % bb.P).astype(np.uint32)
        )
        np.testing.assert_array_equal(
            from_dev_monty(bb.sub(da, db)),
            ((a.astype(np.int64) - b.astype(np.int64)) % bb.P).astype(np.uint32),
        )
        np.testing.assert_array_equal(
            from_dev_monty(bb.neg(da)), ((-a.astype(np.int64)) % bb.P).astype(np.uint32)
        )
        np.testing.assert_array_equal(
            from_dev_monty(bb.mul(da, db)),
            ((a.astype(object) * b.astype(object)) % bb.P).astype(np.uint32),
        )

    def test_mul_edge_cases(self):
        edges = np.array([0, 1, 2, bb.P - 1, bb.P - 2, 1 << 30, (1 << 31) - 1 - (1 << 27)],
                         dtype=np.uint64) % bb.P
        a = np.repeat(edges, len(edges))
        b = np.tile(edges, len(edges))
        da, db = to_dev_monty(a), to_dev_monty(b)
        np.testing.assert_array_equal(
            from_dev_monty(bb.mul(da, db)),
            ((a.astype(object) * b.astype(object)) % bb.P).astype(np.uint32),
        )

    def test_result_always_reduced(self):
        a = rand_canonical(4096)
        b = rand_canonical(4096)
        da, db = to_dev_monty(a), to_dev_monty(b)
        for out in (bb.add(da, db), bb.sub(da, db), bb.mul(da, db), bb.neg(da)):
            assert np.all(np.asarray(out) < bb.P)

    def test_inv_pow(self):
        a = rand_canonical(256)
        a[a == 0] = 1
        da = to_dev_monty(a)
        got = from_dev_monty(bb.mul(da, bb.inv(da)))
        np.testing.assert_array_equal(got, np.ones_like(a, dtype=np.uint32))
        got7 = from_dev_monty(bb.pow_const(da, 7))
        want7 = np.array([pow(int(x), 7, bb.P) for x in a], dtype=np.uint32)
        np.testing.assert_array_equal(got7, want7)

    def test_powers_monty(self):
        g = bb.two_adic_generator(10)
        dev = bb.powers_monty(g, 1024)
        want = np.array([pow(g, i, bb.P) for i in range(1024)], dtype=np.uint32)
        np.testing.assert_array_equal(from_dev_monty(dev), want)

    def test_host_monty_mul(self):
        for _ in range(200):
            a, b = int(RNG.integers(0, bb.P)), int(RNG.integers(0, bb.P))
            am, bm = bb.host_to_monty(a), bb.host_to_monty(b)
            assert bb.host_from_monty(bb.host_monty_mul(am, bm)) == (a * b) % bb.P


class TestExtension:
    def rand_ext(self, n):
        return (RNG.integers(0, bb.P, size=(n, 4))).astype(np.uint64)

    def to_dev(self, x):
        return jnp.asarray(bb.np_to_monty(x.astype(np.uint32)))

    def test_mul_vs_oracle(self):
        a = self.rand_ext(512)
        b = self.rand_ext(512)
        got = bb.np_from_monty(np.asarray(ext4.mul(self.to_dev(a), self.to_dev(b))))
        for i in range(0, 512, 37):
            want = rf.emul(tuple(int(v) for v in a[i]), tuple(int(v) for v in b[i]))
            assert tuple(got[i]) == want

    def test_inv(self):
        a = self.rand_ext(128)
        da = self.to_dev(a)
        prod = bb.np_from_monty(np.asarray(ext4.mul(da, ext4.inv(da))))
        want = np.zeros((128, 4), dtype=np.uint32)
        want[:, 0] = 1
        np.testing.assert_array_equal(prod, want)

    def test_frobenius_is_pth_power(self):
        a = self.rand_ext(4)
        da = self.to_dev(a)
        frob = bb.np_from_monty(np.asarray(ext4.frobenius(da, 1)))
        for i in range(4):
            want = rf.epow(tuple(int(v) for v in a[i]), bb.P)
            assert tuple(frob[i]) == want

    def test_embed_and_scale(self):
        x = rand_canonical(64)
        dx = to_dev_monty(x)
        e = ext4.from_base(dx)
        sq_ext = bb.np_from_monty(np.asarray(ext4.mul(e, e)))
        want = ((x.astype(object) ** 2) % bb.P).astype(np.uint32)
        np.testing.assert_array_equal(sq_ext[:, 0], want)
        assert np.all(sq_ext[:, 1:] == 0)
