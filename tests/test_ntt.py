"""NTT differential tests vs the naive O(n^2) oracle and algebraic identities
(SURVEY.md par4 items 3-5, par7.1 step 4)."""

import numpy as np
import jax.numpy as jnp

from tpu_stark.fields import babybear as bb
from tpu_stark.matrix import bit_reversal_perm, reverse_matrix_index_bits
from tpu_stark.ntt import radix2
from tpu_stark.ntt.dft import Dft
from tpu_stark.ntt.reference import naive_dft_matrix
from tpu_stark.backend import registry

RNG = np.random.default_rng(42)


def rand_mat(h, w):
    return (RNG.integers(0, bb.P, size=(h, w))).astype(np.uint32)


def to_dev(x):
    return jnp.asarray(bb.np_to_monty(x))


def from_dev(x):
    return bb.np_from_monty(np.asarray(x))


class TestBitReversal:
    def test_perm_matches_transpose_impl(self):
        for log_h in (1, 3, 5):
            h = 1 << log_h
            mat = rand_mat(h, 3)
            got = np.asarray(reverse_matrix_index_bits(jnp.asarray(mat)))
            want = mat[bit_reversal_perm(log_h)]
            np.testing.assert_array_equal(got, want)

    def test_involution(self):
        mat = jnp.asarray(rand_mat(64, 5))
        twice = reverse_matrix_index_bits(reverse_matrix_index_bits(mat))
        np.testing.assert_array_equal(np.asarray(twice), np.asarray(mat))


class TestDftBatch:
    def test_vs_naive(self):
        for h, w in [(2, 1), (8, 3), (32, 5), (64, 2)]:
            mat = rand_mat(h, w)
            got = from_dev(radix2.dft_batch(to_dev(mat)))
            want = naive_dft_matrix(mat)
            np.testing.assert_array_equal(got, want, err_msg=f"h={h} w={w}")

    def test_coset_vs_naive(self):
        shift = bb.GENERATOR
        mat = rand_mat(16, 4)
        got = from_dev(radix2.coset_dft_batch(to_dev(mat), shift))
        want = naive_dft_matrix(mat, shift)
        np.testing.assert_array_equal(got, want)

    def test_idft_roundtrip(self):
        mat = rand_mat(128, 7)
        dev = to_dev(mat)
        back = from_dev(radix2.idft_batch(radix2.dft_batch(dev)))
        np.testing.assert_array_equal(back, mat)

    def test_coset_idft_roundtrip(self):
        mat = rand_mat(64, 3)
        dev = to_dev(mat)
        back = from_dev(radix2.coset_idft_batch(radix2.coset_dft_batch(dev, 31), 31))
        np.testing.assert_array_equal(back, mat)

    def test_dft_of_constant_column(self):
        # poly = c has evals all c; dft of coeff column [c,0,...] = [c*h? no —
        # out[i] = c for coeffs [c,0..]; also dft of evals-of-x: identity checks
        h = 16
        c = 12345
        mat = np.zeros((h, 1), dtype=np.uint32)
        mat[0, 0] = c
        got = from_dev(radix2.dft_batch(to_dev(mat)))
        np.testing.assert_array_equal(got, np.full((h, 1), c, dtype=np.uint32))

    def test_lde_agrees_on_subgroup(self):
        """coset LDE with shift=1: rows i<<added_bits of output reproduce input."""
        h, w, bits = 32, 4, 2
        mat = rand_mat(h, w)
        lde = from_dev(radix2.coset_lde_batch(to_dev(mat), bits, 1))
        np.testing.assert_array_equal(lde[:: 1 << bits], mat)

    def test_coset_lde_vs_naive(self):
        h, w, bits = 8, 2, 2
        shift = bb.GENERATOR
        mat = rand_mat(h, w)
        got = from_dev(radix2.coset_lde_batch(to_dev(mat), bits, shift))
        # oracle: interpolate = naive idft, then naive dft on big coset
        coeffs = from_dev(radix2.idft_batch(to_dev(mat)))
        padded = np.zeros((h << bits, w), dtype=np.uint32)
        padded[:h] = coeffs
        want = naive_dft_matrix(padded, shift)
        np.testing.assert_array_equal(got, want)


class TestDftFacade:
    def test_cpu_backend(self):
        mat = rand_mat(16, 2)
        dft = Dft(backend="cpu")
        got = from_dev(dft.dft_batch(to_dev(mat)))
        np.testing.assert_array_equal(got, naive_dft_matrix(mat))

    def test_tpu_falls_back_silently_with_error_channel(self):
        # On the CPU-only test runner there is no TPU: the tpu backend must
        # still succeed (silent fallback) and record a queryable error
        # (gpu_dft.rs:94-115 semantics).
        registry.take_last_error()
        mat = rand_mat(8, 2)
        dft = Dft(backend="tpu")
        got = from_dev(dft.dft_batch(to_dev(mat)))
        np.testing.assert_array_equal(got, naive_dft_matrix(mat))
        err = registry.take_last_error()
        assert err is not None and "tpu" in err
        assert registry.take_last_error() is None  # popped

    def test_global_backend_knob(self):
        registry.set_backend("cpu")
        assert Dft().backend.value == "cpu"
        registry.set_backend("tpu")
        assert Dft().backend.value == "tpu"
        registry.set_backend("cpu")

    def test_unknown_backend_rejected(self):
        import pytest

        with pytest.raises(ValueError, match="unknown backend"):
            registry.set_backend("metal-ish")


class TestFourStep:
    """OPT-0016: the pure-VPU four-step decomposition must agree exactly with
    the plain stage loop (it replaces it for tall-narrow accelerator inputs —
    the commit-path shapes at 2^20+, e.g. (2^23, 2))."""

    def test_vs_plain_dft(self):
        for log_h in (2, 3, 6, 7, 10):
            h = 1 << log_h
            for w in (1, 2, 5):
                mat = rand_mat(h, w)
                got = from_dev(radix2._four_step_core(log_h, False, to_dev(mat)))
                want = from_dev(radix2._dit_core(
                    log_h, to_dev(mat),
                    *radix2._stage_twiddles(log_h, False)))
                np.testing.assert_array_equal(
                    got, want, err_msg=f"log_h={log_h} w={w}")

    def test_vs_naive(self):
        mat = rand_mat(64, 3)
        got = from_dev(radix2._four_step_core(6, False, to_dev(mat)))
        np.testing.assert_array_equal(got, naive_dft_matrix(mat))

    def test_inverse_roundtrip(self):
        log_h = 8
        mat = rand_mat(1 << log_h, 2)
        fwd = radix2._four_step_core(log_h, False, to_dev(mat))
        back = radix2._four_step_core(log_h, True, fwd)
        h_inv = bb.monty_scalar(pow(1 << log_h, bb.P - 2, bb.P))
        np.testing.assert_array_equal(from_dev(bb.mul(back, h_inv)), mat)

    def test_transposed_core_matches(self):
        """(w,h)-boundary variant (`_four_step_core_T`, the big-narrow layout
        detour — _r5_logs/narrow_layout_probe.md) is bit-identical to the
        (h,w) core on both directions."""
        for log_h, w in ((6, 1), (7, 2), (10, 5)):
            mat = rand_mat(1 << log_h, w)
            for inverse in (False, True):
                want = from_dev(radix2._four_step_core(log_h, inverse, to_dev(mat)))
                got_t = radix2._four_step_core_T(log_h, inverse, to_dev(mat).T)
                np.testing.assert_array_equal(
                    from_dev(got_t).T, want, err_msg=f"log_h={log_h} w={w} inv={inverse}")
