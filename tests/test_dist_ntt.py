"""Distributed NTT vs the single-device kernel, on the virtual 8-device mesh.

Every sharded transform must be bit-identical to the ntt/radix2.py reference
composed with the appropriate bit-reversal (the sharded pipeline's committed
frame IS the bit-reversed frame)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_stark.dist import ntt as dntt
from tpu_stark.fields import babybear as bb
from tpu_stark.matrix import reverse_matrix_index_bits
from tpu_stark.ntt import radix2


def _rand(h, w, seed=0):
    return jnp.asarray(
        bb.np_to_monty(
            np.random.default_rng(seed).integers(0, bb.P, size=(h, w)).astype(np.uint32)
        )
    )


@pytest.mark.parametrize("n_dev", [1, 4, 8])
@pytest.mark.parametrize("h,w", [(64, 3), (256, 8), (1024, 2)])
def test_dft_br_matches_single_device(n_dev, h, w):
    mesh = dntt.make_row_mesh(n_dev)
    x = _rand(h, w)
    got = np.asarray(dntt.dft_br_fn(mesh, h.bit_length() - 1)(x))
    want = np.asarray(reverse_matrix_index_bits(radix2.dft_batch(x)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n_dev", [4, 8])
@pytest.mark.parametrize("h,w", [(64, 3), (512, 5)])
def test_idft_from_br_matches_single_device(n_dev, h, w):
    mesh = dntt.make_row_mesh(n_dev)
    x = _rand(h, w, seed=1)
    x_br = reverse_matrix_index_bits(x)
    got = np.asarray(dntt.idft_from_br_fn(mesh, h.bit_length() - 1)(x_br))
    want = np.asarray(radix2.idft_batch(x))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n_dev", [1, 4, 8])
def test_bitrev_reshard(n_dev):
    mesh = dntt.make_row_mesh(n_dev)
    h, w = 128, 3
    x = _rand(h, w, seed=2)
    f = dntt.bitrev_reshard_fn(mesh, 7)
    got = np.asarray(f(x))
    want = np.asarray(reverse_matrix_index_bits(x))
    np.testing.assert_array_equal(got, want)
    # involution
    np.testing.assert_array_equal(np.asarray(f(f(x))), np.asarray(x))


@pytest.mark.parametrize("n_dev", [4, 8])
def test_scale_rows_by_powers(n_dev):
    mesh = dntt.make_row_mesh(n_dev)
    h, w = 64, 2
    x = _rand(h, w, seed=3)
    base = 31
    got = np.asarray(dntt.scale_rows_by_powers_fn(mesh, 6, base)(x))
    pows = bb.powers_monty(base, h)
    want = np.asarray(bb.mul(x, pows[:, None]))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n_dev", [1, 8])
@pytest.mark.parametrize("added_bits,shift", [(1, bb.GENERATOR), (2, bb.GENERATOR)])
def test_coset_lde_br_matches_single_device(n_dev, added_bits, shift):
    mesh = dntt.make_row_mesh(n_dev)
    h, w = 128, 4
    x = _rand(h, w, seed=4)
    got = np.asarray(dntt.coset_lde_br(mesh, x, added_bits, shift))
    want = np.asarray(
        reverse_matrix_index_bits(radix2.coset_lde_batch(x, added_bits, shift))
    )
    np.testing.assert_array_equal(got, want)
