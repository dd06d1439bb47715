"""Streaming wide-trace prover (prover/wide.py) — differential vs dense.

The streaming path must be byte-identical to the dense prover wherever both
fit: same Merkle roots chunk-streamed vs one-shot, same quotient values
partition-streamed vs full-width, same transcript, same proof bytes.
"""

import numpy as np
import pytest

from tpu_stark.air.keccak_air import KeccakAir, generate_trace
from tpu_stark.commit.poseidon2_mmcs import Poseidon2Mmcs, hash_rows_batched
from tpu_stark.fields import babybear as bb
from tpu_stark.prover.config import create_config
from tpu_stark.prover.verify import verify
from tpu_stark.prover.wide import (
    WideMatrixSource,
    _absorb_chunk,
    commit_wide,
    partition_counts,
    prove_wide,
)


def test_partition_counts_cover_all_constraints():
    from tpu_stark.air.air import get_symbolic_info

    air = KeccakAir()
    total, _ = get_symbolic_info(air, 0)
    assert sum(partition_counts(air, 0)) == total


def test_partition_columns_are_sufficient():
    """Every partition must run against a sparse view holding only its
    declared columns — a foreign column access raises (None arithmetic)."""
    import jax.numpy as jnp

    from tpu_stark.air.values import DevVal
    from tpu_stark.prover.wide import _PartitionBuilder

    air = KeccakAir()
    n = 8
    sel = {
        "is_first_row": bb.monty_ones((n,)),
        "is_last_row": bb.monty_ones((n,)),
        "is_transition": bb.monty_ones((n,)),
    }
    for part in air.partitions():
        lde = bb.monty_ones((n, len(part.local_cols)))
        nxt = bb.monty_ones((n, max(1, len(part.next_cols))))[
            :, : len(part.next_cols)
        ]
        b = _PartitionBuilder(lde, nxt, part.local_cols, part.next_cols, sel, [])
        part.eval(b)  # raises if the declared footprint is too small
        assert b.constraint_count > 0


def test_streamed_absorb_matches_batched_hash():
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    mat = jnp.asarray(
        rng.integers(0, bb.P, size=(32, 52), dtype=np.uint32)
    )
    want = hash_rows_batched(mat)
    state = jnp.zeros((32, 16), dtype=bb.u32)
    for off, wc in ((0, 16), (16, 16), (32, 16), (48, 4)):
        state = _absorb_chunk(state, mat[:, off : off + wc])
    got = state[:, :8]
    assert np.array_equal(np.asarray(want), np.asarray(got))


@pytest.mark.slow  # interpret-mode Pallas: minutes on CPU (see test_pallas_*)
def test_pallas_absorb_carry_state_matches_batched_hash():
    """Interpret-mode check of the carry-state VMEM absorb kernel: chunked
    absorb_rows_transposed == one-shot hash_rows_batched."""
    import jax.numpy as jnp

    from tpu_stark.hash import pallas_poseidon2 as pp

    rng = np.random.default_rng(11)
    n, k = 256, 52
    mat = jnp.asarray(rng.integers(0, bb.P, size=(n, k), dtype=np.uint32))
    want = np.asarray(hash_rows_batched(mat))
    state_t = jnp.zeros((16, n), dtype=bb.u32)
    first = True
    for off, wc in ((0, 16), (16, 32), (48, 4)):
        mat_t = mat[:, off : off + wc].T
        k_pad = -(-wc // 8) * 8
        if k_pad > wc:
            mat_t = jnp.concatenate(
                [mat_t, jnp.zeros((k_pad - wc, n), dtype=bb.u32)], axis=0
            )
        state_t = pp.absorb_rows_transposed(
            state_t, mat_t, n_items=wc, first=first, interpret=True
        )
        first = False
    got = np.asarray(state_t[:8].T)
    assert np.array_equal(want, got)


def test_row_blocked_quotient_matches_unblocked():
    """The row-blocked quotient (r sub-sub-cosets per quotient coset, the
    (height x width) memory bound) must produce the exact chunk values of the
    unblocked streamed pass — including the next-row wraparound between
    blocks (trans/iota/flags partitions read next rows)."""
    import os

    import jax.numpy as jnp

    from tpu_stark.commit.pcs import TwoAdicFriPcs
    from tpu_stark.fields import extension as ext4
    from tpu_stark.fri.config import create_test_fri_params
    from tpu_stark.ntt.dft import Dft
    from tpu_stark.prover.prove import _register_air, get_log_quotient_degree
    from tpu_stark.prover.wide import quotient_chunks_streamed

    from tpu_stark.air.air import BaseAir
    from tpu_stark.air.keccak_air import COLS

    # Subset AIR: one partition per structural class (no-next wide, no-next,
    # next==local, next-disjoint) — full class coverage at 4 compiled
    # programs per run instead of ~10 (the full-AIR variant of this test ran
    # ~50 s; the structure, not the partition count, is what's under test)
    full = KeccakAir().partitions()
    keep = {"flags", "theta0", "apdef0", "trans1"}

    class SubsetAir(BaseAir):
        width = COLS

        def partitions(self):
            return [p for p in full if p.name in keep]

        def eval(self, b):
            for p in self.partitions():
                p.eval(b)

    air = SubsetAir()
    trace = generate_trace(num_perms=3, seed=12, dtype=np.uint8)
    n = trace.shape[0]
    pcs = TwoAdicFriPcs(
        Dft(backend="cpu"), create_test_fri_params(1), Poseidon2Mmcs(),
        Poseidon2Mmcs(),
    )
    domain = pcs.natural_domain_for_degree(n)
    src = WideMatrixSource(trace, pcs.dft, 1, domain)
    log_qd = get_log_quotient_degree(air, 0, False)
    rng = np.random.default_rng(2)
    apows = jnp.asarray(
        bb.np_to_monty(
            rng.integers(0, bb.P, size=(9000, 4), dtype=np.uint32)
        )
    )
    pis = jnp.asarray(np.zeros((0,), dtype=np.uint32))
    key = _register_air(air)

    def run():
        from tpu_stark.prover import wide

        wide._class_fn.cache_clear()  # force per-env-shape recompiles
        _, chunks = quotient_chunks_streamed(
            key, air, src, domain, log_qd, apows, pis, 0
        )
        return [np.asarray(c) for c in chunks]

    base = run()
    os.environ["TPU_STARK_QUOTIENT_MIN_BLOCK_LOG"] = "3"
    os.environ["TPU_STARK_QUOTIENT_PANEL_MB"] = "0"  # force max blocking
    try:
        blocked = run()
    finally:
        del os.environ["TPU_STARK_QUOTIENT_MIN_BLOCK_LOG"]
        del os.environ["TPU_STARK_QUOTIENT_PANEL_MB"]
    for a, b in zip(base, blocked):
        assert np.array_equal(a, b)


def test_streamed_commit_root_matches_dense():
    from tpu_stark.commit.pcs import TwoAdicFriPcs
    from tpu_stark.fri.config import create_test_fri_params
    from tpu_stark.ntt.dft import Dft

    rng = np.random.default_rng(3)
    trace = rng.integers(0, 2, size=(64, 40), dtype=np.uint32)
    pcs = TwoAdicFriPcs(
        Dft(backend="cpu"), create_test_fri_params(2), Poseidon2Mmcs(),
        Poseidon2Mmcs(),
    )
    domain = pcs.natural_domain_for_degree(64)
    import jax.numpy as jnp

    dense_root, _ = pcs.commit(
        [(domain, jnp.asarray(bb.np_to_monty(trace)))]
    )
    src = WideMatrixSource(
        trace.astype(np.uint8), pcs.dft, pcs.fri.log_blowup, domain,
        col_chunk=16,
    )
    wide_root, data = commit_wide(pcs, domain, src)
    assert tuple(dense_root) == tuple(wide_root)
    # row gather returns real LDE rows
    rows = src[np.array([0, 5, 255])]
    assert rows.shape == (3, 40)


@pytest.mark.slow
def test_wide_prove_matches_dense_and_verifies():
    from tpu_stark.prover.prove import prove
    from tpu_stark.prover.proof import serialize_proof

    air = KeccakAir()
    trace = generate_trace(num_perms=2, seed=5)

    def cfg():
        return create_config(zk=False, backend="cpu", hash="poseidon2")

    import os

    os.environ["TPU_STARK_WIDE_CHUNK"] = "1024"
    try:
        p_wide = prove_wide(cfg(), air, trace.astype(np.uint8), [])
        assert verify(cfg(), air, p_wide, [])
        p_dense = prove(cfg(), air, trace, [])
        assert serialize_proof(p_dense) == serialize_proof(p_wide)
    finally:
        del os.environ["TPU_STARK_WIDE_CHUNK"]


@pytest.mark.slow
def test_wide_prove_tampered_trace_rejected():
    air = KeccakAir()
    trace = generate_trace(num_perms=2, seed=6).astype(np.uint8)
    from tpu_stark.air.keccak_air import A_OFF

    trace[10, A_OFF + 123] ^= 1

    def cfg():
        return create_config(zk=False, backend="cpu", hash="poseidon2")

    proof = prove_wide(cfg(), air, trace, [])
    assert not verify(cfg(), air, proof, [])


def test_keccak_row_stream_matches_batched_hash():
    """Carry-state Keccak absorb over ragged/odd column chunks (rate blocks
    and u32 pairs straddling boundaries) == one-shot row hash."""
    import jax.numpy as jnp

    from tpu_stark.hash.sponge import KeccakRowStream, hash_field_rows_batched

    rng = np.random.default_rng(9)
    n, k = 16, 81  # 81 u32s: 41 u64 items = 2 full rate blocks + 7 carry
    mat = jnp.asarray(rng.integers(0, bb.P, size=(n, k), dtype=np.uint32))
    want = np.asarray(hash_field_rows_batched(mat, impl="xla"))
    stream = KeccakRowStream(n)
    for off, wc in ((0, 7), (7, 30), (37, 34), (71, 10)):  # odd widths too
        stream.absorb_cols(mat[:, off : off + wc])
    got = np.asarray(stream.finalize())
    assert np.array_equal(want, got)


def test_p2_row_stream_matches_batched_hash():
    import jax.numpy as jnp

    from tpu_stark.prover.wide import P2RowStream

    rng = np.random.default_rng(10)
    n, k = 16, 45  # non-multiple-of-8 chunks straddle rate blocks
    mat = jnp.asarray(
        bb.np_to_monty(rng.integers(0, bb.P, size=(n, k), dtype=np.uint32))
    )
    want = np.asarray(hash_rows_batched(mat))
    stream = P2RowStream(n)
    for off, wc in ((0, 5), (5, 18), (23, 22)):
        stream.absorb_cols(mat[:, off : off + wc])
    got = np.asarray(stream.finalize())
    assert np.array_equal(want, got)


def _keccak_pcs(hiding=False):
    from tpu_stark.commit.merkle import MerkleTreeMmcs
    from tpu_stark.commit.pcs import TwoAdicFriPcs
    from tpu_stark.compat.device_rng import DeviceRng
    from tpu_stark.fri.config import create_test_fri_params
    from tpu_stark.ntt.dft import Dft

    mmcs = MerkleTreeMmcs(hiding=hiding, rng=DeviceRng(1, "salts"))
    return TwoAdicFriPcs(
        Dft(backend="cpu"), create_test_fri_params(2), mmcs, None
    )


@pytest.mark.parametrize("hiding", [False, True])
def test_streamed_keccak_commit_root_matches_dense(hiding):
    """The reference's only stack is Keccak (fib_air.rs:28-51): the streamed
    commit must reproduce the dense hiding/plain Keccak root exactly."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    trace = rng.integers(0, 2, size=(64, 40), dtype=np.uint32)
    pcs = _keccak_pcs(hiding)
    domain = pcs.natural_domain_for_degree(64)
    dense_root, _ = pcs.commit([(domain, jnp.asarray(bb.np_to_monty(trace)))])
    pcs2 = _keccak_pcs(hiding)  # fresh salt rng stream
    src = WideMatrixSource(
        trace.astype(np.uint8), pcs2.dft, pcs2.fri.log_blowup, domain,
        col_chunk=16,
    )
    wide_root, data = commit_wide(pcs2, domain, src)
    assert tuple(dense_root) == tuple(wide_root)
    if hiding:
        assert hasattr(data.merkle.salts[0], "materialize")  # lazy lever


def test_streamed_zk_commit_root_matches_dense_single_chunk():
    """zk: single-chunk wide source draws the SAME randomizer as the dense
    prover (fold_in(key,0), full width) — identical T' commitment."""
    import jax.numpy as jnp

    from tpu_stark.compat.device_rng import make_zk_rng

    rng = np.random.default_rng(4)
    n, w = 32, 24
    trace = rng.integers(0, 2, size=(n, w), dtype=np.uint32)
    pcs = _keccak_pcs(hiding=True)
    trace_domain = pcs.natural_domain_for_degree(n)
    # dense construction (prove.py): coeffs2 = [idft(T) - r ; r]
    trace_dev = jnp.asarray(bb.np_to_monty(trace))
    r = jnp.asarray(make_zk_rng("device", 1, "trace").sample_babybear_matrix_monty(n, w))
    coeffs = pcs.dft.idft_batch(trace_dev)
    coeffs2 = jnp.concatenate([bb.sub(coeffs, r), r], axis=0)
    committed_domain = pcs.natural_domain_for_degree(2 * n)
    dense_root, _ = pcs.commit([(committed_domain, pcs.dft.dft_batch(coeffs2))])

    pcs2 = _keccak_pcs(hiding=True)
    src = WideMatrixSource(
        trace.astype(np.uint8), pcs2.dft, pcs2.fri.log_blowup, trace_domain,
        col_chunk=24, zk_seed=1,
    )
    assert src.n_committed == 2 * n
    wide_root, _ = commit_wide(pcs2, committed_domain, src)
    assert tuple(dense_root) == tuple(wide_root)


@pytest.mark.slow
def test_wide_zk_prove_verifies():
    """End-to-end zk streamed prove (Poseidon2 stack, keccak-air columns)."""
    from tpu_stark.prover.prove import prove
    from tpu_stark.prover.proof import serialize_proof

    air = KeccakAir()
    trace = generate_trace(num_perms=2, seed=7)

    def cfg():
        return create_config(zk=True, backend="cpu", hash="poseidon2")

    import os

    os.environ["TPU_STARK_WIDE_CHUNK"] = "4096"  # single chunk: match dense
    try:
        p_wide = prove_wide(cfg(), air, trace.astype(np.uint8), [])
        assert verify(cfg(), air, p_wide, [])
        p_dense = prove(cfg(), air, trace, [])
        assert serialize_proof(p_dense) == serialize_proof(p_wide)
    finally:
        del os.environ["TPU_STARK_WIDE_CHUNK"]


@pytest.mark.slow
def test_wide_zk_keccak_stack_prove_verifies():
    """zk + Keccak stack + multi-chunk streaming: verifies (wide-only
    randomizer layout — no dense twin at multi-chunk)."""
    air = KeccakAir()
    trace = generate_trace(num_perms=2, seed=8).astype(np.uint8)

    def cfg():
        return create_config(zk=True, backend="cpu", hash="keccak")

    import os

    os.environ["TPU_STARK_WIDE_CHUNK"] = "1024"
    try:
        proof = prove_wide(cfg(), air, trace, [])
        assert verify(cfg(), air, proof, [])
    finally:
        del os.environ["TPU_STARK_WIDE_CHUNK"]
