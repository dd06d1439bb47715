"""Low-memory commitment levers (commit/lowmem.py): lazy device-rng salts and
dropped leaf digest layers must be byte-invisible — identical roots, openings,
and whole proofs vs. the eager path at heights where both fit.

These are the 2^24 single-chip levers (BENCH_LOCAL.md scale notes); here they
are forced on at tiny heights via TPU_STARK_LOWMEM_LOG.
"""

import numpy as np
import pytest

from tpu_stark.commit.merkle import MerkleTreeMmcs
from tpu_stark.compat.device_rng import DeviceRng
from tpu_stark.fields import babybear as bb


def _commit_open(monkeypatch, lowmem_log, h, w, indices, layers=3):
    if lowmem_log is None:
        monkeypatch.setenv("TPU_STARK_LOWMEM_LOG", "0")
    else:
        monkeypatch.setenv("TPU_STARK_LOWMEM_LOG", str(lowmem_log))
        monkeypatch.setenv("TPU_STARK_LOWMEM_LAYERS", str(layers))
    rng = np.random.default_rng(7)
    mat = bb.np_to_monty(rng.integers(0, bb.P, size=(h, w), dtype=np.uint32))
    import jax.numpy as jnp

    mmcs = MerkleTreeMmcs(hiding=True, rng=DeviceRng(1, "salts"))
    root, data = mmcs.commit([jnp.asarray(mat)])
    openings = mmcs.open_batch_many(indices, data)
    return root, data, openings, mmcs


@pytest.mark.parametrize("layers", [1, 3])
def test_merkle_lowmem_matches_eager(monkeypatch, layers):
    h, w = 64, 5
    indices = [0, 1, 17, 62, 63, 17]
    r_eager, d_eager, o_eager, _ = _commit_open(monkeypatch, None, h, w, indices)
    r_lm, d_lm, o_lm, mmcs = _commit_open(
        monkeypatch, 4, h, w, indices, layers=layers
    )
    assert d_eager.dropped_layers == 0
    assert d_lm.dropped_layers == layers
    assert hasattr(d_lm.salts[0], "materialize")  # lazy descriptor retained
    assert r_lm == r_eager
    for oe, ol in zip(o_eager, o_lm):
        assert ol.proof == oe.proof
        for a, b in zip(oe.opened_values, ol.opened_values):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(oe.opened_salts, ol.opened_salts):
            np.testing.assert_array_equal(a, b)
    # openings verify against the commitment
    for i, op in zip(indices, o_lm):
        assert mmcs.verify_batch(r_lm, [(h, w)], i, op)


@pytest.mark.slow  # multi-second prove: slow tier (docs/testing.md)
def test_lowmem_prove_byte_identical(monkeypatch):
    """Full fib_air zk prove with lowmem forced on at 2^6 committed rows:
    every tree takes the lazy-salt + dropped-layer + lazy-codeword path, and
    the proof bytes match the eager prove exactly."""
    from tpu_stark.air.fibonacci import FibonacciAir, generate_trace_rows
    from tpu_stark.prover.config import create_config
    from tpu_stark.prover.proof import serialize_proof
    from tpu_stark.prover.prove import prove
    from tpu_stark.prover.verify import verify

    air = FibonacciAir()
    trace = generate_trace_rows(0, 1, 32)
    pis = [0, 1, int(trace[-1, 1])]

    monkeypatch.setenv("TPU_STARK_LOWMEM_LOG", "0")
    proof_eager = prove(create_config(zk=True), air, trace, pis)

    monkeypatch.setenv("TPU_STARK_LOWMEM_LOG", "6")
    monkeypatch.setenv("TPU_STARK_LOWMEM_LAYERS", "3")
    cfg = create_config(zk=True)
    proof_lm = prove(cfg, air, trace, pis)
    assert serialize_proof(proof_lm) == serialize_proof(proof_eager)
    assert verify(cfg, air, proof_lm, pis)
