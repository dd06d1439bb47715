"""zk_layout="p3" — the add_random_cols hiding layout (docs/so_evidence.md §3).

Every hiding commit appends 4 random columns to each matrix; opened rows are
wider and the random columns ride the FRI reduced opening.  Beyond the golden
fixtures (test_golden_transcript.py) this exercises the layout with the
device rng, a non-fixture size, and a soundness tamper.
"""

import dataclasses

import pytest

from tpu_stark.air.fibonacci import FibonacciAir, generate_trace_rows
from tpu_stark.prover.config import create_config
from tpu_stark.prover.proof import deserialize_proof, serialize_proof
from tpu_stark.prover.prove import prove
from tpu_stark.prover.verify import verify


def _prove(n=32, **cfg_kw):
    trace = generate_trace_rows(0, 1, n)
    pis = [0, 1, int(trace[-1, 1])]
    cfg = create_config(zk=True, zk_layout="p3", **cfg_kw)
    return cfg, FibonacciAir(), prove(cfg, FibonacciAir(), trace, pis), pis


@pytest.mark.slow  # multi-second prove: slow tier (docs/testing.md)
def test_p3_layout_roundtrip_device_rng():
    cfg, air, proof, pis = _prove()
    # committed trace rows carry width + 4 opened values
    assert len(proof.opened_values.trace_local) == air.width + 4
    assert all(len(c) == 8 for c in proof.opened_values.quotient_chunks)
    assert verify(cfg, air, proof, pis)
    # serde roundtrip preserves the wider rows
    blob = serialize_proof(proof)
    assert verify(cfg, air, deserialize_proof(blob), pis)


@pytest.mark.slow  # p3-layout default coverage = the golden transcript
# fixture prove (test_golden_transcript.py[p3]); tamper variant slow-tier
def test_p3_layout_soundness_tamper():
    cfg, air, proof, pis = _prove()
    bad_local = list(proof.opened_values.trace_local)
    t = tuple((int(c) + 1) % 0x78000001 for c in bad_local[0])
    bad_local[0] = t
    bad = dataclasses.replace(
        proof,
        opened_values=dataclasses.replace(
            proof.opened_values, trace_local=bad_local
        ),
    )
    assert not verify(cfg, air, bad, pis)


def test_p3_layout_rejected_by_tpu_layout_verifier():
    cfg, air, proof, pis = _prove()
    cfg_tpu = create_config(zk=True)
    assert not verify(cfg_tpu, air, proof, pis)
