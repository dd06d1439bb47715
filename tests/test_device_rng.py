"""Device zk-randomness stream (OPT-0014) — determinism, domain separation,
and prove/verify round trips in both zk_rng modes.

The hiding construction only needs a deterministic pseudorandom stream (the
reference itself uses a FIXED seed, fib_air.rs:50,65); what must hold is:
same (seed, stream, call index) -> same values regardless of backend/mesh
(byte-identical sharded proofs), distinct consumers -> distinct streams, and
uniform residues in [0, p).
"""

import numpy as np

from tpu_stark.compat.device_rng import DeviceRng, make_zk_rng
from tpu_stark.fields import babybear as bb
import pytest


def test_deterministic_across_instances():
    a = DeviceRng(1, "salts").sample_babybear_matrix_monty(64, 4)
    b = DeviceRng(1, "salts").sample_babybear_matrix_monty(64, 4)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_counter_advances_and_streams_separate():
    r = DeviceRng(1, "salts")
    first = np.asarray(r.sample_babybear_matrix_monty(64, 4))
    second = np.asarray(r.sample_babybear_matrix_monty(64, 4))
    assert not np.array_equal(first, second)
    other = np.asarray(DeviceRng(1, "codewords").sample_babybear_matrix_monty(64, 4))
    assert not np.array_equal(first, other)
    reseeded = np.asarray(DeviceRng(2, "salts").sample_babybear_matrix_monty(64, 4))
    assert not np.array_equal(first, reseeded)


def test_values_are_reduced_residues():
    vals = np.asarray(DeviceRng(7).sample_babybear_matrix_monty(1024, 4))
    assert vals.dtype == np.uint32
    assert int(vals.max()) < bb.P
    # crude uniformity: both halves of the range populated
    assert (vals > bb.P // 2).mean() > 0.4
    assert (vals < bb.P // 2).mean() > 0.4


def test_make_zk_rng_modes():
    dev = make_zk_rng("device", 1, "salts")
    host = make_zk_rng("smallrng", 1, "salts")
    assert type(dev).__name__ == "DeviceRng"
    assert type(host).__name__ == "SmallRng"


@pytest.mark.slow  # multi-second prove: slow tier (docs/testing.md)
def test_zk_prove_verify_both_modes():
    from tpu_stark.air.fibonacci import FibonacciAir, generate_trace_rows
    from tpu_stark.prover.config import create_config
    from tpu_stark.prover.proof import serialize_proof
    from tpu_stark.prover.prove import prove
    from tpu_stark.prover.verify import verify

    air = FibonacciAir()
    trace = generate_trace_rows(0, 1, 8)
    pis = [0, 1, int(trace[-1, 1])]
    blobs = {}
    for mode in ["device", "smallrng"]:
        cfg = create_config(zk=True, zk_rng=mode)
        proof = prove(cfg, air, trace, pis)
        assert verify(create_config(zk=True, zk_rng=mode), air, proof, pis), mode
        blobs[mode] = serialize_proof(proof)
    # different hiding streams -> different proof bytes, same layout/length
    assert blobs["device"] != blobs["smallrng"]
    assert len(blobs["device"]) == len(blobs["smallrng"])
