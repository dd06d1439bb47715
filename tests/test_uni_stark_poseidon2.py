"""uni-stark over the Poseidon2 (field-native) commitment stack —
BASELINE config 1: fib_air prove+verify, BabyBear, 2^10 trace, Poseidon2
commit."""

import pytest

from tpu_stark.air.fibonacci import FibonacciAir, fibonacci_value, generate_trace_rows
from tpu_stark.prover.config import create_config
from tpu_stark.prover.proof import deserialize_proof, serialize_proof
from tpu_stark.prover.prove import prove
from tpu_stark.prover.verify import verify


@pytest.mark.slow  # multi-second prove: slow tier (docs/testing.md)
def test_fib_2_10_poseidon2_plain():
    air = FibonacciAir()
    n = 1 << 10
    x = fibonacci_value(0, 1, n)
    trace = generate_trace_rows(0, 1, n)
    cfg = create_config(zk=False, backend="cpu", hash="poseidon2")
    proof = prove(cfg, air, trace, [0, 1, x])
    assert verify(
        create_config(zk=False, backend="cpu", hash="poseidon2"),
        air, proof, [0, 1, x],
    )


def test_fib_small_poseidon2_zk_roundtrip_and_serde():
    air = FibonacciAir()
    n = 8
    trace = generate_trace_rows(0, 1, n)
    cfg = create_config(zk=True, backend="cpu", hash="poseidon2")
    proof = prove(cfg, air, trace, [0, 1, 21])
    v = create_config(zk=True, backend="cpu", hash="poseidon2")
    assert verify(v, air, proof, [0, 1, 21])
    blob = serialize_proof(proof)
    p2 = deserialize_proof(blob)
    assert serialize_proof(p2) == blob
    assert verify(
        create_config(zk=True, backend="cpu", hash="poseidon2"), air, p2, [0, 1, 21]
    )


def test_keccak_proof_rejected_by_poseidon2_verifier():
    air = FibonacciAir()
    trace = generate_trace_rows(0, 1, 8)
    kp = prove(create_config(zk=False, backend="cpu", hash="keccak"), air, trace, [0, 1, 21])
    assert not verify(
        create_config(zk=False, backend="cpu", hash="poseidon2"), air, kp, [0, 1, 21]
    )
