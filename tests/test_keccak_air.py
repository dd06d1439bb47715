"""Keccak-f permutation AIR tests."""

import numpy as np
import pytest

from tpu_stark.air.air import get_symbolic_info
from tpu_stark.air.keccak_air import COLS, KeccakAir, generate_trace
from tpu_stark.hash.keccak import keccak_f
from tpu_stark.prover.config import create_config
from tpu_stark.prover.prove import prove
from tpu_stark.prover.verify import verify


def test_symbolic_info():
    air = KeccakAir()
    count, degree = get_symbolic_info(air, 0)
    assert degree == 4
    assert count > 7000


def test_trace_rows_follow_keccak_rounds():
    trace = generate_trace(num_perms=1, seed=3)
    assert trace.shape == (32, COLS)
    from tpu_stark.air.keccak_air import A_OFF, NUM_ROUNDS, _one_round

    # reconstruct the round-0 state from bits and replay 24 rounds
    def state_of(row):
        bits = trace[row, A_OFF : A_OFF + 1600]
        return [
            sum(int(bits[l * 64 + z]) << z for z in range(64)) for l in range(25)
        ]

    s = state_of(0)
    for r in range(NUM_ROUNDS - 1):
        s = _one_round(s, r)
        assert state_of(r + 1) == s
    # full permutation agrees with the production keccak_f
    assert _one_round(s, NUM_ROUNDS - 1) == keccak_f(state_of(0))


@pytest.mark.slow
def test_prove_verify_roundtrip():
    air = KeccakAir()
    trace = generate_trace(num_perms=1, seed=1)
    cfg = create_config(zk=False, backend="cpu", hash="poseidon2")
    proof = prove(cfg, air, trace, [])
    assert verify(
        create_config(zk=False, backend="cpu", hash="poseidon2"), air, proof, []
    )


@pytest.mark.slow
def test_tampered_bit_rejected():
    air = KeccakAir()
    trace = generate_trace(num_perms=1, seed=2).copy()
    from tpu_stark.air.keccak_air import A_OFF

    trace[5, A_OFF + 77] ^= 1
    cfg = create_config(zk=False, backend="cpu", hash="poseidon2")
    proof = prove(cfg, air, trace, [])
    assert not verify(
        create_config(zk=False, backend="cpu", hash="poseidon2"), air, proof, []
    )
