"""Poseidon2 hash-chain AIR: trace correctness + prove/verify round trip."""

import numpy as np

from tpu_stark.air.air import get_symbolic_info
from tpu_stark.air.poseidon2_air import COLS, Poseidon2ChainAir, generate_trace
from tpu_stark.fields import babybear as bb
from tpu_stark.hash import poseidon2
from tpu_stark.prover.config import create_config
from tpu_stark.prover.prove import get_log_quotient_degree, prove
from tpu_stark.prover.verify import verify
import pytest


def test_symbolic_info():
    air = Poseidon2ChainAir()
    count, degree = get_symbolic_info(air, 32)
    assert degree == 3  # cubic S-box constraints are unconditional
    assert count > 400
    assert get_log_quotient_degree(air, 32, zk=False) == 1  # 2 chunks


def test_trace_matches_permutation_chain():
    trace, pis = generate_trace(8, list(range(16)))
    assert trace.shape == (8, COLS)
    # row inputs follow the permutation chain
    state = list(range(16))
    for i in range(8):
        assert [int(v) for v in trace[i, :16]] == [s % bb.P for s in state]
        state = poseidon2.permute_host(state)
    assert pis[16:] == state  # final chain output
    # next-row input equals permute(this-row input)
    for i in range(7):
        want = poseidon2.permute_host([int(v) for v in trace[i, :16]])
        assert [int(v) for v in trace[i + 1, :16]] == want


@pytest.mark.slow  # multi-second prove: slow tier (docs/testing.md)
def test_prove_verify_roundtrip():
    air = Poseidon2ChainAir()
    trace, pis = generate_trace(8, [7] * 16)
    cfg = create_config(zk=False, backend="cpu", hash="poseidon2")
    proof = prove(cfg, air, trace, pis)
    assert verify(
        create_config(zk=False, backend="cpu", hash="poseidon2"), air, proof, pis
    )


@pytest.mark.slow  # XLA-CPU compile of the 493-col chain quotient
# dominates the default tier (~100 s); structural coverage stays in
# test_trace_matches_permutation_chain and prove-based coverage in
# this slow tier + the on-chip config-3 bench (BENCH_LOCAL r4)
def test_wrong_final_state_rejected():
    air = Poseidon2ChainAir()
    trace, pis = generate_trace(8, [7] * 16)
    cfg = create_config(zk=False, backend="cpu", hash="poseidon2")
    proof = prove(cfg, air, trace, pis)
    bad = list(pis)
    bad[16] = (bad[16] + 1) % bb.P
    assert not verify(
        create_config(zk=False, backend="cpu", hash="poseidon2"), air, proof, bad
    )


@pytest.mark.slow  # XLA-CPU compile of the 493-col chain quotient
# dominates the default tier (~100 s); structural coverage stays in
# test_trace_matches_permutation_chain and prove-based coverage in
# this slow tier + the on-chip config-3 bench (BENCH_LOCAL r4)
def test_tampered_sbox_witness_rejected():
    air = Poseidon2ChainAir()
    trace, pis = generate_trace(8, [3] * 16)
    trace = trace.copy()
    trace[2, 20] = (int(trace[2, 20]) + 1) % bb.P  # corrupt an aux y column
    cfg = create_config(zk=False, backend="cpu", hash="poseidon2")
    proof = prove(cfg, air, trace, pis)
    assert not verify(
        create_config(zk=False, backend="cpu", hash="poseidon2"), air, proof, pis
    )
