"""End-to-end uni-stark prove+verify (milestone M1 — SURVEY.md par7.1 step 9:
fib_air n=2^3, zk, self-verify)."""

import numpy as np
import pytest

from tpu_stark.air.fibonacci import FibonacciAir, fibonacci_value, generate_trace_rows
from tpu_stark.prover.config import create_config
from tpu_stark.prover.proof import deserialize_proof, serialize_proof
from tpu_stark.prover.prove import get_log_quotient_degree, prove
from tpu_stark.prover.verify import verify


class TestSymbolicSizing:
    def test_fib_quotient_degree(self):
        air = FibonacciAir()
        assert get_log_quotient_degree(air, 3, zk=False) == 0  # d=2 -> 1 chunk
        assert get_log_quotient_degree(air, 3, zk=True) == 1  # d=3 -> 2 chunks


class TestFibAirZk:
    """The reference workload: n=2^3, x=fib target 21, pis=[0,1,21],
    log_blowup=2, hiding (fib_air.rs:27-75; success contract 'fib_air zk ok')."""

    def test_prove_verify_roundtrip_zk(self):
        air = FibonacciAir()
        n = 8
        a, b = 0, 1
        x = fibonacci_value(a, b, n)
        assert x == 21  # the reference's public value (fib_air.rs:68)
        trace = generate_trace_rows(a, b, n)
        pis = [a, b, x]
        config = create_config(zk=True, backend="cpu")
        proof = prove(config, air, trace, pis)
        assert verify(create_config(zk=True, backend="cpu"), air, proof, pis)

    def test_prove_verify_roundtrip_plain(self):
        air = FibonacciAir()
        n = 8
        trace = generate_trace_rows(0, 1, n)
        pis = [0, 1, 21]
        config = create_config(zk=False, backend="cpu")
        proof = prove(config, air, trace, pis)
        assert verify(create_config(zk=False, backend="cpu"), air, proof, pis)

    def test_wrong_public_value_rejected(self):
        air = FibonacciAir()
        trace = generate_trace_rows(0, 1, 8)
        config = create_config(zk=True, backend="cpu")
        proof = prove(config, air, trace, [0, 1, 21])
        assert not verify(create_config(zk=True, backend="cpu"), air, proof, [0, 1, 22])

    def test_tampered_trace_rejected(self):
        air = FibonacciAir()
        trace = generate_trace_rows(0, 1, 8)
        trace[3, 0] = 999  # break the recurrence
        config = create_config(zk=True, backend="cpu")
        proof = prove(config, air, trace, [0, 1, 21])
        assert not verify(create_config(zk=True, backend="cpu"), air, proof, [0, 1, 21])

    def test_tampered_opened_value_rejected(self):
        air = FibonacciAir()
        trace = generate_trace_rows(0, 1, 8)
        config = create_config(zk=True, backend="cpu")
        proof = prove(config, air, trace, [0, 1, 21])
        tl = list(proof.opened_values.trace_local)
        tl[0] = tuple((tl[0][0] + 1) % 2013265921 if i == 0 else tl[0][i] for i in range(4))
        proof.opened_values.trace_local = tl
        assert not verify(create_config(zk=True, backend="cpu"), air, proof, [0, 1, 21])

    def test_proof_determinism_and_serde(self):
        air = FibonacciAir()
        trace = generate_trace_rows(0, 1, 8)
        p1 = prove(create_config(zk=True, backend="cpu"), air, trace, [0, 1, 21])
        p2 = prove(create_config(zk=True, backend="cpu"), air, trace, [0, 1, 21])
        b1, b2 = serialize_proof(p1), serialize_proof(p2)
        assert b1 == b2  # deterministic prover (seeded hiding randomness)
        p3 = deserialize_proof(b1)
        assert serialize_proof(p3) == b1
        assert verify(create_config(zk=True, backend="cpu"), air, p3, [0, 1, 21])

    @pytest.mark.slow  # multi-second prove: slow tier (docs/testing.md)
    def test_larger_trace(self):
        air = FibonacciAir()
        n = 64
        x = fibonacci_value(0, 1, n)
        trace = generate_trace_rows(0, 1, n)
        config = create_config(zk=True, backend="cpu")
        proof = prove(config, air, trace, [0, 1, x])
        assert verify(create_config(zk=True, backend="cpu"), air, proof, [0, 1, x])

    def test_nonzero_final_poly_len(self):
        """FRI may stop folding early and ship a longer final polynomial:
        log_final_poly_len > 0 raises log_min (pcs.py:475), shortens the
        commit phase, and the verifier evaluates the shipped coefficients."""
        from tpu_stark.fri.config import FriParameters

        air = FibonacciAir()
        n = 8  # n=8 shares every committed shape with the other zk tests
        # (only the fold-chain tail differs); still folds 2 levels early and
        # ships 4 final coefficients
        x = fibonacci_value(0, 1, n)
        trace = generate_trace_rows(0, 1, n)
        fri = FriParameters(
            log_blowup=2, log_final_poly_len=2, num_queries=2, proof_of_work_bits=1
        )
        proof = prove(create_config(fri, zk=True, backend="cpu"), air, trace, [0, 1, x])
        fp = proof.opening_proof
        assert len(fp.final_poly) == 4  # 2^log_final_poly_len
        assert verify(create_config(fri, zk=True, backend="cpu"), air, proof, [0, 1, x])
        # shipping fewer folds must not weaken the check: tampered final poly
        fp.final_poly[1] = tuple((c + 1) % 2013265921 for c in fp.final_poly[1])
        assert not verify(
            create_config(fri, zk=True, backend="cpu"), air, proof, [0, 1, x]
        )

    def test_zk_proofs_do_not_leak_trace(self):
        """Opened trace values under zk differ from the plain trace polynomial's
        values (the randomizer actually masks)."""
        air = FibonacciAir()
        trace = generate_trace_rows(0, 1, 8)
        zkp = prove(create_config(zk=True, backend="cpu"), air, trace, [0, 1, 21])
        plain = prove(create_config(zk=False, backend="cpu"), air, trace, [0, 1, 21])
        assert zkp.opened_values.trace_local != plain.opened_values.trace_local


@pytest.mark.slow  # multi-second prove: slow tier (docs/testing.md)
def test_lowmem_open_byte_identical(monkeypatch):
    """Low-memory open (release codewords post-fold, recompute query rows
    from coefficients) must not change a byte of the proof."""
    from tpu_stark.air.fibonacci import FibonacciAir, generate_trace_rows
    from tpu_stark.prover.config import create_config
    from tpu_stark.prover.proof import serialize_proof
    from tpu_stark.prover.prove import prove
    from tpu_stark.prover.verify import verify

    air = FibonacciAir()
    trace = generate_trace_rows(0, 1, 16)
    pis = [0, 1, int(trace[-1, 1])]

    def run():
        return prove(
            create_config(zk=True, backend="cpu", zk_rng="smallrng"),
            air, trace, pis,
        )

    monkeypatch.setenv("TPU_STARK_LOWMEM_LOG", "0")
    base = serialize_proof(run())
    monkeypatch.setenv("TPU_STARK_LOWMEM_LOG", "2")
    lowmem_proof = run()
    assert serialize_proof(lowmem_proof) == base
    assert verify(
        create_config(zk=True, backend="cpu", zk_rng="smallrng"),
        air, lowmem_proof, pis,
    )
