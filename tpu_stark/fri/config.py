"""FRI parameters (p3-fri ``FriParameters`` shape, SURVEY.md par2.2).

``create_test_fri_params(log_blowup=2)`` mirrors the reference's test-grade
configuration knob (``/root/reference/native/src/fib_air.rs:62``): small query
count + 1 grinding bit — fast but insecure, for parity/round-trip testing.
``create_benchmark_fri_params`` is the production-grade setting.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class FriParameters:
    log_blowup: int = 1
    log_final_poly_len: int = 0
    num_queries: int = 100
    proof_of_work_bits: int = 16

    @property
    def blowup(self) -> int:
        return 1 << self.log_blowup


def create_test_fri_params(log_blowup: int = 2) -> FriParameters:
    return FriParameters(
        log_blowup=log_blowup,
        log_final_poly_len=0,
        num_queries=2,
        proof_of_work_bits=1,
    )


def create_benchmark_fri_params(log_blowup: int = 1) -> FriParameters:
    return FriParameters(
        log_blowup=log_blowup,
        log_final_poly_len=0,
        num_queries=100,
        proof_of_work_bits=16,
    )
