"""BASELINE config 3 benchmark: Poseidon2 hash-chain AIR, 2^18 trace,
blowup 4, Poseidon2 (field-native) commitment stack.

    python bench_poseidon2_chain.py [log_n]
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_stark_jit_cache")

# Stall forensics (the r3 2^18 fold-phase stall was undiagnosable without a
# stack): periodic all-thread dumps to stderr while the prove runs.
import faulthandler

faulthandler.dump_traceback_later(600, repeat=True)


def main() -> None:
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18

    from tpu_stark.air.poseidon2_air import Poseidon2ChainAir, generate_trace
    from tpu_stark.prover.config import create_config
    from tpu_stark.prover.prove import prove
    from tpu_stark.prover.verify import verify

    n = 1 << log_n
    t0 = time.time()
    trace, pis = generate_trace(n, list(range(16)))
    t_tracegen = time.time() - t0

    air = Poseidon2ChainAir()
    t0 = time.time()
    proof = prove(create_config(zk=False, hash="poseidon2"), air, trace, pis)
    t_first = time.time() - t0
    t0 = time.time()
    proof = prove(create_config(zk=False, hash="poseidon2"), air, trace, pis)
    t_prove = time.time() - t0
    t0 = time.time()
    ok = verify(create_config(zk=False, hash="poseidon2"), air, proof, pis)
    t_verify = time.time() - t0
    assert ok

    from tpu_stark.prover.proof import serialize_proof

    print(
        json.dumps(
            {
                "metric": f"poseidon2_chain_prove_2^{log_n}",
                "value": round(t_prove, 3),
                "unit": "s",
                "tracegen_s": round(t_tracegen, 3),
                "first_run_s": round(t_first, 3),
                "verify_s": round(t_verify, 3),
                "proof_bytes": len(serialize_proof(proof)),
            }
        )
    )


if __name__ == "__main__":
    main()
