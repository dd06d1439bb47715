"""BASELINE config 4 benchmark: keccak-f[1600] permutation AIR at 2^20 rows,
streamed wide-trace prover (3,608 bit columns; the committed LDE would be
~30 GB dense — prover/wide.py streams it through HBM).

    python bench_keccak_air.py [log_n] [test|bench] [reps]

``bench`` = production FRI params (blowup 1, 100 queries, 16 PoW bits);
``test`` = 2-query smoke params. Prints phase timings + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_stark_jit_cache")

import faulthandler

faulthandler.dump_traceback_later(600, repeat=True)  # stall forensics


def main() -> None:
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    params = sys.argv[2] if len(sys.argv) > 2 else "bench"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    import numpy as np

    from tpu_stark.air.keccak_air import NUM_ROUNDS, KeccakAir, generate_trace
    from tpu_stark.fri.config import (
        create_benchmark_fri_params,
        create_test_fri_params,
    )
    from tpu_stark.prover.config import create_config
    from tpu_stark.prover.proof import serialize_proof
    from tpu_stark.prover.verify import verify
    from tpu_stark.prover.wide import prove_wide

    fri = create_test_fri_params(2) if params == "test" else create_benchmark_fri_params(1)

    def config():
        return create_config(fri, zk=False, hash="poseidon2")

    n = 1 << log_n
    t0 = time.time()
    trace = generate_trace(num_perms=n // NUM_ROUNDS, seed=1, dtype=np.uint8)
    trace = trace[:n]
    t_tracegen = time.time() - t0

    air = KeccakAir()
    t0 = time.time()
    proof = prove_wide(config(), air, trace, [])
    t_first = time.time() - t0
    samples = []
    for _ in range(reps):
        t0 = time.time()
        proof = prove_wide(config(), air, trace, [])
        samples.append(round(time.time() - t0, 3))
    t0 = time.time()
    ok = verify(config(), air, proof, [])
    t_verify = time.time() - t0
    assert ok, "verification failed"

    blob = serialize_proof(proof)
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats() or {}
        peak_gb = stats.get("peak_bytes_in_use", 0) / 2**30
    except Exception:  # noqa: BLE001
        peak_gb = None
    print(
        json.dumps(
            {
                "metric": f"keccak_air_prove_2^{log_n}_{params}",
                "value": min(samples),
                "unit": "s",
                "samples": samples,
                "tracegen_s": round(t_tracegen, 3),
                "first_run_s": round(t_first, 3),
                "verify_s": round(t_verify, 3),
                "proof_bytes": len(blob),
                "trace_cols": int(trace.shape[1]),
                "peak_hbm_gb": round(peak_gb, 2) if peak_gb else None,
            }
        )
    )


if __name__ == "__main__":
    main()
