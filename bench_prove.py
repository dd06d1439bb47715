"""Prover-scale benchmark: fib_air prove wall-clock (BASELINE.json north-star
metric: "fib_air prove wall-clock at 2^20 trace").

Not the driver entry point (bench.py) — run manually:
    python bench_prove.py [log_n] [keccak|poseidon2] [zk|plain] [reps] [test|bench]
``test`` = create_test_fri_params (2 queries, 1 PoW bit — reference parity,
fib_air.rs:62); ``bench`` = create_benchmark_fri_params (100 queries, 16 PoW
bits — production grade). Prints phase timings + one summary JSON line.
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
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    hash_stack = sys.argv[2] if len(sys.argv) > 2 else "keccak"
    zk = (sys.argv[3] if len(sys.argv) > 3 else "zk") == "zk"

    from tpu_stark.air.fibonacci import FibonacciAir, fibonacci_value, generate_trace_rows
    from tpu_stark.fri.config import create_benchmark_fri_params, create_test_fri_params
    from tpu_stark.prover.config import create_config
    from tpu_stark.prover.prove import prove
    from tpu_stark.prover.verify import verify

    # reps=0: report the first (cold) run as the only sample — for scale
    # points where a second in-process prove would re-pay most of the wall
    # anyway and HBM is tight (2^24)
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    params = sys.argv[5] if len(sys.argv) > 5 else "test"
    # test params keep log_blowup=2 parity with the reference; production
    # uses log_blowup=1 + 100 queries + 16 grind bits (fri/config.py)
    fri = create_test_fri_params(2) if params == "test" else create_benchmark_fri_params(1)

    def config():
        return create_config(fri, zk=zk, hash=hash_stack)

    n = 1 << log_n
    t0 = time.time()
    trace = generate_trace_rows(0, 1, n)
    x = int(trace[-1, 1])
    pis = [0, 1, x]
    t_tracegen = time.time() - t0

    air = FibonacciAir()
    # warm run (compiles), then `reps` timed runs — the tunnel TPU is shared
    # infrastructure and individual wall-clocks drift; report every sample,
    # headline the min (least-contended)
    t0 = time.time()
    proof = prove(config(), air, trace, pis)
    t_first = time.time() - t0
    samples = []
    from tpu_stark.bench.profiling import env_trace_dir, maybe_trace

    with maybe_trace(env_trace_dir()):  # TPU_STARK_PROFILE=<dir> for a device trace
        for _ in range(reps):
            import gc

            gc.collect()  # drop the previous rep's device refs before re-proving
            t0 = time.time()
            proof = prove(config(), air, trace, pis)
            samples.append(round(time.time() - t0, 3))
    if not samples:  # reps=0: the cold run is the sample
        samples = [round(t_first, 3)]
    t0 = time.time()
    ok = verify(config(), air, proof, pis)
    t_verify = time.time() - t0
    assert ok, "verification failed"

    from tpu_stark.prover.proof import serialize_proof

    blob = serialize_proof(proof)
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats() or {}
        peak_gb = stats.get("peak_bytes_in_use", 0) / 2**30
    except Exception:  # noqa: BLE001 — not all platforms expose stats
        peak_gb = None
    # axon hides memory_stats: fall back to the live-array census peak
    # (retained arrays only — program temps invisible; a floor on true use)
    live_peak = None
    if not peak_gb:
        from tpu_stark.bench.profiling import live_array_gb, live_peak_gb

        live_array_gb()  # sample once more at end-of-prove
        live_peak = round(live_peak_gb(), 2)
    print(
        json.dumps(
            {
                "metric": f"fib_air_{'zk' if zk else 'plain'}_prove_2^{log_n}_{hash_stack}_{params}",
                "value": min(samples),
                "unit": "s",
                "samples": samples,
                "tracegen_s": round(t_tracegen, 3),
                "first_run_s": round(t_first, 3),
                "verify_s": round(t_verify, 3),
                "proof_bytes": len(blob),
                "peak_hbm_gb": round(peak_gb, 2) if peak_gb else None,
                "live_census_peak_gb": live_peak,
            }
        )
    )


if __name__ == "__main__":
    main()
