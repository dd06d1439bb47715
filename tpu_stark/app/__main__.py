"""CLI — the MainActivity analog (``app/src/main/java/com/plonky3/android/
MainActivity.kt:22-46``): select backend -> probe -> prove -> benchmark,
concatenating the result strings, but as a terminal program.

Usage: ``python -m tpu_stark.app [--backend tpu|cpu|interpret] [fib] [bench]``
(no workload args = run both, like the reference's startup sequence).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    # persistent compilation cache: repeat runs skip the tunnel compiles
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_stark_jit_cache")

    parser = argparse.ArgumentParser(prog="tpu_stark")
    parser.add_argument("--backend", default="tpu", help="tpu|cpu|interpret")
    parser.add_argument("--n", type=int, default=8, help="fib trace length")
    parser.add_argument(
        "--hash", default="keccak", help="commitment stack: keccak|poseidon2"
    )
    parser.add_argument(
        "--profile",
        default=None,
        metavar="DIR",
        help="capture a jax.profiler device trace into DIR (bench/profiling.py)",
    )
    parser.add_argument(
        "--log-n", type=int, default=10,
        help="log2 rows for the keccak/poseidon2 AIR workloads",
    )
    parser.add_argument(
        "workloads", nargs="*", default=[],
        help="any of: fib bench keccak-air poseidon2-chain (default: fib bench)",
    )
    args = parser.parse_args(argv)

    from ..bench.profiling import env_trace_dir, maybe_trace
    from . import api

    try:
        api.set_backend(args.backend)  # MainActivity.kt:30
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    out = [f"tpu available: {api.is_tpu_available()}"]  # MainActivity.kt:31
    workloads = args.workloads or ["fib", "bench"]
    with maybe_trace(args.profile or env_trace_dir()):
        if "fib" in workloads:
            out.append(api.run_fib_air_zk(args.n, hash=args.hash))  # MainActivity.kt:33
        if "bench" in workloads:
            out.append(api.run_dft_benchmark())  # MainActivity.kt:35
        if "keccak-air" in workloads:
            out.append(api.run_keccak_air(args.log_n))
        if "poseidon2-chain" in workloads:
            out.append(api.run_poseidon2_chain(args.log_n))
    print("\n\n".join(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
