"""The application API — the reference's JNI surface reborn as Python.

Exactly the four entry points the reference exports across JNI
(``/root/reference/native/src/lib.rs:37-179``), with the same contracts:

* ``set_backend(name)``          — lib.rs:133-146 / gpu_dft.rs:53-63
* ``is_tpu_available()``         — the isVulkanAvailable probe, lib.rs:166-179
* ``run_fib_air_zk()``           — prove+verify round trip; returns
  ``"fib_air zk ok (n=8, x=21)"`` on success or ``"fib_air zk failed: ..."``
  (fib_air.rs:27-75, lib.rs:37-85); never raises (panic containment,
  lib.rs:45-59); appends any stashed backend error (lib.rs:60-63)
* ``run_dft_benchmark()``        — the 11-case report (fib_air.rs:98-222)
"""

from __future__ import annotations

import traceback

from ..air.fibonacci import FibonacciAir, fibonacci_value, generate_trace_rows
from ..backend import registry
from ..bench.harness import run_dft_benchmark as _bench
from ..prover.config import create_config
from ..prover.prove import prove
from ..prover.verify import verify


def set_backend(name: str) -> None:
    registry.set_backend(name)


def is_tpu_available() -> bool:
    return registry.is_tpu_available()


def run_fib_air_zk(n: int = 8, hash: str = "keccak") -> str:
    """Prove + verify the Fibonacci AIR with zk, n rows, pis [0, 1, fib(n)]
    (defaults reproduce the reference exactly: n=2^3, x=21, Keccak stack,
    fib_air.rs:56-74; ``hash="poseidon2"`` uses the field-native stack)."""
    registry.take_last_error()  # drain stale errors from earlier, unrelated
    # work so the appended channel (lib.rs:60-63) reports only THIS run's
    try:
        air = FibonacciAir()
        a, b = 0, 1
        x = fibonacci_value(a, b, n)
        trace = generate_trace_rows(a, b, n)
        pis = [a, b, x]
        config = create_config(zk=True, hash=hash)
        proof = prove(config, air, trace, pis)
        ok = verify(create_config(zk=True, hash=hash), air, proof, pis)
        if not ok:
            result = "fib_air zk failed: verification rejected the proof"
        else:
            result = f"fib_air zk ok (n={n}, x={x})"
    except Exception as e:  # noqa: BLE001 — panic containment (lib.rs:45-59)
        result = f"fib_air zk panicked: {e}\n{traceback.format_exc(limit=3)}"
    err = registry.take_last_error()
    if err:
        result += f"\nbackend error: {err}"  # lib.rs:60-63
    return result


def run_dft_benchmark() -> str:
    try:
        return _bench()
    except Exception as e:  # noqa: BLE001
        return f"dft benchmark failed: {e}"


def run_keccak_air(log_n: int = 10) -> str:
    """Prove + verify the keccak-f permutation AIR at 2^log_n rows (BASELINE
    config 4 workload; >= the streaming threshold routes through the wide
    prover).  Same panic-containment contract as run_fib_air_zk."""
    registry.take_last_error()
    try:
        import numpy as np

        from ..air.keccak_air import NUM_ROUNDS, KeccakAir, generate_trace
        from ..prover.wide import prove_wide

        n = 1 << log_n
        trace = generate_trace(
            num_perms=max(1, n // NUM_ROUNDS), seed=1, dtype=np.uint8
        )[:n]
        proof = prove_wide(
            create_config(zk=False, hash="poseidon2"), KeccakAir(), trace, []
        )
        ok = verify(
            create_config(zk=False, hash="poseidon2"), KeccakAir(), proof, []
        )
        result = (
            f"keccak_air ok (rows=2^{log_n}, cols={KeccakAir.width})"
            if ok
            else "keccak_air failed: verification rejected the proof"
        )
    except Exception as e:  # noqa: BLE001
        result = f"keccak_air panicked: {e}\n{traceback.format_exc(limit=3)}"
    err = registry.take_last_error()
    if err:
        result += f"\nbackend error: {err}"
    return result


def run_poseidon2_chain(log_n: int = 10) -> str:
    """Prove + verify the Poseidon2 hash-chain AIR at 2^log_n rows (BASELINE
    config 3 workload)."""
    registry.take_last_error()
    try:
        from ..air.poseidon2_air import Poseidon2ChainAir, generate_trace

        trace, pis = generate_trace(1 << log_n, list(range(16)))
        proof = prove(
            create_config(zk=False, hash="poseidon2"),
            Poseidon2ChainAir(), trace, pis,
        )
        ok = verify(
            create_config(zk=False, hash="poseidon2"),
            Poseidon2ChainAir(), proof, pis,
        )
        result = (
            f"poseidon2_chain ok (rows=2^{log_n})"
            if ok
            else "poseidon2_chain failed: verification rejected the proof"
        )
    except Exception as e:  # noqa: BLE001
        result = f"poseidon2_chain panicked: {e}\n{traceback.format_exc(limit=3)}"
    err = registry.take_last_error()
    if err:
        result += f"\nbackend error: {err}"
    return result


# Typo-compat aliases: the reference ships two misspelled exports that
# forward to the real setBackend for old callers (``setBAckend`` and a
# ``com_plonk3`` JNI path, lib.rs:148-164); kept for surface parity.
set_bAckend = set_backend
setBAckend = set_backend
