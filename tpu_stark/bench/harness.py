"""DFT benchmark harness — the reference's measurement protocol on TPU.

Mirrors ``run_dft_benchmark`` (``/root/reference/native/src/fib_air.rs:98-222``)
and its statistics (avg/median/p95 over repeats=10 after warmup=1,
``fib_air.rs:88-96,118-123``), with the reference's three measurement tiers
(BASELINE.md) mapped to TPU reality:

* ``cpu``          — XLA:CPU backend (the Radix2DitParallel fallback analog)
* ``tpu_e2e``      — host->device transfer + NTT + device->host readback per call
* ``tpu_e2e_batched`` — 4 NTTs amortized per dispatch (one jitted graph,
  the analog of 4 submits per command buffer, backend_vulkan.rs:1695-1987)
* ``tpu_kernel``   — device-resident compute only

After timing, the TPU output is differentially checked against the CPU path
and any silent fallback is promoted to an error (fib_air.rs:183-196).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..backend import registry
from ..fields import babybear as bb
from ..ntt import radix2

# The reference's case list (fib_air.rs:103-117).
DEFAULT_CASES: List[Tuple[int, int]] = [
    (256, 8),
    (1024, 8),
    (4096, 8),
    (16384, 8),
    (4096, 32),
    (16384, 32),
    (4096, 64),
    (4096, 128),
    (16384, 64),
    (16384, 128),
    (256, 16000),
]

REPEATS = 10
WARMUP = 1
E2E_BATCH = 4  # fib_air.rs:121


def benchmark_input(h: int, w: int) -> np.ndarray:
    """Deterministic values (i*17+3) mod p (fib_air.rs:77-86)."""
    n = h * w
    vals = (np.arange(n, dtype=np.uint64) * 17 + 3) % bb.P
    return vals.astype(np.uint32).reshape(h, w)


def percentile_ms(sorted_ms: List[float], pct: float) -> float:
    """Nearest-rank percentile (fib_air.rs:88-96)."""
    if not sorted_ms:
        return 0.0
    idx = min(len(sorted_ms) - 1, int(round(pct / 100.0 * (len(sorted_ms) - 1))))
    return sorted_ms[idx]


@dataclasses.dataclass
class Stats:
    avg_ms: float
    median_ms: float
    p95_ms: float

    @classmethod
    def from_times(cls, times_ms: List[float]) -> "Stats":
        s = sorted(times_ms)
        return cls(sum(s) / len(s), percentile_ms(s, 50), percentile_ms(s, 95))


def _time_repeats(fn: Callable[[], None], inner: int = 1) -> Stats:
    """Time ``fn`` REPEATS times (after WARMUP).  ``inner`` > 1 amortizes each
    sample over that many calls — the kernel tier queues ``inner`` dispatches
    before one device sync so per-dispatch tunnel/sync latency doesn't read as
    kernel time (the analog of the reference timing GPU work with device
    timestamps rather than fence waits, backend_vulkan.rs:1353-1384)."""
    for _ in range(WARMUP):
        fn()
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        fn()
        times.append((time.perf_counter() - t0) * 1e3 / inner)
    return Stats.from_times(times)


@dataclasses.dataclass
class CaseResult:
    h: int
    w: int
    cpu: Stats
    tpu_e2e: Optional[Stats]
    tpu_e2e_batched: Optional[Stats]
    tpu_kernel: Optional[Stats]

    def format_line(self) -> str:
        def ratio(t: Optional[Stats]) -> str:
            return f"{self.cpu.avg_ms / t.avg_ms:.2f}x" if t else "n/a"

        line = f"dft {self.h}x{self.w}: cpu={self.cpu.avg_ms:.3f}ms"
        if self.tpu_e2e:
            line += (
                f" tpu_e2e={self.tpu_e2e.avg_ms:.3f}ms ({ratio(self.tpu_e2e)})"
                f" tpu_batched={self.tpu_e2e_batched.avg_ms:.3f}ms"
                f" ({ratio(self.tpu_e2e_batched)})"
                f" tpu_kernel={self.tpu_kernel.avg_ms:.3f}ms ({ratio(self.tpu_kernel)})"
            )
        return line

    def kernel_melems_per_s(self) -> Optional[float]:
        t = self.tpu_kernel or self.cpu
        return self.h * self.w / (t.avg_ms * 1e-3) / 1e6


def run_case(h: int, w: int, use_tpu: bool) -> CaseResult:
    mat = benchmark_input(h, w)
    monty = bb.np_to_monty(mat)
    cpu_dev = jax.devices("cpu")[0]

    with jax.default_device(cpu_dev):
        cpu_in = jnp.asarray(monty)
        cpu_out_ref = radix2.dft_batch(cpu_in)  # warm compile + reference output
        cpu_stats = _time_repeats(lambda: radix2.dft_batch(cpu_in).block_until_ready())
        cpu_out = np.asarray(cpu_out_ref)

    if not use_tpu:
        return CaseResult(h, w, cpu_stats, None, None, None)

    tpu_dev = [d for d in jax.devices() if d.platform == "tpu"][0]

    def e2e_once():
        dev_in = jax.device_put(jnp.asarray(monty), tpu_dev)
        np.asarray(radix2.dft_batch(dev_in))  # includes readback

    e2e = _time_repeats(e2e_once)

    batched_fn = jax.jit(
        lambda x: [radix2.dft_batch(x) for _ in range(E2E_BATCH)],
        device=tpu_dev,
    )

    def e2e_batched_once():
        dev_in = jax.device_put(jnp.asarray(monty), tpu_dev)
        outs = batched_fn(dev_in)
        np.asarray(outs[-1])

    batched_raw = _time_repeats(e2e_batched_once)
    batched = Stats(
        batched_raw.avg_ms / E2E_BATCH,
        batched_raw.median_ms / E2E_BATCH,
        batched_raw.p95_ms / E2E_BATCH,
    )

    dev_resident = jax.device_put(jnp.asarray(monty), tpu_dev)
    # Kernel tier (OPT-0031): one jitted chain of KERNEL_INNER dependent
    # transforms + a forced device_get — block_until_ready returns early on
    # the tunnel, and a queued-call loop measured submit rate, not kernel
    # time.  The measured per-dispatch floor is subtracted from each sample
    # before amortizing (the analog of the reference timing GPU work with
    # device timestamps rather than fence waits, backend_vulkan.rs:1353-1384).
    KERNEL_INNER = 64
    from . import sol as _sol

    floor_ms = _sol.dispatch_floor() * 1e3
    chain = jax.jit(
        lambda x: jax.lax.fori_loop(
            0, KERNEL_INNER, lambda _, v: radix2.dft_batch(v), x
        ),
        device=tpu_dev,
    )

    def kernel_once():
        out = chain(dev_resident)
        jax.device_get(out.ravel()[0])

    kernel_raw = _time_repeats(kernel_once)
    kernel = Stats(
        *(
            max(t - floor_ms, t / 20) / KERNEL_INNER
            for t in (kernel_raw.avg_ms, kernel_raw.median_ms, kernel_raw.p95_ms)
        )
    )

    # differential correctness check (fib_air.rs:192-196)
    tpu_out = np.asarray(radix2.dft_batch(dev_resident))
    if not np.array_equal(tpu_out, cpu_out):
        raise RuntimeError(f"dft mismatch tpu vs cpu at {h}x{w}")
    return CaseResult(h, w, cpu_stats, e2e, batched, kernel)


def run_dft_benchmark(cases: Optional[List[Tuple[int, int]]] = None) -> str:
    """The full report string (run_dft_benchmark contract, fib_air.rs:98-222).
    Requires the accelerator: aborts if no TPU (fib_air.rs:99)."""
    if not registry.is_tpu_available():
        raise RuntimeError("dft benchmark requires a TPU device")
    from ..backend.policy import describe

    lines = [describe()]
    for h, w in cases if cases is not None else DEFAULT_CASES:
        res = run_case(h, w, use_tpu=True)
        err = registry.take_last_error()
        if err:
            raise RuntimeError(f"backend fell back during benchmark: {err}")
        lines.append(res.format_line())
    return "\n".join(lines)
