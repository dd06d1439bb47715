"""Backend selection, availability probe, error channel, and silent fallback.

TPU-native rebirth of the reference's dispatch layer
(``/root/reference/native/src/gpu_dft.rs``):

* ``BackendKind`` enum + string codec     (gpu_dft.rs:14-40, 53-63)
* process-global backend selector         (gpu_dft.rs:42  — AtomicU8, default GPU)
* ``LAST_ERROR`` side-channel mutex       (gpu_dft.rs:43, 65-68)
* dispatch with **silent CPU fallback on accelerator error** — the call still
  succeeds and the error is queryable afterwards (gpu_dft.rs:94-115)
* availability probe                      (backend_vulkan.rs:726-731)

Here the "GPU" is the TPU (Pallas kernels / XLA:TPU), the fallback is XLA:CPU,
and ``interpret`` runs Pallas kernels in interpreter mode for debugging
(the analog of the reference's debug-build CPU cross-check path).
"""

from __future__ import annotations

import enum
import threading
from typing import Optional


class BackendKind(enum.Enum):
    TPU = "tpu"
    CPU = "cpu"
    INTERPRET = "interpret"

    @classmethod
    def from_str(cls, s: str) -> "BackendKind":
        try:
            return cls(s.strip().lower())
        except ValueError:
            raise ValueError(
                f"unknown backend {s!r}; expected one of "
                f"{[k.value for k in cls]}"
            ) from None


_lock = threading.Lock()
_backend_kind: BackendKind = BackendKind.TPU  # default accelerator, like gpu_dft.rs:42
_last_error: Optional[str] = None


def set_backend(kind: BackendKind | str) -> None:
    """Set the process-global backend (JNI setBackend analog, lib.rs:133-146)."""
    global _backend_kind
    if isinstance(kind, str):
        kind = BackendKind.from_str(kind)
    with _lock:
        _backend_kind = kind


def backend_kind() -> BackendKind:
    with _lock:
        return _backend_kind


def record_error(msg: str) -> None:
    """Stash an accelerator error for later polling (gpu_dft.rs:65-68)."""
    global _last_error
    with _lock:
        _last_error = msg


def take_last_error() -> Optional[str]:
    """Pop the stashed error, clearing it — callers poll this after an
    operation to surface silent fallbacks (lib.rs:60-63, fib_air.rs:183-187)."""
    global _last_error
    with _lock:
        err, _last_error = _last_error, None
        return err


def is_tpu_available() -> bool:
    """Probe for a real TPU device (is_vulkan_available analog,
    backend_vulkan.rs:726-731). Never raises."""
    try:
        import jax

        return any(d.platform == "tpu" for d in jax.devices())
    except Exception:  # noqa: BLE001 — probe must not propagate
        return False
