"""`Dft` — the TwoAdicSubgroupDft facade with backend dispatch and fallback.

Mirrors the reference's ``GpuDft<F>`` object (``/root/reference/native/src/
gpu_dft.rs:70-115``): one required primitive (``dft_batch``) plus the
trait-default derivations (``idft_batch`` / ``coset_lde_batch`` / ``lde_batch``
— p3-dft trait shape, SURVEY.md par2.2), dispatching per the process-global
backend with **silent CPU fallback + recorded error** (gpu_dft.rs:94-115).

Backends:
* ``tpu``       — the XLA radix-2/four-step programs jitted for the default
                  (TPU) device (measured FASTER than the Pallas fused-stage
                  kernel at every benchmarked shape — OPT-0004; the Pallas
                  kernel stays as the ``interpret`` cross-check and a study
                  vehicle, dispatchable via ``pallas_ntt`` directly).
* ``cpu``       — the same XLA program on the host CPU backend (the analog of
                  the reference's Radix2DitParallel fallback).
* ``interpret`` — Pallas interpreter mode (debug; analog of the reference's
                  debug-build CPU cross-check, backend_vulkan.rs:2028-2057).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..backend import registry
from ..backend.registry import BackendKind
from . import pallas_ntt, radix2


def _cpu_device():
    return jax.devices("cpu")[0]


class Dft:
    """Batched two-adic NTT over BabyBear with backend selection.

    ``Dft()`` reads the process-global backend at each call (like
    ``GpuDft::default()``, gpu_dft.rs:76-83); ``Dft(backend=...)`` pins it
    (``with_backend``, gpu_dft.rs:86-91, pinned at fib_air.rs:60).
    """

    def __init__(self, backend: Optional[BackendKind | str] = None):
        if isinstance(backend, str):
            backend = BackendKind.from_str(backend)
        self._pinned = backend

    @property
    def backend(self) -> BackendKind:
        return self._pinned if self._pinned is not None else registry.backend_kind()

    # -- dispatch ----------------------------------------------------------
    def _run(self, fn, *args, **kwargs):
        kind = self.backend
        if kind is BackendKind.INTERPRET:
            # Pallas interpreter mode when the kernel covers the shape —
            # the debug-build cross-check analog (backend_vulkan.rs:2028-2057)
            try:
                mat = args[0]
                if fn is radix2.dft_batch and pallas_ntt.supports(*mat.shape):
                    from ..matrix import reverse_matrix_index_bits

                    return pallas_ntt.ntt_from_bitrev(
                        reverse_matrix_index_bits(mat), interpret=True
                    )
            except Exception as e:  # noqa: BLE001
                registry.record_error(f"interpret backend failed: {e}")
        if kind in (BackendKind.TPU, BackendKind.INTERPRET):
            try:
                if kind is BackendKind.TPU and not registry.is_tpu_available():
                    raise RuntimeError("no TPU device present")
                return fn(*args, **kwargs)
            except Exception as e:  # noqa: BLE001 — mirror silent fallback
                registry.record_error(f"{kind.value} backend failed: {e}")
                # fall through to CPU, call still succeeds (gpu_dft.rs:100-108)
        with jax.default_device(_cpu_device()):
            return fn(*args, **kwargs)

    # -- the TwoAdicSubgroupDft surface ------------------------------------
    def dft_batch(self, mat: jnp.ndarray) -> jnp.ndarray:
        return self._run(radix2.dft_batch, mat)

    def idft_batch(self, mat: jnp.ndarray) -> jnp.ndarray:
        return self._run(radix2.idft_batch, mat)

    def coset_dft_batch(self, mat: jnp.ndarray, shift: int) -> jnp.ndarray:
        return self._run(radix2.coset_dft_batch, mat, shift)

    def coset_idft_batch(self, mat: jnp.ndarray, shift: int) -> jnp.ndarray:
        return self._run(radix2.coset_idft_batch, mat, shift)

    def coset_lde_batch(
        self, mat: jnp.ndarray, added_bits: int, shift: int = 1
    ) -> jnp.ndarray:
        return self._run(radix2.coset_lde_batch, mat, added_bits, shift)

    def lde_batch(self, mat: jnp.ndarray, added_bits: int) -> jnp.ndarray:
        return self.coset_lde_batch(mat, added_bits, 1)
