"""Device-adaptive runtime policy.

The reference hard-codes its kernel policy (fused-stage gate width>=64,
FUSED_TILE_ROWS=256, workgroup shapes 8x8 / 4x32 — ``backend_vulkan.rs:
845-869``) and its own research doc calls for replacing those constants with
device-adaptive policies (``docs/mobile_gpu_zk_survey.md:364-373,411-428``;
SURVEY.md par5.6 carries that requirement into this design: "policy by
topology: chip count, VMEM size, ICI axes").

This module is that policy point: one cached :class:`DevicePolicy` derived
from the runtime platform, consumed by the kernels (sponge VMEM budgets,
narrow-NTT dispatch gates, FRI host-tail threshold).  Every knob keeps its
``TPU_STARK_*`` env override — the policy sets defaults, never mandates.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional


@dataclasses.dataclass(frozen=True)
class DevicePolicy:
    platform: str  # jax.default_backend(): "tpu" | "axon" | "cpu" | ...
    device_kind: str  # e.g. "TPU v5 lite"
    num_devices: int
    vmem_bytes: int  # per-core VMEM working set (conservative)
    hbm_bytes: Optional[int]  # device memory, when the runtime reports it
    lanes: int = 128  # VPU minor (lane) axis
    sublanes: int = 8  # VPU second-minor axis
    remote_dispatch: bool = False  # tunneled device: syncs/dispatches ~30ms

    # -- derived knobs ------------------------------------------------------
    @property
    def sponge_vmem_in_budget(self) -> int:
        """Per-input-block VMEM budget for the Pallas sponge kernels (the
        block is double-buffered and lives next to two 25-plane state
        scratches: ~1/8 of VMEM keeps the total well under the core's ~16 MB)."""
        return max(1 << 20, self.vmem_bytes // 8)

    @property
    def ntt_narrow_max_w(self) -> int:
        """Widths at or under this use the four-step narrow-NTT route: below
        ~a quarter of the lane axis, the radix-2 stage loop leaves the VPU's
        128-lane minor dimension mostly idle (OPT-0011/0016)."""
        return self.lanes // 4

    @property
    def ntt_narrow_min_logh(self) -> int:
        """Minimum log-height for the four-step reroute — under this the two
        extra layout moves cost more than the idle lanes."""
        return 16

    @property
    def fri_host_tail_log(self) -> int:
        """FRI fold levels at <= 2^this rows run host-side (OPT-0018).  Worth
        more when every device sync pays a tunnel round trip; locally-attached
        devices keep a smaller tail (sync ~us, transfer cheap)."""
        return 13 if self.remote_dispatch else 11


_VMEM_BY_KIND = {
    # conservative per-core VMEM working sets (pallas guide: ~16 MB/core)
    "v4": 16 << 20,
    "v5": 16 << 20,
    "v5 lite": 16 << 20,
    "v5e": 16 << 20,
    "v5p": 16 << 20,
    "v6": 32 << 20,
    "v6e": 32 << 20,
}


def _vmem_for_kind(kind: str) -> int:
    k = kind.lower()
    for name, size in sorted(_VMEM_BY_KIND.items(), key=lambda kv: -len(kv[0])):
        if name in k:
            return size
    return 16 << 20


@functools.cache
def current_policy() -> DevicePolicy:
    """The policy for the process's default backend (cached: topology is
    fixed for a process lifetime, like the reference's thread-local runtime)."""
    import jax

    platform = jax.default_backend()
    devices = jax.devices()
    dev = devices[0]
    kind = getattr(dev, "device_kind", platform) or platform
    hbm: Optional[int] = None
    try:
        stats = dev.memory_stats()
        hbm = stats.get("bytes_limit") if stats else None
    except Exception:  # noqa: BLE001 — CPU/interpret devices don't report
        hbm = None
    # The axon tunnel registers a PJRT plugin whose devices report
    # platform "tpu"; its name only survives in platform_version.
    version = str(getattr(getattr(dev, "client", None), "platform_version", ""))
    return DevicePolicy(
        platform=platform,
        device_kind=str(kind),
        num_devices=len(devices),
        vmem_bytes=_vmem_for_kind(str(kind)) if platform != "cpu" else 16 << 20,
        hbm_bytes=hbm,
        # a tunneled chip: every dispatch/sync costs a ~30 ms round trip
        remote_dispatch="axon" in version.lower(),
    )


def describe() -> str:
    """One-line policy report (surfaced by the bench harness)."""
    p = current_policy()
    hbm = f"{p.hbm_bytes / 2**30:.1f}GiB" if p.hbm_bytes else "?"
    return (
        f"policy: {p.device_kind} x{p.num_devices} ({p.platform}), "
        f"vmem={p.vmem_bytes >> 20}MiB, hbm={hbm}, "
        f"remote_dispatch={p.remote_dispatch}, "
        f"sponge_block={p.sponge_vmem_in_budget >> 20}MiB, "
        f"narrow_w<={p.ntt_narrow_max_w}@h>=2^{p.ntt_narrow_min_logh}, "
        f"fri_host_tail=2^{p.fri_host_tail_log}"
    )
