"""Multi-host (pod-slice) mesh construction — BASELINE config 5's "N>=2
hosts" axis.

The reference is a single-process, single-device prover (SURVEY.md par2.3 /
par5.8: no NCCL/MPI analog exists); the TPU-native scaling story is
``jax.distributed`` + one global mesh, ICI inside a host's slice, DCN
between hosts.

Why a FLAT row mesh is already hierarchical here
------------------------------------------------
The distributed NTT's only collectives are XOR-stride ``ppermute`` pairs
(device d <-> d ^ stride, dist/ntt.py::_exchange_perm) and one tiled
``all_to_all`` for the bit-reversal reshard.  With devices ordered
HOST-MAJOR (d = host * per_host + local, the order ``jax.devices()``
guarantees across processes), a stride exchange crosses DCN iff
``stride >= per_host``:

* the DIF exchange stages run stride n_dev/2, n_dev/4, ..., 1 — exactly
  ``log2(n_hosts)`` of them cross DCN, each ONCE per transform, and all
  small strides ride ICI;
* the Merkle tree needs no collective at all until the top ``log2(n_dev)``
  compress levels (contiguous row sharding makes each device block a
  complete subtree), and those tiny levels are gathered to one device
  anyway (merkle.gather_if_tiny).

So multi-host support = building the flat ``ROW_AXIS`` mesh from the global
device list in host-major order; the sharded prover (dist/pcs.py) is
topology-agnostic on top of it.  ``dcn_crossing_stages`` quantifies the DCN
traffic for a given topology so deployments can check the exchange schedule
matches the wiring.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from .ntt import ROW_AXIS


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` wrapper (idempotent, env-driven when
    args are None — the standard TPU pod bring-up where the runtime supplies
    coordinates)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized — keep idempotent
        if "already" not in str(e).lower():
            raise


def make_pod_mesh(n_devices: Optional[int] = None) -> Mesh:
    """Global flat row mesh over all hosts' devices in host-major order.

    ``jax.devices()`` orders by (process_index, local ordinal), which IS the
    host-major order the exchange-locality argument above needs; assert it
    rather than assume it."""
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    devs = devs[:n]
    procs = [d.process_index for d in devs]
    assert procs == sorted(procs), "jax.devices() not host-major?"
    return Mesh(np.array(devs), (ROW_AXIS,))


def simulate_pod_mesh(n_hosts: int, per_host: int) -> Mesh:
    """Virtual pod topology on single-process devices (tests: the 8-device
    CPU mesh shaped as e.g. 2 hosts x 4 chips).  Device order is host-major
    by construction, so collective schedules match a real pod's."""
    devs = jax.devices()
    n = n_hosts * per_host
    assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
    return Mesh(np.array(devs[:n]), (ROW_AXIS,))


def dcn_crossing_stages(
    log_h: int, n_hosts: int, per_host: int
) -> Tuple[List[int], List[int]]:
    """Which distributed-NTT exchange strides ride ICI vs cross DCN for a
    host-major mesh of ``n_hosts * per_host`` devices (see module doc).
    Returns (ici_strides, dcn_strides) for one transform of 2^log_h rows."""
    n_dev = n_hosts * per_host
    log_nd = int(np.log2(n_dev))
    assert 1 << log_nd == n_dev, "device count must be a power of two"
    ici, dcn = [], []
    for s in range(log_nd):
        stride = 1 << (log_nd - s - 1)
        (dcn if stride >= per_host else ici).append(stride)
    return ici, dcn
