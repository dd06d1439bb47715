"""Multi-host (simulated pod) prove: byte-identical proofs on a 2-host x
4-chip virtual topology, and the DCN/ICI exchange-schedule analysis.

A real N>=2-host run only changes WHERE the flat row mesh's devices live
(dist/multihost.py module doc); this pins the topology-facing pieces the
single-process environment can exercise."""

import numpy as np

from tpu_stark.air.fibonacci import FibonacciAir, generate_trace_rows
from tpu_stark.dist.multihost import dcn_crossing_stages, simulate_pod_mesh
from tpu_stark.prover.config import create_config
from tpu_stark.prover.proof import serialize_proof
from tpu_stark.prover.prove import prove
from tpu_stark.prover.verify import verify
import pytest


@pytest.mark.slow  # multi-second prove: slow tier (docs/testing.md)
def test_simulated_two_host_prove_bit_identical():
    air = FibonacciAir()
    trace = generate_trace_rows(0, 1, 64)
    pis = [0, 1, int(trace[-1, 1])]
    single = serialize_proof(prove(create_config(zk=True), air, trace, pis))
    mesh = simulate_pod_mesh(2, 4)
    cfg = create_config(zk=True, mesh=mesh)
    proof = prove(cfg, air, trace, pis)
    assert serialize_proof(proof) == single
    assert verify(create_config(zk=True), air, proof, pis)


def test_dcn_crossing_schedule():
    # 2 hosts x 4 chips: strides 4,2,1 -> only stride 4 crosses DCN
    ici, dcn = dcn_crossing_stages(12, 2, 4)
    assert dcn == [4]
    assert ici == [2, 1]
    # 4 hosts x 2 chips: strides 4,2,1 -> 4 and 2 cross DCN
    ici, dcn = dcn_crossing_stages(12, 4, 2)
    assert dcn == [4, 2]
    assert ici == [1]
    # single host: nothing crosses DCN
    ici, dcn = dcn_crossing_stages(12, 1, 8)
    assert dcn == []
    assert ici == [4, 2, 1]


def test_pod_mesh_axis():
    from tpu_stark.dist.ntt import ROW_AXIS

    mesh = simulate_pod_mesh(2, 4)
    assert mesh.devices.shape == (8,)
    assert mesh.axis_names == (ROW_AXIS,)
