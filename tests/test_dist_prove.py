"""Full multi-chip prove on the virtual 8-device mesh (BASELINE config 5).

The sharded prover must produce **byte-identical** proofs to the single-device
prover — same Fiat-Shamir transcript, same Merkle roots, same FRI queries —
since the mesh only changes where the rows live, not the math."""

import numpy as np
import pytest

from tpu_stark.air.fibonacci import FibonacciAir, generate_trace_rows
from tpu_stark.dist.ntt import make_row_mesh
from tpu_stark.prover.config import create_config
from tpu_stark.prover.proof import serialize_proof
from tpu_stark.prover.prove import prove
from tpu_stark.prover.verify import verify


def _fib_setup(n):
    air = FibonacciAir()
    trace = generate_trace_rows(0, 1, n)
    pis = [0, 1, int(trace[-1, 1])]
    return air, trace, pis


@pytest.mark.parametrize(
    "zk",
    [
        pytest.param(
            False,
            marks=pytest.mark.slow,  # plain variant: slow tier; zk stays default
        ),
        True,
    ],
)
def test_sharded_prove_bit_identical_and_verifies(zk):
    n = 64
    air, trace, pis = _fib_setup(n)
    mesh = make_row_mesh(8)

    proof_sharded = prove(create_config(zk=zk, mesh=mesh), air, trace, pis)
    proof_single = prove(create_config(zk=zk), air, trace, pis)

    assert serialize_proof(proof_sharded) == serialize_proof(proof_single)
    assert verify(create_config(zk=zk), air, proof_sharded, pis)


@pytest.mark.slow  # zk-sharded verify: covered default-tier by the pod
# zk byte-identity (test_multihost.py); this 4-dev variant is slow-tier
def test_sharded_prove_4_devices_zk():
    n = 128
    air, trace, pis = _fib_setup(n)
    mesh = make_row_mesh(4)
    proof = prove(create_config(zk=True, mesh=mesh), air, trace, pis)
    assert verify(create_config(zk=True), air, proof, pis)


@pytest.mark.slow
def test_sharded_prove_2p12_zk_deep_schedule():
    """2^12-row sharded zk prove on the 8-device mesh (VERDICT r2 #8): the
    exchange schedule runs many local stages between the ppermute stages and
    the FRI host tail interacts with sharded folds at real depth — shapes the
    n=64 default-tier proves never traverse."""
    n = 1 << 12
    air, trace, pis = _fib_setup(n)
    mesh = make_row_mesh(8)
    proof_sharded = prove(create_config(zk=True, mesh=mesh), air, trace, pis)
    proof_single = prove(create_config(zk=True), air, trace, pis)
    assert serialize_proof(proof_sharded) == serialize_proof(proof_single)
    assert verify(create_config(zk=True), air, proof_sharded, pis)


@pytest.mark.slow
def test_sharded_wide_prove_bit_identical_and_verifies():
    """Streamed x sharded composition (VERDICT r4 #5): the column-streaming
    wide prover's per-chunk transforms run the distributed DIF/DIT kernels
    with rows sharded over the mesh (WideMatrixSource._tf_coeffs_mesh /
    lde_br_chunk), and the proof must be byte-identical to the single-device
    wide prove — the mesh only changes where rows live, not the math."""
    from tpu_stark.air.air import BaseAir
    from tpu_stark.air.keccak_air import COLS, KeccakAir, generate_trace
    from tpu_stark.prover.wide import prove_wide

    full = KeccakAir().partitions()
    keep = {"flags", "theta0", "apdef0", "trans1"}

    class SubsetAir(BaseAir):
        width = COLS

        def partitions(self):
            return [p for p in full if p.name in keep]

        def eval(self, b):
            for p in self.partitions():
                p.eval(b)

    air = SubsetAir()
    trace = generate_trace(num_perms=3, seed=12, dtype=np.uint8)
    mesh = make_row_mesh(8)
    import os

    os.environ["TPU_STARK_WIDE_CHUNK"] = "1024"
    try:
        cfg = lambda **kw: create_config(zk=False, hash="poseidon2", **kw)
        p_mesh = prove_wide(cfg(mesh=mesh), air, trace, [])
        p_single = prove_wide(cfg(), air, trace, [])
    finally:
        del os.environ["TPU_STARK_WIDE_CHUNK"]
    assert serialize_proof(p_mesh) == serialize_proof(p_single)
    assert verify(cfg(), air, p_mesh, [])
