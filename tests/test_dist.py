"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md par4: distributed tests via device-count simulation)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu_stark.commit.merkle import MerkleTreeMmcs
from tpu_stark.dist.sharded import make_mesh, sharded_lde_commit_fn
from tpu_stark.fields import babybear as bb
from tpu_stark.matrix import reverse_matrix_index_bits
from tpu_stark.ntt import radix2


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_commit_matches_single_device():
    mesh = make_mesh(8)
    h, w, bits = 64, 16, 2
    trace = (np.random.default_rng(0).integers(0, bb.P, size=(h, w))).astype(np.uint32)
    dev = jnp.asarray(bb.np_to_monty(trace))

    commit = sharded_lde_commit_fn(mesh, bits)
    rows, root = commit(dev)
    root_np = np.asarray(root)

    # single-device reference: LDE + bit-reverse + plain MMCS commit
    lde_br = reverse_matrix_index_bits(
        radix2.coset_lde_batch(dev, bits, bb.GENERATOR)
    )
    want_root, _ = MerkleTreeMmcs().commit([lde_br])
    got = tuple(
        int(root_np[j, 0]) | (int(root_np[j, 1]) << 32) for j in range(4)
    )
    assert got == tuple(want_root)
    # resharded rows reassemble to the full bit-reversed LDE
    np.testing.assert_array_equal(np.asarray(rows), np.asarray(lde_br))


def test_sharded_commit_4_devices():
    mesh = make_mesh(4)
    h, w = 32, 8
    trace = (np.random.default_rng(1).integers(0, bb.P, size=(h, w))).astype(np.uint32)
    dev = jnp.asarray(bb.np_to_monty(trace))
    commit = sharded_lde_commit_fn(mesh, 1)
    _, root = commit(dev)
    lde_br = reverse_matrix_index_bits(radix2.coset_lde_batch(dev, 1, bb.GENERATOR))
    want_root, _ = MerkleTreeMmcs().commit([lde_br])
    root_np = np.asarray(root)
    got = tuple(int(root_np[j, 0]) | (int(root_np[j, 1]) << 32) for j in range(4))
    assert got == tuple(want_root)


def test_sharded_quotient_matches_single_device():
    import jax.numpy as jnp
    from tpu_stark.air.air import get_symbolic_info
    from tpu_stark.air.fibonacci import FibonacciAir, generate_trace_rows
    from tpu_stark.dist.sharded import sharded_quotient_fn
    from tpu_stark.fields import ref_field as rf
    from tpu_stark.prover.config import create_config
    from tpu_stark.prover.prove import (
        _quotient_fn,
        _register_air,
        get_log_quotient_degree,
    )

    air = FibonacciAir()
    n = 64
    trace = generate_trace_rows(0, 1, n)
    pis = [0, 1, int(trace[-1, 1])]
    log_qd = get_log_quotient_degree(air, 3, zk=False)
    pcs = create_config(zk=False, backend="cpu").pcs
    dom = pcs.natural_domain_for_degree(n)
    _c, data = pcs.commit([(dom, jnp.asarray(bb.np_to_monty(trace)))])
    qdom = dom.create_disjoint_domain(n << log_qd)
    t_on_q = pcs.get_evaluations_on_domain(data, 0, qdom)
    alpha = (3, 1, 4, 1)
    k, _ = get_symbolic_info(air, 3)
    apows = [(1, 0, 0, 0)]
    for _ in range(k - 1):
        apows.append(rf.emul(apows[-1], alpha))
    apows_dev = jnp.asarray(
        bb.np_to_monty(np.array(apows, dtype=np.uint64).astype(np.uint32))
    )
    pis_dev = jnp.asarray(bb.np_to_monty(np.array(pis, dtype=np.uint32)))
    mesh = make_mesh(8)
    got = np.asarray(
        sharded_quotient_fn(mesh, air, 6, log_qd, 3)(t_on_q, pis_dev, apows_dev)
    )
    want = np.asarray(
        _quotient_fn(_register_air(air), 6, 6 + log_qd, 3)(
            t_on_q, pis_dev, apows_dev
        )
    )
    np.testing.assert_array_equal(got, want)
