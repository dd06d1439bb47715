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
