"""Multi-chip sharded prover kernels over a ``jax.sharding.Mesh``.

The reference is single-device (SURVEY.md par2.3), so this layer is designed
from the BASELINE north star instead: trace columns partitioned over chips for
the NTT (the reference's per-column data parallelism, fft_stage.wgsl:75-87,
promoted to the mesh), an all-to-all resharding to rows for Merkle leaf
hashing, device-local subtrees, and a collective top-tree reduction over ICI.

Everything here runs under ``shard_map`` inside one jitted program — the
multi-chip version of "never leave the jitted graph mid-prove"
(SURVEY.md par5.8).

Exactness: a contiguous row block of 2^k leaves is a complete Merkle subtree,
so the sharded commit reproduces the single-chip root bit-for-bit (tested on a
virtual CPU mesh, tests/test_dist.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from ..fields import babybear as bb
from ..hash import sponge
from ..matrix import log2_strict, reverse_matrix_index_bits
from ..ntt import radix2

COL_AXIS = "col"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    return Mesh(np.array(devs[:n]), (COL_AXIS,))


def sharded_lde_commit_fn(mesh: Mesh, log_blowup: int):
    """Jitted (trace columns sharded) -> (lde row-sharded, merkle root).

    Pipeline per device, one program:
      1. coset LDE of the local column shard (no communication — columns are
         independent, the reference's gid.x axis);
      2. bit-reverse rows (commit order), all_to_all: columns -> row blocks;
      3. hash local leaf rows (batched Keccak), build the local subtree;
      4. all_gather the per-device subtree roots, compute the shared top tree.
    """
    n_dev = mesh.devices.size

    def local_step(trace_shard: jnp.ndarray):
        # 1. per-column LDE (local)
        lde = radix2.coset_lde_batch(trace_shard, log_blowup, bb.GENERATOR)
        lde_br = reverse_matrix_index_bits(lde)
        # 2. reshard: (H, w/n) -> (H/n, w)
        rows = jax.lax.all_to_all(
            lde_br, COL_AXIS, split_axis=0, concat_axis=1, tiled=True
        )
        # 3. local leaf hashes + subtree
        digests = sponge.hash_field_rows_batched(bb.to_u32(rows))
        h_local = rows.shape[0]
        while digests.shape[0] > 1:
            digests = sponge.compress_digests_batched(digests[0::2], digests[1::2])
        # 4. collective top tree (tiny, replicated)
        subroots = jax.lax.all_gather(digests, COL_AXIS, axis=0, tiled=True)
        while subroots.shape[0] > 1:
            subroots = sponge.compress_digests_batched(
                subroots[0::2], subroots[1::2]
            )
        return rows, subroots[0]

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(None, COL_AXIS),),
        out_specs=(P(COL_AXIS, None), P()),
        check_vma=False,  # the root is replicated by the final all_gather
    )
    return jax.jit(sharded)


def sharded_prove_step_fn(mesh: Mesh, log_blowup: int = 2):
    """The full multi-chip 'training step' equivalent: trace in, (root, lde
    checksum) out — used by the driver's multichip dry-run and scaled runs."""
    commit = sharded_lde_commit_fn(mesh, log_blowup)

    def step(trace: jnp.ndarray):
        rows, root = commit(trace)
        return root, bb.sum_mod(bb.sum_mod(rows, 0), 0)

    return step


def sharded_quotient_fn(mesh: Mesh, air, log_n: int, log_qd: int, num_pis: int):
    """Row-sharded quotient evaluation via GSPMD: domain points are
    independent, so the quotient domain rows shard over the mesh and XLA
    inserts the one collective the row-roll (next-row access) needs
    (SURVEY.md par5.8: annotate shardings, let XLA place collectives)."""
    from jax.sharding import NamedSharding

    from ..prover.prove import _quotient_fn, _register_air

    qfn = _quotient_fn(_register_air(air), log_n, log_n + log_qd, num_pis)
    row_sharded = NamedSharding(mesh, P(COL_AXIS, None))
    replicated = NamedSharding(mesh, P())
    return jax.jit(
        qfn,
        in_shardings=(row_sharded, replicated, replicated),
        out_shardings=row_sharded,
    )
