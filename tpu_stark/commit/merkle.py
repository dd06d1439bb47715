"""Merkle-tree MMCS (mixed matrix commitment scheme) with optional hiding.

TPU-native rebuild of ``p3-merkle-tree``'s ``MerkleTreeMmcs`` /
``MerkleTreeHidingMmcs`` as instantiated by the reference
(``/root/reference/native/src/fib_air.rs:15,40-51``):

* leaf hasher  = SerializingHasher(PaddingFreeSponge<KeccakF, 25, 17, 4>)
* compressor   = CompressionFunctionFromHasher<_, 2, 4>
* digests      = 4 u64 words
* hiding       = per-row salt of SALT_ELEMS=4 BabyBear elements drawn
                 sequentially from SmallRng(seed) and hashed after the row
                 values (the ``[Val; 4]`` salt at fib_air.rs:44-51)

Structure: commit many matrices (power-of-two heights) into one tree — the
tallest matrices form the leaf layer; shorter matrices are *injected* at the
layer whose height matches (digest = compress(compress(left,right),
hash(injected rows))).  Rows are hashed in canonical u32 serialization.

TPU mapping (SURVEY.md par2.3 "SIMD-vectorized hashing"): every layer is one
batched Keccak over all nodes on the VPU; the tree is log(H) such launches
inside a single jitted program, vs. the reference's per-leaf SIMD lanes.

Openings/verification are host-side (per-query, tiny — SURVEY.md par7.2
"sequential/host tails").
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import babybear as bb
from ..hash import sponge
from ..matrix import log2_strict
from ..compat.smallrng import SmallRng

Digest = Tuple[int, int, int, int]  # 4 u64 words


@dataclasses.dataclass
class ProverData:
    """Committed matrices (Monty, device), salts, and all digest layers."""

    matrices: List[jnp.ndarray]
    salts: Optional[List[jnp.ndarray]]  # Monty, (h_i, SALT_ELEMS) or None
    layers: List[np.ndarray]  # host (N_l, 4, 2) uint32, leaf layer first
    root: Digest


@dataclasses.dataclass
class BatchOpening:
    """Opened rows (canonical u32, host) per matrix + salt rows + merkle path."""

    opened_values: List[np.ndarray]
    opened_salts: Optional[List[np.ndarray]]
    proof: List[Digest]  # sibling digests, leaf layer first


def _digest_rows_np(arr: np.ndarray) -> List[Digest]:
    return [
        tuple(int(arr[i, j, 0]) | (int(arr[i, j, 1]) << 32) for j in range(4))
        for i in range(arr.shape[0])
    ]


def _digest_to_lanes(d: Digest) -> np.ndarray:
    return np.array(
        [[w & 0xFFFFFFFF, w >> 32] for w in d], dtype=np.uint32
    )


class MerkleTreeMmcs:
    """Keccak Merkle MMCS.  In hiding mode the instance owns a ``SmallRng``
    whose state **persists across commits** (matching p3's
    ``MerkleTreeHidingMmcs`` holding an ``RefCell<R>``: the trace commit
    consumes the head of the salt stream, the quotient commit continues it —
    fib_air.rs:40-51 seeds it ``SmallRng::seed_from_u64(1)``)."""

    SALT_ELEMS = 4

    def __init__(self, hiding: bool = False, rng: Optional[SmallRng] = None,
                 rng_seed: int = 1):
        self.hiding = hiding
        self._rng = rng if rng is not None else SmallRng.seed_from_u64(rng_seed)

    # -- commit ------------------------------------------------------------
    def commit(self, matrices: Sequence[jnp.ndarray]) -> Tuple[Digest, ProverData]:
        matrices = list(matrices)
        assert matrices, "empty commit"
        heights = [int(m.shape[0]) for m in matrices]
        for h in heights:
            log2_strict(h)
        salts: Optional[List[jnp.ndarray]] = None
        if self.hiding:
            salts = [
                jnp.asarray(self._rng.sample_babybear_matrix_monty(h, self.SALT_ELEMS))
                for h in heights
            ]

        layers = _build_layers(matrices, salts)
        layers_np = [np.asarray(l) for l in layers]
        root = _digest_rows_np(layers_np[-1])[0]
        return root, ProverData(matrices, salts, layers_np, root)

    # -- open --------------------------------------------------------------
    def open_batch(self, index: int, data: ProverData) -> BatchOpening:
        max_h = max(int(m.shape[0]) for m in data.matrices)
        log_max = log2_strict(max_h)
        opened, opened_salts = [], [] if data.salts is not None else None
        for k, m in enumerate(data.matrices):
            h = int(m.shape[0])
            row_idx = index >> (log_max - log2_strict(h))
            opened.append(np.array(bb.to_u32(m[row_idx])))
            if opened_salts is not None:
                opened_salts.append(np.array(bb.to_u32(data.salts[k][row_idx])))
        proof = []
        idx = index
        for l in range(log_max):
            sib = _digest_rows_np(data.layers[l][(idx ^ 1) : (idx ^ 1) + 1])[0]
            proof.append(sib)
            idx >>= 1
        return BatchOpening(opened, opened_salts, proof)

    # -- verify (host, per query) -----------------------------------------
    def verify_batch(
        self,
        commitment: Digest,
        dimensions: Sequence[Tuple[int, int]],  # (height, width) per matrix
        index: int,
        opening: BatchOpening,
    ) -> bool:
        heights = [h for h, _ in dimensions]
        max_h = max(heights)
        log_max = log2_strict(max_h)
        if len(opening.proof) != log_max:
            return False

        def rows_at(height: int) -> List[int]:
            vals: List[int] = []
            for k, (h, _w) in enumerate(dimensions):
                if h == height:
                    vals.extend(int(v) for v in opening.opened_values[k])
                    if opening.opened_salts is not None:
                        vals.extend(int(v) for v in opening.opened_salts[k])
            return vals

        node = sponge.hash_field_row(rows_at(max_h))
        idx = index
        h = max_h
        for sib in opening.proof:
            left, right = (node, sib) if idx & 1 == 0 else (sib, node)
            node = sponge.compress_digests(left, right)
            idx >>= 1
            h >>= 1
            inj = rows_at(h)
            if inj:
                node = sponge.compress_digests(node, sponge.hash_field_row(inj))
        return tuple(node) == tuple(commitment)


import functools


@functools.lru_cache(maxsize=None)
def _build_fn(shapes: Tuple[Tuple[int, int], ...]):
    """Jitted tree-builder for a static flattened-shape structure (jit cache
    per plan — the analog of the reference's per-log_n plan cache)."""
    heights = sorted({h for h, _ in shapes}, reverse=True)
    max_h = heights[0]

    @jax.jit
    def build(*dev_mats):
        groups: dict = {h: [] for h in heights}
        for (h, _w), m in zip(shapes, dev_mats):
            groups[h].append(m)
        digests = sponge.hash_field_rows_batched(jnp.concatenate(groups[max_h], axis=1))
        layers = [digests]
        h = max_h
        while h > 1:
            h >>= 1
            d = sponge.compress_digests_batched(digests[0::2], digests[1::2])
            if h in groups:
                inj = sponge.hash_field_rows_batched(
                    jnp.concatenate(groups[h], axis=1)
                )
                d = sponge.compress_digests_batched(d, inj)
            digests = d
            layers.append(d)
        return layers

    return build


def _build_layers(
    matrices: List[jnp.ndarray], salts: Optional[List[jnp.ndarray]]
) -> List[jnp.ndarray]:
    """Device-side tree build: list of (N_l, 4, 2) digest layers, leaves first.

    Matrices (and their salts, hiding mode) are serialized to canonical u32
    and grouped by height, tallest first, preserving input order per height.
    """
    flat: List[jnp.ndarray] = []
    shapes: List[Tuple[int, int]] = []
    for h in sorted({int(m.shape[0]) for m in matrices}, reverse=True):
        for k, m in enumerate(matrices):
            if int(m.shape[0]) == h:
                flat.append(bb.to_u32(m))
                shapes.append((h, int(m.shape[1])))
                if salts is not None:
                    flat.append(bb.to_u32(salts[k]))
                    shapes.append((h, int(salts[k].shape[1])))
    return _build_fn(tuple(shapes))(*flat)
