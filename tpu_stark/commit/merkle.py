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
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import babybear as bb
from ..hash import sponge
from ..matrix import log2_strict
from ..compat.smallrng import SmallRng
from . import lowmem

Digest = Tuple[int, int, int, int]  # 4 u64 words


@dataclasses.dataclass
class ProverData:
    """Committed matrices (Monty, device), salts, and all digest layers.

    Low-memory mode (commit/lowmem.py): ``salts`` entries may be lazy
    descriptors (``device_rng.LazyMatrix``) and the ``dropped_layers``
    leaf-most digest layers are released after the root — ``layers[0]`` is
    then the level-``dropped_layers`` layer and query openings reconstruct
    the missing siblings from re-hashed leaf blocks."""

    matrices: List[jnp.ndarray]
    salts: Optional[List[jnp.ndarray]]  # Monty, (h_i, SALT_ELEMS) or None
    layers: List[np.ndarray]  # host (N_l, 4, 2) uint32, leaf layer first
    root: Digest
    dropped_layers: int = 0


@dataclasses.dataclass
class BatchOpening:
    """Opened rows (canonical u32, host) per matrix + salt rows + merkle path."""

    opened_values: List[np.ndarray]
    opened_salts: Optional[List[np.ndarray]]
    proof: List[Digest]  # sibling digests, leaf layer first


def _digest_at(layer, i: int) -> Digest:
    """Digest i of a host or device-resident (N, 4, 2) layer."""
    row = np.asarray(layer[i])
    return tuple(int(row[j, 0]) | (int(row[j, 1]) << 32) for j in range(4))


class MerkleTreeMmcs:
    """Keccak Merkle MMCS.  In hiding mode the instance owns a ``SmallRng``
    whose state **persists across commits** (matching p3's
    ``MerkleTreeHidingMmcs`` holding an ``RefCell<R>``: the trace commit
    consumes the head of the salt stream, the quotient commit continues it —
    fib_air.rs:40-51 seeds it ``SmallRng::seed_from_u64(1)``)."""

    SALT_ELEMS = 4

    def __init__(self, hiding: bool = False, rng: Optional[SmallRng] = None,
                 rng_seed: int = 1, sharding=None):
        self.hiding = hiding
        self._rng = rng if rng is not None else SmallRng.seed_from_u64(rng_seed)
        # Optional jax.sharding.Sharding for committed matrices' salts (the
        # multi-chip path row-shards them next to the codewords; dist/pcs.py).
        self.sharding = sharding

    # -- commit ------------------------------------------------------------
    def commit(self, matrices: Sequence[jnp.ndarray]) -> Tuple[Digest, ProverData]:
        matrices = list(matrices)
        assert matrices, "empty commit"
        heights = [int(m.shape[0]) for m in matrices]
        for h in heights:
            log2_strict(h)
        lm = lowmem.lowmem_rows()
        salts: Optional[List[jnp.ndarray]] = None
        salt_store: Optional[List] = None
        if self.hiding:
            salts, salt_store = [], []
            for h in heights:
                if (lm and h >= lm and self.sharding is None
                        and hasattr(self._rng, "sample_lazy")):
                    # lowmem lever (a): counter-based salt stream — hash the
                    # transient matrix, retain only the descriptor
                    handle = self._rng.sample_lazy(h, self.SALT_ELEMS)
                    salts.append(handle.materialize())
                    salt_store.append(handle)
                else:
                    s = jnp.asarray(
                        self._rng.sample_babybear_matrix_monty(h, self.SALT_ELEMS)
                    )
                    if self.sharding is not None:
                        s = jax.device_put(s, self.sharding)
                    salts.append(s)
                    salt_store.append(s)

        # GSPMD-sharded commits keep the XLA sponge: pallas_call on a
        # multi-device global array would force a gather (the sharded tree in
        # dist/sharded.py runs per-shard inside shard_map where Pallas sees
        # local shapes and dispatches normally).
        impl = "xla" if self.sharding is not None else None
        layers = _build_layers(
            matrices, salts, impl, allow_host_tail=self.sharding is None
        )
        del salts  # lazy handles: drop the transient dense salt matrices now
        # layers stay device-resident; query openings fetch the few digests
        # they touch in one batched transfer (open_batch) — eager host
        # conversion of every layer costs hundreds of tunnel round trips
        root = _digest_at(layers[-1], 0)
        # lowmem lever (b): release the K leaf-most layers (single-height
        # trees only — injection would make block re-hashing multi-layer)
        drop = 0
        if (lm and len(set(heights)) == 1 and heights[0] >= lm
                and self.sharding is None):
            drop = min(lowmem.drop_layers(), len(layers) - 1)
            layers = layers[drop:]
        return root, ProverData(matrices, salt_store, layers, root, drop)

    @staticmethod
    def to_host_data(data: ProverData) -> ProverData:
        """Re-home a (CPU-built) tree as numpy so openings never touch a
        device (the FRI host tail, pcs.py OPT-0018).  Matrices/salts stay
        Monty; digest layers are raw u32 — same conventions as device data."""
        return ProverData(
            [np.asarray(m) for m in data.matrices],
            None if data.salts is None else [np.asarray(s) for s in data.salts],
            [np.asarray(l) for l in data.layers],
            data.root,
            data.dropped_layers,
        )

    # -- open --------------------------------------------------------------
    def open_batch(self, index: int, data: ProverData) -> BatchOpening:
        return self.open_batch_many([index], data)[0]

    def open_batch_many(
        self, indices: Sequence[int], data: ProverData
    ) -> List[BatchOpening]:
        """Open many query indices with ONE host<->device transfer.  FRI
        query indices never feed back into the transcript, so all queries'
        rows + sibling paths batch into a single device_get — per-query
        fetches cost one ~30 ms tunnel round trip EACH (measured; ~100
        queries x (rounds + fold levels) syncs dominated pcs.open)."""
        fetch, finish = self.open_batch_many_lazy(indices, data)
        return finish(jax.device_get(fetch))

    def open_batch_many_lazy(self, indices: Sequence[int], data: ProverData):
        """Deferred form of ``open_batch_many``: queue the row/sibling gathers
        and return ``(device_arrays, finish)``; the caller pools many trees'
        arrays into ONE ``device_get`` and hands each tree's slice back to its
        ``finish`` (OPT-0017: pcs.open previously paid one ~30ms+ tunnel round
        trip per tree — rounds + every FRI fold level).

        Low-memory trees (``dropped_layers`` K > 0): instead of per-query row
        gathers, the 2^K-aligned leaf-row *block* around every query is
        gathered once per matrix (so lazily-recomputed codewords materialize
        once), the missing K sibling levels are re-hashed on device, and
        opened rows are sliced out of the blocks host-side."""
        max_h = max(int(m.shape[0]) for m in data.matrices)
        log_max = log2_strict(max_h)
        idx_np = np.asarray(list(indices), dtype=np.int64)
        K = getattr(data, "dropped_layers", 0)
        fetch: List = []  # one vectorized gather per matrix/salt/layer

        def rows_u32(m, rows_np):
            if hasattr(m, "materialize"):  # lazy salt descriptor
                return bb.to_u32(m.materialize()[jnp.asarray(rows_np)])
            if isinstance(m, np.ndarray):  # host tree (FRI host tail)
                return bb.np_from_monty(m[rows_np])
            return bb.to_u32(m[jnp.asarray(rows_np)])

        if K:
            # single-height tree by construction (commit gates the drop)
            blocks = np.unique(idx_np >> K)
            block_rows = ((blocks[:, None] << K) + np.arange(1 << K)).ravel()
            parts: List = []
            for k, m in enumerate(data.matrices):
                parts.append(rows_u32(m, block_rows))  # (B<<K, w)
                if data.salts is not None:
                    parts.append(rows_u32(data.salts[k], block_rows))
            fetch.extend(parts)
            # mini-trees: leaf digests of every block + K-1 compress levels
            level = _mini_leaf_digests(*[jnp.asarray(p) for p in parts])
            for _l in range(K):
                fetch.append(level)  # (B << (K - _l), 4, 2)
                if _l < K - 1:
                    level = _compress_layer(level)
        else:
            for k, m in enumerate(data.matrices):
                h = int(m.shape[0])
                rows_np = idx_np >> (log_max - log2_strict(h))
                fetch.append(rows_u32(m, rows_np))  # (Q, w)
                if data.salts is not None:
                    fetch.append(rows_u32(data.salts[k], rows_np))
        for l in range(K, log_max):
            layer = data.layers[l - K]
            sib = (idx_np >> l) ^ 1
            fetch.append(  # (Q, 4, 2); jax.device_get passes np through
                layer[sib]
                if isinstance(layer, np.ndarray)
                else layer[jnp.asarray(sib)]
            )

        blocks_arr = blocks if K else None

        def finish(host: List) -> List[BatchOpening]:
            return self._assemble_openings(
                idx_np, data, log_max, host, K, blocks_arr
            )

        return fetch, finish

    def _assemble_openings(
        self,
        idx_np: np.ndarray,
        data: ProverData,
        log_max: int,
        host: List,
        K: int = 0,
        blocks: Optional[np.ndarray] = None,
    ) -> List[BatchOpening]:
        out: List[BatchOpening] = []
        n_mat = len(data.matrices)
        stride = n_mat * (2 if data.salts is not None else 1)
        for q in range(len(idx_np)):
            i = int(idx_np[q])
            opened, opened_salts = [], [] if data.salts is not None else None
            if K:
                bpos = int(np.searchsorted(blocks, i >> K))
                row_pos = (bpos << K) + (i & ((1 << K) - 1))
            else:
                row_pos = q
            pos = 0
            for _ in data.matrices:
                opened.append(np.array(host[pos][row_pos]))
                pos += 1
                if opened_salts is not None:
                    opened_salts.append(np.array(host[pos][row_pos]))
                    pos += 1
            proof = []
            for l in range(K):
                # reconstructed mini-tree level l: blocks hold 2^(K-l) digests
                local = ((i >> l) ^ 1) & ((1 << (K - l)) - 1)
                row = host[stride + l][(bpos << (K - l)) + local]
                proof.append(
                    tuple(int(row[j, 0]) | (int(row[j, 1]) << 32) for j in range(4))
                )
            for l in range(K, log_max):
                row = host[stride + l][q]
                proof.append(
                    tuple(int(row[j, 0]) | (int(row[j, 1]) << 32) for j in range(4))
                )
            out.append(BatchOpening(opened, opened_salts, proof))
        return out

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


def gather_if_tiny(arr: jnp.ndarray) -> jnp.ndarray:
    """Collapse a multi-device array to one device once it has <2 rows per
    device.  Sub-device-count shapes make GSPMD re-shard across trailing axes
    (observed: a (4, 8) fold row committed over 8 CPU devices re-sharded to
    {devices=[4,2]} and the partitioned Keccak program returned wrong digests)
    — and the work is trivial at these sizes anyway, so the tree/fold tails
    run single-device by construction."""
    try:
        devs = arr.devices()
    except Exception:  # noqa: BLE001 — tracers/numpy inputs pass through
        return arr
    if len(devs) > 1 and arr.shape[0] < 2 * len(devs):
        return jax.device_put(
            arr, jax.sharding.SingleDeviceSharding(next(iter(sorted(devs, key=lambda d: d.id))))
        )
    return arr


@jax.jit
def _mini_leaf_digests(*parts_u32):
    """Leaf digests of gathered leaf-row blocks (already canonical u32, in
    the same matrix/salt concatenation order as ``_leaf_layer``) — the
    dropped-layer reconstruction path.  Must reproduce the committed leaf
    layer bit-exactly (tested, tests/test_lowmem.py)."""
    return sponge.hash_field_rows_batched(jnp.concatenate(parts_u32, axis=1))


@functools.partial(jax.jit, static_argnames=("impl",))
def _leaf_layer(*mats, impl=None):
    return sponge.hash_field_rows_batched(
        bb.to_u32(jnp.concatenate(mats, axis=1)), impl
    )


@functools.partial(jax.jit, static_argnames=("impl",))
def _compress_layer(digests, impl=None):
    return sponge.compress_digests_batched(digests[0::2], digests[1::2], impl)


@functools.partial(jax.jit, static_argnames=("impl",))
def _compress_pairwise(a, b, impl=None):
    return sponge.compress_digests_batched(a, b, impl)


def _build_layers(
    matrices: List[jnp.ndarray],
    salts: Optional[List[jnp.ndarray]],
    impl: Optional[str] = None,
    allow_host_tail: bool = True,
) -> List[jnp.ndarray]:
    """Device-side tree build: list of (N_l, 4, 2) digest layers, leaves first.

    Matrices (and their salts, hiding mode) are grouped by height, tallest
    first, preserving input order per height.  Each layer is its own cached
    jitted program (shape-keyed): compile cost is one small graph per distinct
    layer size instead of one graph linear in log(height) — the per-log_n plan
    cache discipline of the reference (backend_vulkan.rs:977-996) applied to
    compile artifacts.
    """
    groups: dict = {}
    for h in sorted({int(m.shape[0]) for m in matrices}, reverse=True):
        mats = []
        for k, m in enumerate(matrices):
            if int(m.shape[0]) == h:
                mats.append(m)
                if salts is not None:
                    mats.append(salts[k])
        groups[h] = mats
    max_h = max(groups)
    digests = _leaf_layer(*[gather_if_tiny(m) for m in groups[max_h]], impl=impl)
    return build_layers_from_digests(
        digests, max_h, groups, impl=impl, allow_host_tail=allow_host_tail
    )


def build_layers_from_digests(
    digests, max_h: int, groups: Optional[dict] = None,
    impl: Optional[str] = None, allow_host_tail: bool = True,
):
    """Compress chain from an existing (max_h, 4, 2) leaf-digest layer to the
    root, with optional per-height injected groups.  Small upper layers build
    on the host CPU backend (poseidon2_mmcs.build_layers_from_digests
    rationale: one Mosaic/XLA compile per layer SHAPE costs seconds over the
    tunnel for microseconds of compute; Keccak digest layers are raw u32 on
    both sides, so host layers store with no conversion).  Shared with the
    streamed wide-trace commit (prover/wide.py)."""
    from .poseidon2_mmcs import _cpu_device, _merkle_host_tail_log

    groups = groups or {}
    layers = [digests]
    h = max_h
    tail = _merkle_host_tail_log() if allow_host_tail else 0
    cpu = _cpu_device()
    while h > 1 and not (tail and cpu is not None and (h >> 1) <= (1 << tail)):
        h >>= 1
        digests = _compress_layer(gather_if_tiny(digests), impl=impl)
        if h in groups:
            digests = _compress_pairwise(
                digests,
                _leaf_layer(*[gather_if_tiny(m) for m in groups[h]], impl=impl),
                impl=impl,
            )
        layers.append(digests)
    if h > 1:  # host tail: forced rolled XLA impls (see pcs._commit_on_host)
        import os as _os

        forced = {
            "TPU_STARK_KECCAK_IMPL": "xla",
            "TPU_STARK_KECCAK_LAYOUT": "stacked",
        }
        saved = {k: _os.environ.get(k) for k in forced}
        _os.environ.update(forced)
        try:
            digests = jax.device_put(np.asarray(digests), cpu)
            while h > 1:
                h >>= 1
                digests = _compress_layer(digests, impl="xla")
                if h in groups:
                    mats = [
                        jax.device_put(np.asarray(m), cpu) for m in groups[h]
                    ]
                    digests = _compress_pairwise(
                        digests, _leaf_layer(*mats, impl="xla"), impl="xla"
                    )
                layers.append(np.asarray(digests))
        finally:
            for k, v in saved.items():
                if v is None:
                    _os.environ.pop(k, None)
                else:
                    _os.environ[k] = v
    return layers
