"""Poseidon2 Merkle MMCS + duplex challenger — the field-native commitment
stack (BASELINE configs: "Poseidon2 commit").

Mirrors the p3 BabyBear Poseidon2 stack shape:

* leaf hash    = PaddingFreeSponge<Poseidon2_16, WIDTH=16, RATE=8, OUT=8>
  (overwrite-absorb in rate-8 chunks of field elems, permute per chunk,
  squeeze the first 8 lanes);
* compression  = TruncatedPermutation<Poseidon2_16, 2, 8, 16>:
  compress(l, r) = perm(l || r)[:8];
* digests      = 8 BabyBear elements (Monty on device, canonical on host);
* challenger   = DuplexChallenger<Poseidon2_16, WIDTH=16, RATE=8>: observe
  buffers up to RATE elems then overwrite-duplexes; samples pop from the end
  of the squeezed rate window.

Unlike the byte-oriented Keccak stack (fib_air parity path), everything here
stays in the field — no serialization, and the whole tree is field arithmetic
on the VPU.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..compat.smallrng import SmallRng
from ..fields import babybear as bb
from ..hash import poseidon2
from ..matrix import log2_strict

WIDTH = 16
RATE = 8
OUT = 8

FieldDigest = Tuple[int, ...]  # 8 canonical ints


# ---------------------------------------------------------------------------
# Host primitives (per-query verification)
# ---------------------------------------------------------------------------
def hash_row_host(values: Sequence[int]) -> FieldDigest:
    vals = [int(v) % bb.P for v in values]
    if not vals:
        return tuple([0] * OUT)
    from ..compat.native import p2_hash_row_native

    out = p2_hash_row_native(vals, *poseidon2._native_consts16())
    if out is not None:  # C fast path (keccak-air leaves are 3608 wide)
        return out
    state = [0] * WIDTH
    for off in range(0, len(vals), RATE):
        chunk = vals[off : off + RATE]
        for i, v in enumerate(chunk):
            state[i] = v
        state = poseidon2.permute_host(state)
    return tuple(state[:OUT])


def compress_host(left: Sequence[int], right: Sequence[int]) -> FieldDigest:
    state = [int(v) % bb.P for v in list(left) + list(right)]
    assert len(state) == WIDTH
    return tuple(poseidon2.permute_host(state)[:OUT])


# ---------------------------------------------------------------------------
# Batched device primitives
# ---------------------------------------------------------------------------
def _poseidon2_impl() -> str:
    """Merkle-layer implementation: the Pallas kernel (all rounds
    VMEM-resident, the Poseidon2 twin of OPT-0013) on accelerators, the XLA
    lane/stacked path on CPU (Mosaic is TPU-only).  Override with
    TPU_STARK_POSEIDON2_IMPL=pallas|xla."""
    import os

    env = os.environ.get("TPU_STARK_POSEIDON2_IMPL")
    if env:
        return env
    import jax

    return "pallas" if jax.default_backend() != "cpu" else "xla"


def hash_rows_batched(mat_monty: jnp.ndarray) -> jnp.ndarray:
    """(N, k) Monty -> (N, 8) Monty digests."""
    n, k = mat_monty.shape
    if _poseidon2_impl() == "pallas":
        from ..hash import pallas_poseidon2

        if 0 < int(k) <= RATE and pallas_poseidon2.supports(int(n), WIDTH):
            # One-chunk sponge == TruncatedPermutation of [row ; zeros]
            # (overwrite-absorb into the zero state).  Routing through the
            # rate-16 compress kernel SHAPE means FRI fold-level commits
            # ((h, 8) leaves at every level) reuse the tree-compress
            # compiles instead of Mosaic-compiling a fresh (h, 8) sponge
            # per level — measured 7-27 s per remote compile, the dominant
            # cost of the r3 poseidon2-chain 2^18 stall
            # (_r4_logs/p2chain_2p16_diag.log).
            state_t = jnp.concatenate(
                [mat_monty.T, jnp.zeros((WIDTH - int(k), n), dtype=bb.u32)],
                axis=0,
            )
            out = pallas_poseidon2.hash_rows_transposed(
                state_t, n_items=WIDTH, rate=WIDTH
            )
            return out.reshape(OUT, n).T
        if pallas_poseidon2.supports(int(n), int(k)):
            return pallas_poseidon2.hash_rows(mat_monty)
    state = jnp.zeros((n, WIDTH), dtype=bb.u32)
    for off in range(0, k, RATE):
        chunk = mat_monty[:, off : off + RATE]
        state = state.at[:, : chunk.shape[1]].set(chunk)
        state = poseidon2.permute_batched(state)
    return state[:, :OUT]


def compress_batched(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) x (N, 8) -> (N, 8)."""
    if _poseidon2_impl() == "pallas":
        from ..hash import pallas_poseidon2

        if pallas_poseidon2.supports(int(left.shape[0]), WIDTH):
            return pallas_poseidon2.compress(left, right)
    state = jnp.concatenate([left, right], axis=1)
    return poseidon2.permute_batched(state)[:, :OUT]


# ---------------------------------------------------------------------------
# MMCS (same tree structure/injection rules as the Keccak MMCS)
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class ProverData:
    matrices: List[jnp.ndarray]
    salts: Optional[List[jnp.ndarray]]
    layers: List[np.ndarray]  # (N_l, 8) canonical uint32, leaves first
    root: FieldDigest


@dataclasses.dataclass
class BatchOpening:
    opened_values: List[np.ndarray]
    opened_salts: Optional[List[np.ndarray]]
    proof: List[FieldDigest]


def _digest_at(layer, i: int) -> FieldDigest:
    """Digest i of a layer: host layers are canonical np, device layers Monty."""
    if isinstance(layer, np.ndarray):
        return tuple(int(v) for v in layer[i])
    return tuple(int(v) for v in bb.np_from_monty(np.asarray(layer[i])))


@jax.jit
def _leaf_layer(*mats):
    return hash_rows_batched(jnp.concatenate(mats, axis=1))


@jax.jit
def _compress_layer(digests):
    return compress_batched(digests[0::2], digests[1::2])


@jax.jit
def _compress_pairwise(a, b):
    return compress_batched(a, b)


import functools as _functools
import os as _os


@_functools.cache
def _cpu_device():
    try:
        return jax.local_devices(backend="cpu")[0]
    except Exception:  # noqa: BLE001 — no cpu backend: host tail disabled
        return None


def _merkle_host_tail_log() -> int:
    """Tree layers at <= 2^this rows build on the host CPU backend.  Every
    DEVICE layer is a distinct compiled shape — Mosaic-compiling the full
    Poseidon2 kernel per layer costs 7-27 s per shape over the tunnel
    (measured: ~16 such compiles = the bulk of the r3 poseidon2-chain
    514 s trace-tree build, _r4_logs/p2chain_2p16_diag.log) for layers
    whose total compute is microseconds.  ``TPU_STARK_MERKLE_HOST_TAIL``
    overrides; 0 disables."""
    env = _os.environ.get("TPU_STARK_MERKLE_HOST_TAIL")
    if env is not None:
        try:
            return int(env)
        except ValueError:
            pass
    if jax.default_backend() == "cpu":
        return 0
    from ..backend.policy import current_policy

    return current_policy().fri_host_tail_log


def build_layers_from_digests(
    digests: jnp.ndarray, max_h: int, groups: Optional[dict] = None
) -> List:
    """Compress chain from an existing (max_h, 8) leaf-digest layer up to
    the root, with optional per-height injected matrix groups.  Small upper
    layers switch to the host CPU backend (host layers are stored as
    canonical numpy — the ``_digest_at``/``open_batch_many_lazy`` host-layer
    convention — so the query phase's gathers on them are tunnel-free too).
    Shared by the dense MMCS commit and the streamed wide-trace commit
    (prover/wide.py)."""
    groups = groups or {}
    layers: List = [digests]
    h = max_h
    tail = _merkle_host_tail_log()
    cpu = _cpu_device()
    while h > 1 and not (tail and cpu is not None and (h >> 1) <= (1 << tail)):
        h >>= 1
        digests = _compress_layer(digests)
        if h in groups:
            digests = _compress_pairwise(digests, _leaf_layer(*groups[h]))
        layers.append(digests)
    if h > 1:  # host tail (forced XLA impls: Mosaic is TPU-only)
        # stacked layout too: the lane layout's XLA:CPU compile runs minutes
        # per shape (see pcs._commit_on_host note — the r3 stall root cause)
        forced = {
            "TPU_STARK_POSEIDON2_IMPL": "xla",
            "TPU_STARK_POSEIDON2_LAYOUT": "stacked",
        }
        saved = {k: _os.environ.get(k) for k in forced}
        _os.environ.update(forced)
        try:
            digests = jax.device_put(np.asarray(digests), cpu)
            while h > 1:
                h >>= 1
                digests = _compress_layer(digests)
                if h in groups:
                    mats = [
                        jax.device_put(np.asarray(m), cpu) for m in groups[h]
                    ]
                    digests = _compress_pairwise(digests, _leaf_layer(*mats))
                layers.append(bb.np_from_monty(np.asarray(digests)))
        finally:
            for k, v in saved.items():
                if v is None:
                    _os.environ.pop(k, None)
                else:
                    _os.environ[k] = v
    return layers


def _build_layers(groups: dict) -> List[jnp.ndarray]:
    """Per-layer cached jits (see merkle._build_layers rationale) + host
    tail for the small upper layers (``build_layers_from_digests``)."""
    max_h = max(groups)
    return build_layers_from_digests(_leaf_layer(*groups[max_h]), max_h, groups)


class Poseidon2Mmcs:
    """Field-native Merkle MMCS (p3 MerkleTreeMmcs over Poseidon2); hiding
    variant salts rows from a persistent SmallRng like the Keccak MMCS."""

    SALT_ELEMS = 4

    def __init__(self, hiding: bool = False, rng: Optional[SmallRng] = None,
                 rng_seed: int = 1):
        self.hiding = hiding
        self._rng = rng if rng is not None else SmallRng.seed_from_u64(rng_seed)

    def commit(self, matrices: Sequence[jnp.ndarray]):
        matrices = list(matrices)
        assert matrices
        for m in matrices:
            log2_strict(int(m.shape[0]))
        salts = None
        if self.hiding:
            salts = [
                jnp.asarray(
                    self._rng.sample_babybear_matrix_monty(
                        int(m.shape[0]), self.SALT_ELEMS
                    )
                )
                for m in matrices
            ]
        groups: dict = {}
        for h in sorted({int(m.shape[0]) for m in matrices}, reverse=True):
            mats = []
            for k, m in enumerate(matrices):
                if int(m.shape[0]) == h:
                    mats.append(m)
                    if salts is not None:
                        mats.append(salts[k])
            groups[h] = mats
        layers = _build_layers(groups)
        # device-resident layers; openings batch-fetch (see merkle.py note)
        root = _digest_at(layers[-1], 0)
        return root, ProverData(matrices, salts, layers, root)

    @staticmethod
    def to_host_data(data: ProverData) -> ProverData:
        """Re-home a (CPU-built) tree as numpy (FRI host tail, pcs.py
        OPT-0018).  Matrices/salts stay Monty; layers convert to canonical —
        the host-layer convention of ``_digest_at``/``open_batch_many_lazy``."""
        return ProverData(
            [np.asarray(m) for m in data.matrices],
            None if data.salts is None else [np.asarray(s) for s in data.salts],
            [
                l if isinstance(l, np.ndarray)  # host-tail layers: already canonical
                else bb.np_from_monty(np.asarray(l))
                for l in data.layers
            ],
            data.root,
        )

    def open_batch(self, index: int, data: ProverData) -> BatchOpening:
        return self.open_batch_many([index], data)[0]

    def open_batch_many(
        self, indices: Sequence[int], data: ProverData
    ) -> List[BatchOpening]:
        """All queries' rows + sibling digests in ONE transfer, one
        vectorized gather per matrix/salt/layer (same rationale as
        merkle.MerkleTreeMmcs.open_batch_many: per-query fetches cost one
        tunnel round trip each)."""
        fetch, finish = self.open_batch_many_lazy(indices, data)
        return finish(jax.device_get(fetch))

    def open_batch_many_lazy(self, indices: Sequence[int], data: ProverData):
        """Deferred form: queue gathers, return (device_arrays, finish) so
        pcs.open can pool EVERY tree's openings into one device_get
        (OPT-0017; see merkle.MerkleTreeMmcs.open_batch_many_lazy)."""
        max_h = max(int(m.shape[0]) for m in data.matrices)
        log_max = log2_strict(max_h)
        idx_np = np.asarray(list(indices), dtype=np.int64)
        fetch: List = []
        for k, m in enumerate(data.matrices):
            h = int(m.shape[0])
            rows_np = idx_np >> (log_max - log2_strict(h))
            if isinstance(m, np.ndarray):  # host tree (FRI host tail, OPT-0018)
                fetch.append(bb.np_from_monty(m[rows_np]))
            else:
                fetch.append(bb.to_u32(m[jnp.asarray(rows_np)]))
            if data.salts is not None:
                s = data.salts[k]
                if hasattr(s, "materialize"):  # lazy salt descriptor
                    # (device_rng.LazyMatrix — regenerate-on-demand, same
                    # handling as merkle.MerkleTreeMmcs.rows_u32)
                    fetch.append(bb.to_u32(s.materialize()[jnp.asarray(rows_np)]))
                elif isinstance(s, np.ndarray):
                    fetch.append(bb.np_from_monty(s[rows_np]))
                else:
                    fetch.append(bb.to_u32(s[jnp.asarray(rows_np)]))
        cur = idx_np
        for l in range(log_max):
            layer = data.layers[l]
            sib = cur ^ 1
            fetch.append(
                layer[sib]
                if isinstance(layer, np.ndarray)
                else bb.to_u32(layer[jnp.asarray(sib)])
            )
            cur = cur >> 1

        def finish(host: List) -> List[BatchOpening]:
            return self._assemble_openings(idx_np, data, log_max, host)

        return fetch, finish

    def _assemble_openings(
        self, idx_np: np.ndarray, data: ProverData, log_max: int, host: List
    ) -> List[BatchOpening]:
        out: List[BatchOpening] = []
        n_salt = 2 if data.salts is not None else 1
        stride = len(data.matrices) * n_salt
        for q in range(len(idx_np)):
            opened, opened_salts = [], [] if data.salts is not None else None
            pos = 0
            for _ in data.matrices:
                opened.append(np.array(host[pos][q]))
                pos += 1
                if opened_salts is not None:
                    opened_salts.append(np.array(host[pos][q]))
                    pos += 1
            proof = []
            for l in range(log_max):
                proof.append(tuple(int(v) for v in host[stride + l][q]))
            out.append(BatchOpening(opened, opened_salts, proof))
        return out

    def verify_batch(
        self,
        commitment: FieldDigest,
        dimensions: Sequence[Tuple[int, int]],
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

        node = hash_row_host(rows_at(max_h))
        idx = index
        h = max_h
        for sib in opening.proof:
            node = compress_host(node, sib) if idx & 1 == 0 else compress_host(sib, node)
            idx >>= 1
            h >>= 1
            inj = rows_at(h)
            if inj:
                node = compress_host(node, hash_row_host(inj))
        return tuple(node) == tuple(commitment)


# ---------------------------------------------------------------------------
# Duplex challenger (p3 DuplexChallenger shape)
# ---------------------------------------------------------------------------
class DuplexChallenger:
    def __init__(self):
        self.state = [0] * WIDTH
        self.input_buffer: List[int] = []
        self.output_buffer: List[int] = []

    def _duplex(self) -> None:
        for i, v in enumerate(self.input_buffer):
            self.state[i] = v
        self.input_buffer.clear()
        self.state = poseidon2.permute_host(self.state)
        self.output_buffer = list(self.state[:RATE])

    def observe_u32(self, value: int) -> None:
        self.output_buffer.clear()
        self.input_buffer.append(int(value) % bb.P)
        if len(self.input_buffer) == RATE:
            self._duplex()

    def observe_u32s(self, values: Sequence[int]) -> None:
        for v in values:
            self.observe_u32(v)

    def observe_commitment(self, digest: Sequence[int]) -> None:
        self.observe_u32s(list(digest))

    def sample_u32(self) -> int:
        if self.input_buffer or not self.output_buffer:
            self._duplex()
        return self.output_buffer.pop()

    def sample_ext(self) -> Tuple[int, int, int, int]:
        return tuple(self.sample_u32() for _ in range(4))  # type: ignore[return-value]

    def sample_bits(self, bits: int) -> int:
        return self.sample_u32() & ((1 << bits) - 1)

    def clone(self) -> "DuplexChallenger":
        c = DuplexChallenger()
        c.state = list(self.state)
        c.input_buffer = list(self.input_buffer)
        c.output_buffer = list(self.output_buffer)
        return c

    def check_witness(self, bits: int, witness: int) -> bool:
        self.observe_u32(witness)
        return self.sample_bits(bits) == 0

    def grind(self, bits: int) -> int:
        for w in range(bb.P):
            if self.clone().check_witness(bits, w):
                self.observe_u32(w)
                assert self.sample_bits(bits) == 0
                return w
        raise RuntimeError("grinding failed (unreachable)")
