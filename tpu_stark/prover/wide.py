"""Streaming prover for very wide traces (keccak-air at 2^20 rows).

BASELINE config 4 asks for an end-to-end keccak-air prove at 2^20 rows.  The
dense prover path materializes the full committed LDE (and the quotient-domain
trace): at 3,608 columns x 2^21 LDE rows that is ~30 GB — double the single
v5e's HBM.  The reference has no answer at this scale (SURVEY.md par5.7 notes
"all proving is one-shot in-memory; for the TPU build at 2^24 rows, streaming");
this module is that streaming subsystem, built TPU-first:

* the trace lives on device as **uint8 bits** (keccak-air columns are bits:
  0.9 GB at 2^20 x 3608 instead of 15 GB);
* the committed LDE is never materialized: column chunks stream through
  iNTT -> coset NTT -> bit-reversal -> an **incremental sponge absorb**
  carrying one running state across chunks (Poseidon2: (lde_h, 16) state or
  the Pallas VMEM-resident absorb; Keccak: ``KeccakRowStream`` carrying the
  partial 17-u64 rate block across chunk boundaries) — the Merkle leaf
  digests come out chunk by chunk, byte-identical to the dense MMCS commits
  (differentially tested, tests/test_wide_prove.py);
* zk mode: the committed polynomial is the randomized T' = T + Z_H·R with R
  streamed per column chunk from the counter-based device rng, and hiding
  leaf salts absorbed after the row values (lazy descriptors retained — the
  lowmem lever);
* the quotient is evaluated **per AIR column-partition per quotient sub-coset**
  (air.keccak_air.Partition): each partition low-degree-extends only the
  handful of columns its constraints read, evaluates, and alpha-folds into a
  per-coset accumulator — peak memory is one partition's columns, not the
  trace width;
* the open phase recomputes chunk LDEs on demand for the out-of-domain
  coefficient evaluations, the FRI reduced-opening accumulation, and the query
  row gathers (pcs.py dispatches on ``WideMatrixSource``).

Everything downstream (FRI folds, grinding, query Merkle paths, the verifier)
is the standard path — proofs from this prover verify with the unchanged
``prover/verify.py`` and, at sizes where the dense path fits, are
**byte-identical** to dense proofs.

Reference correspondence: the capability matched is p3's keccak-air example
prove (SURVEY.md par7.1 step 12); the streaming architecture itself has no
reference counterpart (the Rust stack is host-RAM-bound one-shot).
"""

from __future__ import annotations

import functools
import os
import time
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..air.air import BaseAir, SymbolicAirBuilder, get_symbolic_info
from ..air.builders import QuotientBuilder
from ..air.values import DevVal
from ..commit import poseidon2_mmcs
from ..commit.pcs import PcsProverData, _eval_at_point
from ..fields import babybear as bb
from ..fields import extension as ext4
from ..fields import ref_field as rf
from ..fri.domains import TwoAdicCoset
from ..matrix import log2_strict, reverse_matrix_index_bits
from .proof import Commitments, OpenedValues, Proof


def _wide_chunk_for(lde_h: int) -> int:
    """Column-chunk width: bounded so one chunk's (lde_h, chunk) u32
    intermediate stays ~<=1 GB.  The whole per-chunk pipeline now runs as a
    handful of jitted programs (see ``_tf_coeffs_fn``/``_lde_br_fn``), so the
    in-flight set is XLA-managed (~4-6x one chunk) instead of the r3 eager
    chain's dozens of materialized temporaries — which is what limited r3 to
    32-column chunks (113 chunk iterations for the keccak-air commit, each
    paying tunneled per-op dispatch; 829 s).  TPU_STARK_WIDE_CHUNK overrides."""
    env = os.environ.get("TPU_STARK_WIDE_CHUNK")
    if env:
        return int(env)
    budget_elems = (1 << 30) // 4
    return max(poseidon2_mmcs.RATE, min(512, (budget_elems // lde_h) // 8 * 8))


# -- jitted per-chunk pipelines ----------------------------------------------
# Each step below is ONE compiled program per shape.  The r3 eager chain
# (gather -> from_u32 -> idft -> randomize -> scale -> pad -> dft -> bitrev)
# both OOMed (eager elementwise ops materialize every _umul32_wide temp:
# ~8 full-size u32 arrays per mul at (2^20, 768) — the keccak-air 2^20
# quotient death, _r3_logs/keccak_air_2p20.log) and crawled on the tunneled
# chip, where every eager op is a separate remote dispatch and, cold, a
# 0.3-0.8 s remote compile each (measured: _r4_logs/p2chain_2p16_diag.log).


@jax.jit
def _monty_cols_fn(trace_dev, cols):
    return bb.from_u32(trace_dev[:, cols].astype(bb.u32))


@jax.jit
def _tf_coeffs_plain_fn(trace_dev, cols):
    """Trace-frame coefficients of the given columns (non-zk)."""
    from ..ntt import radix2

    return radix2.idft_batch(bb.from_u32(trace_dev[:, cols].astype(bb.u32)))


@jax.jit
def _tf_coeffs_zk_chunk_fn(trace_dev, cols, zk_key, chunk_idx):
    """Trace-frame committed T' = [q - r ; r] coefficients for one ALIGNED
    column chunk (randomizer stream = fold_in(key, chunk_idx), full chunk)."""
    from ..compat.device_rng import _sample_monty
    from ..ntt import radix2

    q = radix2.idft_batch(bb.from_u32(trace_dev[:, cols].astype(bb.u32)))
    r = _sample_monty(
        jax.random.fold_in(zk_key, chunk_idx), q.shape[0], q.shape[1]
    )
    return jnp.concatenate([bb.sub(q, r), r], axis=0)


@jax.jit
def _tf_coeffs_zk_cols_fn(trace_dev, cols, rand):
    """As above for ARBITRARY columns, with the (n, k) randomizer values
    (regenerated per-chunk outside) passed in."""
    from ..ntt import radix2

    q = radix2.idft_batch(bb.from_u32(trace_dev[:, cols].astype(bb.u32)))
    return jnp.concatenate([bb.sub(q, rand), rand], axis=0)


@functools.partial(jax.jit, static_argnums=(2,))
def _lde_br_fn(tf_coeffs, sigma_pows, log_blowup):
    """(N, wc) trace-frame coeffs -> (N << log_blowup, wc) bit-reversed
    committed-codeword columns (plain-frame relabel, pad, NTT, bitrev)."""
    from ..ntt import radix2

    h, wc = tf_coeffs.shape
    r_small = bb.mul(tf_coeffs, sigma_pows[:, None])
    r_pad = jnp.zeros((h << log_blowup, wc), dtype=bb.u32).at[:h].set(r_small)
    return reverse_matrix_index_bits(radix2.dft_batch(r_pad))


@jax.jit
def _scale_coeffs_fn(tf_coeffs, sigma_pows):
    return bb.mul(tf_coeffs, sigma_pows[:, None])


@jax.jit
def _eval_chunk_fn(tf_coeffs, sigma_pows, zpow):
    """Plain-frame polynomial-at-point for a coefficient chunk: (wc, 4)."""
    return _eval_at_point(bb.mul(tf_coeffs, sigma_pows[:, None]), zpow)


class WideMatrixSource:
    """A committed matrix too large to materialize: recomputes bit-reversed
    LDE column chunks on demand from the device-resident compact trace.

    Quacks enough like a committed device matrix for the PCS plumbing:
    ``.shape`` is the LDE shape and ``src[rows]`` gathers full LDE rows (the
    query-opening path in ``Poseidon2Mmcs.open_batch_many_lazy``).

    zk mode (``zk_seed`` given): the committed polynomial is the randomized
    T'(x) = T(x) + Z_H(x)·R(x) of degree < 2n (prove.py's construction),
    with R drawn counter-based PER COLUMN CHUNK from the device rng
    (fold_in(key("trace"), chunk_index)) so any pass over any column subset
    regenerates the same values without materializing the (n, w) randomizer.
    With a single chunk this reproduces the dense prover's draw exactly
    (byte-identical proofs, tests/test_wide_prove.py); with many chunks the
    stream is split per chunk — same distribution, wide-only layout."""

    def __init__(
        self,
        trace_np: np.ndarray,  # (n, w) canonical uint8/uint16/uint32 host
        dft,
        log_blowup: int,
        domain: TwoAdicCoset,
        col_chunk: Optional[int] = None,
        zk_seed: Optional[int] = None,
    ):
        self.n, self.w = (int(trace_np.shape[0]), int(trace_np.shape[1]))
        assert self.n == domain.size
        self.log_n = domain.log_n
        self.log_blowup = log_blowup
        self.zk = zk_seed is not None
        self.n_committed = 2 * self.n if self.zk else self.n
        self.lde_h = self.n_committed << log_blowup
        self.dft = dft
        self.domain = domain
        self.col_chunk = col_chunk or _wide_chunk_for(self.lde_h)
        assert self.col_chunk % poseidon2_mmcs.RATE == 0
        self.trace_dev = jax.device_put(trace_np)
        if self.zk:
            assert domain.shift == 1, "zk wide commits on the natural domain"
            from ..compat.device_rng import DeviceRng

            self._zk_key = DeviceRng(zk_seed, "trace")._key
        # relabeling scale onto the plain frame (same as pcs.commit)
        self._sigma = (bb.GENERATOR * rf.finv(domain.shift)) % bb.P
        # Streamed x sharded composition (VERDICT r4 #5): when the PCS's dft
        # facade is the mesh one (ShardedDft, dist/pcs.py), every per-chunk
        # transform runs the distributed DIF/DIT kernels with rows sharded
        # over the mesh — column-streaming (this class) composes with
        # row-sharding (dist/ntt.py), the 2^24-scale layout BASELINE's
        # multi-chip north star names.  Gated on the bitrev-reshard minimum
        # (every transform height >= n_dev^2); smaller traces fall back to
        # the replicated per-chunk pipeline unchanged.
        self._mesh = None
        mesh = getattr(dft, "mesh", None)
        if mesh is not None:
            log_nd = log2_strict(int(mesh.devices.size))
            if self.log_n >= 2 * log_nd:
                self._mesh = mesh

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.lde_h, self.w)

    def chunks(self):
        for off in range(0, self.w, self.col_chunk):
            yield off, min(self.col_chunk, self.w - off)

    # -- per-chunk pipeline --------------------------------------------------
    def _sigma_pows(self) -> jnp.ndarray:
        """(n_committed,) plain-frame relabel scale (device-cached table)."""
        return bb.powers_monty(self._sigma, self.n_committed)

    def monty_cols(self, cols) -> jnp.ndarray:
        """(n, k) Monty device values of the given global columns."""
        return _monty_cols_fn(self.trace_dev, jnp.asarray(np.asarray(cols)))

    def _rand_chunk(self, chunk_idx: int, wc: int) -> jnp.ndarray:
        """(n, wc) Monty randomizer columns of chunk ``chunk_idx``."""
        from ..compat.device_rng import _sample_monty

        key = jax.random.fold_in(self._zk_key, chunk_idx)
        return _sample_monty(key, self.n, wc)

    def _rand_cols(self, cols: np.ndarray) -> jnp.ndarray:
        """(n, k) randomizer values of ARBITRARY global columns (repeats
        allowed — the padded quotient panels repeat a filler column) —
        regenerated from the per-chunk counter-based streams."""
        cols = np.asarray(cols)
        uniq, inverse = np.unique(cols, return_inverse=True)
        parts = []
        for c in sorted({int(j) // self.col_chunk for j in uniq}):
            off = c * self.col_chunk
            wc = min(self.col_chunk, self.w - off)
            local = np.array(
                [int(j) - off for j in uniq if off <= int(j) < off + wc],
                dtype=np.int32,
            )
            parts.append(self._rand_chunk(c, wc)[:, jnp.asarray(local)])
        full = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        return full[:, jnp.asarray(inverse.astype(np.int32))]

    def _tf_coeffs_mesh(self, cols_dev, rand) -> jnp.ndarray:
        """Mesh twin of the _tf_coeffs_* programs: sharded iNTT via the
        distributed kernels; zk doubles rows as [q - r ; r] like the dense
        construction (identical values => byte-identical proofs)."""
        from ..dist import ntt as dntt

        mesh = self._mesh
        evals = _monty_cols_fn(self.trace_dev, cols_dev)
        evals = jax.device_put(evals, dntt.row_sharding(mesh))
        br = dntt.bitrev_reshard_fn(mesh, self.log_n)(evals)
        q = dntt.idft_from_br_fn(mesh, self.log_n)(br)
        if rand is None:
            return q
        rand = jax.device_put(rand, dntt.row_sharding(mesh))
        return jnp.concatenate([bb.sub(q, rand), rand], axis=0)

    def tf_coeffs_chunk(self, off: int, wc: int) -> jnp.ndarray:
        """(n_committed, wc) TRACE-FRAME committed coefficients of the
        aligned chunk [off, off+wc)."""
        cols = jnp.asarray(np.arange(off, off + wc))
        if self._mesh is not None:
            rand = (
                self._rand_chunk(off // self.col_chunk, wc) if self.zk else None
            )
            return self._tf_coeffs_mesh(cols, rand)
        if self.zk:
            return _tf_coeffs_zk_chunk_fn(
                self.trace_dev, cols, self._zk_key,
                jnp.int32(off // self.col_chunk),
            )
        return _tf_coeffs_plain_fn(self.trace_dev, cols)

    def quotient_coeffs_cols(self, cols: np.ndarray) -> jnp.ndarray:
        """(n_committed, k) TRACE-FRAME committed coefficients of arbitrary
        columns (no plain-frame relabel) — the streamed quotient evaluates
        T' on the quotient sub-cosets from these."""
        cols_dev = jnp.asarray(np.asarray(cols))
        if self._mesh is not None:
            return self._tf_coeffs_mesh(
                cols_dev, self._rand_cols(cols) if self.zk else None
            )
        if self.zk:
            return _tf_coeffs_zk_cols_fn(
                self.trace_dev, cols_dev, self._rand_cols(cols)
            )
        return _tf_coeffs_plain_fn(self.trace_dev, cols_dev)

    def coeff_chunk(self, off: int, wc: int) -> jnp.ndarray:
        """(n_committed, wc) plain-frame coefficients (the dense path's
        r_small)."""
        return _scale_coeffs_fn(self.tf_coeffs_chunk(off, wc), self._sigma_pows())

    def lde_br_chunk(self, off: int, wc: int) -> jnp.ndarray:
        """(lde_h, wc) bit-reversed committed-codeword columns."""
        if self._mesh is not None:
            from ..dist import ntt as dntt

            mesh = self._mesh
            log_nc = log2_strict(self.n_committed)
            tf = self.tf_coeffs_chunk(off, wc)
            r_small = dntt.scale_rows_by_powers_fn(mesh, log_nc, self._sigma)(tf)
            r_pad = dntt._pad_rows_fn(mesh, log_nc, self.log_blowup, wc)(r_small)
            # dist dft_br_fn's output IS the bit-reversed committed frame
            return dntt.dft_br_fn(mesh, log_nc + self.log_blowup)(r_pad)
        return _lde_br_fn(
            self.tf_coeffs_chunk(off, wc), self._sigma_pows(), self.log_blowup
        )

    # -- PCS hooks -------------------------------------------------------------
    def __getitem__(self, rows) -> jnp.ndarray:
        """Full LDE rows at the given bit-reversed indices (query openings)."""
        parts = [
            self.lde_br_chunk(off, wc)[rows] for off, wc in self.chunks()
        ]
        return jnp.concatenate(parts, axis=1)

    def eval_at_point(self, z_y) -> jnp.ndarray:
        """(w, 4) Monty device: every column's polynomial at the plain-frame
        point (the dense path's ``_eval_at_point`` over streamed coeffs)."""
        zpow = ext4.powers_device(z_y, self.n_committed)
        parts = [
            _eval_chunk_fn(
                self.tf_coeffs_chunk(off, wc), self._sigma_pows(), zpow
            )
            for off, wc in self.chunks()
        ]
        return jnp.concatenate(parts, axis=0)

    def reduced_contrib(self, apows, p_z, z_dev, y_br) -> jnp.ndarray:
        """sum_col alpha^k (y_col(x) - y_col(z)) / (x - z) streamed over
        chunks — the dense path's ``_reduced_quotient`` on the whole matrix."""
        from ..commit.pcs import _reduced_quotient

        acc = ext4.zero((self.lde_h,))
        for off, wc in self.chunks():
            acc = ext4.add(
                acc,
                _reduced_quotient(
                    self.lde_br_chunk(off, wc),
                    apows[off : off + wc],
                    p_z[off : off + wc],
                    z_dev,
                    y_br,
                ),
            )
        return acc


# ---------------------------------------------------------------------------
# Streaming commit (Poseidon2 MMCS)
# ---------------------------------------------------------------------------
@jax.jit
def _absorb_chunk(state: jnp.ndarray, chunk: jnp.ndarray) -> jnp.ndarray:
    """Continue the PaddingFreeSponge overwrite-absorb with more row columns
    (chunk width is a RATE multiple except for the final ragged chunk).
    Full-rate blocks run under one lax.scan so the graph holds ONE permutation
    body, not col_chunk/RATE unrolled copies."""
    from ..hash import poseidon2

    rate = poseidon2_mmcs.RATE
    k = int(chunk.shape[1])
    full = (k // rate) * rate
    if full:
        blocks = jnp.transpose(
            chunk[:, :full].reshape(chunk.shape[0], -1, rate), (1, 0, 2)
        )  # (n_blocks, rows, RATE)

        def body(st, blk):
            st = st.at[:, :rate].set(blk)
            return poseidon2.permute_batched(st), None

        state, _ = jax.lax.scan(body, state, blocks)
    if k > full:
        blk = chunk[:, full:]
        state = state.at[:, : blk.shape[1]].set(blk)
        state = poseidon2.permute_batched(state)
    return state


def _wide_salts(mmcs, lde_h: int):
    """Hiding salts for the streamed commit: draw from the MMCS's persistent
    rng exactly like ``mmcs.commit`` would.  Counter-based rngs keep only the
    lazy descriptor (the 2^24 lowmem lever); host streams materialize."""
    if not mmcs.hiding:
        return None, None
    rng = mmcs._rng
    if hasattr(rng, "sample_lazy"):
        handle = rng.sample_lazy(lde_h, mmcs.SALT_ELEMS)
        return handle.materialize(), handle
    s = jnp.asarray(rng.sample_babybear_matrix_monty(lde_h, mmcs.SALT_ELEMS))
    return s, s


class P2RowStream:
    """Carry-state Poseidon2 sponge over column chunks (the field-native twin
    of ``KeccakRowStream``): rate-8 blocks straddling chunk boundaries ride
    the pending-columns buffer; ``finalize`` permutes the final partial block
    exactly like ``poseidon2_mmcs.hash_rows_batched``."""

    def __init__(self, n_rows: int):
        self._state = jnp.zeros((n_rows, poseidon2_mmcs.WIDTH), dtype=bb.u32)
        self._pend: Optional[jnp.ndarray] = None  # (n, < RATE) Monty cols
        self._n = n_rows

    def absorb_cols(self, mat_monty: jnp.ndarray) -> None:
        if self._pend is not None:
            mat_monty = jnp.concatenate([self._pend, mat_monty], axis=1)
            self._pend = None
        k = int(mat_monty.shape[1])
        full = (k // poseidon2_mmcs.RATE) * poseidon2_mmcs.RATE
        if full:
            self._state = _absorb_chunk(self._state, mat_monty[:, :full])
        if k > full:
            self._pend = mat_monty[:, full:]

    def finalize(self) -> jnp.ndarray:
        """(N, OUT) Monty digests."""
        if self._pend is not None:
            k = int(self._pend.shape[1])
            state = self._state.at[:, :k].set(self._pend)
            from ..hash import poseidon2

            self._state = poseidon2.permute_batched(state)
            self._pend = None
        return self._state[:, : poseidon2_mmcs.OUT]


def commit_wide(
    pcs, domain: TwoAdicCoset, source: WideMatrixSource
) -> Tuple[tuple, PcsProverData]:
    """Streamed analog of ``pcs.commit([(domain, evals)])`` for one wide
    matrix: identical Merkle root, no materialized LDE.  Supports both
    commitment stacks — Poseidon2 (field-native, Pallas carry-state absorb)
    and Keccak (the reference's only stack, ``fib_air.rs:28-51``, via the
    ``KeccakRowStream`` carry absorb: 17-u64 rate blocks straddling column
    chunks ride the carried partial block) — and hiding (salt columns
    absorbed after the row values, per-leaf like the dense MMCS)."""
    from ..commit.merkle import MerkleTreeMmcs
    from ..commit.merkle import _digest_at as _keccak_digest_at
    from ..commit.merkle import ProverData as KeccakProverData
    from ..hash.sponge import KeccakRowStream

    mmcs = pcs.val_mmcs
    assert getattr(pcs, "zk_layout", "tpu") == "tpu" or not mmcs.hiding, (
        "streamed commit supports the tpu hiding layout (p3 add_random_cols "
        "would append dense random columns; use the dense prover there)"
    )
    timing = os.environ.get("TPU_STARK_TIMING") == "1"
    t0 = time.perf_counter()
    salt_mat, salt_store = _wide_salts(mmcs, source.lde_h)

    if isinstance(mmcs, MerkleTreeMmcs):  # Keccak stack
        stream = KeccakRowStream(source.lde_h)
        for off, wc in source.chunks():
            stream.absorb_cols(bb.to_u32(source.lde_br_chunk(off, wc)))
            # serialize chunks: an unbounded dispatch queue lets several
            # chunks' multi-GB NTT intermediates coexist (observed OOM)
            jax.block_until_ready(stream._state[0][0])
        if salt_mat is not None:
            stream.absorb_cols(bb.to_u32(salt_mat))
        digests = stream.finalize()  # (lde_h, 4, 2)
        del salt_mat
        from ..commit.merkle import build_layers_from_digests as _keccak_chain

        layers = _keccak_chain(digests, source.lde_h)
        root = _keccak_digest_at(layers[-1], 0)
        data = KeccakProverData(
            [source], None if salt_store is None else [salt_store], layers, root
        )
        if timing:
            jax.block_until_ready(layers[-1])
            print(
                f"[wide] streamed keccak commit ({source.lde_h}x{source.w}"
                f"{', hiding' if mmcs.hiding else ''}): "
                f"{time.perf_counter() - t0:.3f}s",
                flush=True,
            )
        return root, PcsProverData(data, [source], [domain], [source.w])

    assert isinstance(mmcs, poseidon2_mmcs.Poseidon2Mmcs)
    from ..hash import pallas_poseidon2

    rate = poseidon2_mmcs.RATE
    use_pallas = (
        poseidon2_mmcs._poseidon2_impl() == "pallas"
        and pallas_poseidon2.supports(source.lde_h, rate)
        and not mmcs.hiding  # hiding absorbs a 4-col salt tail: carry path
    )
    if use_pallas:
        # VMEM-resident absorb (state never round-trips HBM between rate
        # blocks): the XLA scan fallback below pays ~21 rounds x 2 x state
        # HBM traffic per rate block — ~2.5 TB for a 2^21 x 3608 commit.
        state_t = jnp.zeros((poseidon2_mmcs.WIDTH, source.lde_h), dtype=bb.u32)
        first = True
        for off, wc in source.chunks():
            mat_t = source.lde_br_chunk(off, wc).T
            k_pad = -(-wc // rate) * rate
            if k_pad > wc:
                mat_t = jnp.concatenate(
                    [mat_t, jnp.zeros((k_pad - wc, source.lde_h), dtype=bb.u32)],
                    axis=0,
                )
            state_t = pallas_poseidon2.absorb_rows_transposed(
                state_t, mat_t, n_items=wc, first=first
            )
            # serialize chunks (see above)
            jax.block_until_ready(state_t)
            first = False
        digests = state_t[: poseidon2_mmcs.OUT].T
    else:
        stream = P2RowStream(source.lde_h)
        for off, wc in source.chunks():
            stream.absorb_cols(source.lde_br_chunk(off, wc))
            jax.block_until_ready(stream._state)
        if salt_mat is not None:
            stream.absorb_cols(salt_mat)
        digests = stream.finalize()
        del salt_mat
    layers = poseidon2_mmcs.build_layers_from_digests(digests, source.lde_h)
    root = poseidon2_mmcs._digest_at(layers[-1], 0)
    if timing:
        jax.block_until_ready(layers[-1])
        print(
            f"[wide] streamed commit ({source.lde_h}x{source.w}"
            f"{', hiding' if mmcs.hiding else ''}): "
            f"{time.perf_counter() - t0:.3f}s",
            flush=True,
        )
    data = poseidon2_mmcs.ProverData(
        [source], None if salt_store is None else [salt_store], layers, root
    )
    return root, PcsProverData(data, [source], [domain], [source.w])


# ---------------------------------------------------------------------------
# Partitioned quotient evaluation
# ---------------------------------------------------------------------------
class _PartitionBuilder(QuotientBuilder):
    """QuotientBuilder over a sparse column view: the AIR partition reads
    global column indices; only the partition's columns are materialized."""

    def __init__(self, lde, lde_next, local_cols, next_cols, selectors, pis):
        self._lpos = {int(c): i for i, c in enumerate(local_cols)}
        self._npos = {int(c): i for i, c in enumerate(next_cols)}
        self._lmat = lde
        self._nmat = lde_next
        width = 1 + max(
            [int(c) for c in local_cols] + [int(c) for c in next_cols]
        )
        main_local = [None] * width
        for c, i in self._lpos.items():
            main_local[c] = DevVal(lde[:, i])
        main_next = [None] * width
        for c, i in self._npos.items():
            main_next[c] = DevVal(lde_next[:, i])
        # skip QuotientBuilder.__init__ (it materializes every column);
        # replicate its state directly
        from ..air.air import AirBuilder

        AirBuilder.__init__(
            self,
            main_rows=[main_local, main_next],
            is_first_row=DevVal(selectors["is_first_row"]),
            is_last_row=DevVal(selectors["is_last_row"]),
            is_transition=DevVal(selectors["is_transition"]),
            public_values=[
                p if isinstance(p, DevVal) else DevVal(bb.monty_scalar(int(p)))
                for p in pis
            ],
        )
        self._constraints = []

    def main_cols(self, offset: int, indices):
        pos = self._lpos if offset == 0 else self._npos
        mat = self._lmat if offset == 0 else self._nmat
        local_idx = np.array([pos[int(c)] for c in np.asarray(indices)])
        return DevVal(mat[:, jnp.asarray(local_idx)])


def partition_counts(air: BaseAir, num_pis: int) -> List[int]:
    """Constraints emitted per partition (alpha-power offsets)."""
    counts = []
    for part in air.partitions():
        b = SymbolicAirBuilder(air.width, num_pis)
        part.eval(b)
        counts.append(b.constraint_count)
    return counts


_PANEL_COL_CHUNK = 256  # columns per coefficient/NTT dispatch
_PANEL_COL_PAD = 64  # panel widths padded to this multiple: bounds the set
# of compiled chunk shapes to {64, 128, 192, 256} per height


def _panel_cols_for(part) -> np.ndarray:
    """Class-canonical panel column order: ``local_cols`` then the
    ``next_cols`` not already present, padded to a ``_PANEL_COL_PAD``
    multiple with a repeated filler column.  Same-key partitions therefore
    map every eval access to the same panel POSITIONS — one compiled program
    per class (keccak-air: ~10 programs for 47 partitions; each extra
    compile is a multi-second remote round trip on a tunneled chip)."""
    local = part.local_cols
    in_local = {int(c) for c in local}
    extra = [int(c) for c in part.next_cols if int(c) not in in_local]
    assert len(extra) in (0, len(part.next_cols)), part.name
    cols = (
        np.concatenate([local, np.array(extra, dtype=np.int64)])
        if extra
        else np.asarray(local)
    )
    pad = (-len(cols)) % _PANEL_COL_PAD
    if pad:
        cols = np.concatenate([cols, np.full(pad, cols[0], dtype=np.int64)])
    return cols


def _block_count(n: int, u_pad: int, use_next: bool) -> int:
    """Row blocks r (power of two): sub-divide each size-n quotient coset
    into r sub-cosets so the live panel set ((n/r, u_pad) u32 x 1, or x 3
    when the partition reads next rows — current + next + block-0 for the
    wraparound) fits the budget.  This is the (height x width) bound the r3
    design lacked: partitions bounded only WIDTH, and keccak-air 2^20's
    768-column panels OOMed a 16 GB chip (VERDICT r3 item 1)."""
    budget = int(os.environ.get("TPU_STARK_QUOTIENT_PANEL_MB", "1024")) << 20
    min_log = int(os.environ.get("TPU_STARK_QUOTIENT_MIN_BLOCK_LOG", "13"))
    live = 3 if use_next else 1
    r = 1
    while r < 32 and (n // r) > (1 << min_log) and (n // r) * u_pad * 4 * live > budget:
        r <<= 1
    return r


@functools.partial(jax.jit, static_argnums=(0,))
def _panel_eval_fn(log_m, tf_coeffs, s_k):
    """Evaluate a coefficient chunk's columns on the size-2^log_m coset
    s_k*<g_m>: x^m = s_k^m is constant there, so the (npan*m)-coefficient
    columns fold to m coefficients with powers of s_k^m, then scale by
    s_k^i and one plain NTT.  s_k is DATA (every (sub-coset, row-block)
    pair has its own shift — baking it would recompile per pair)."""
    from ..ntt import radix2

    m = 1 << log_m
    npan = tf_coeffs.shape[0] // m
    s_pows = bb.powers_traced(s_k, m)
    fold = tf_coeffs[:m]
    if npan > 1:
        s_m = bb.mul(s_pows[m - 1], s_k)
        w = s_m
        for q in range(1, npan):
            fold = bb.add(fold, bb.mul(tf_coeffs[q * m : (q + 1) * m], w))
            w = bb.mul(w, s_m)
    return radix2.dft_batch(bb.mul(fold, s_pows[:, None]))


@functools.partial(jax.jit, static_argnums=(2,))
def _next_mat_fn(panel, next_sel, wrap):
    """Next-row columns for a block: block k's next rows live at the same
    positions of block k+1's panel (strided sub-cosets: row t of block k is
    global row k + r*t); the LAST block wraps into block 0 shifted by one."""
    nm = panel[:, next_sel]
    if wrap:
        nm = jnp.concatenate([nm[1:], nm[:1]], axis=0)
    return nm


@functools.partial(jax.jit, static_argnums=(0,))
def _inv_zh_fn(log_n, g_pows, shift):
    xs = bb.mul(g_pows, shift)
    zh = bb.sub(bb.pow_const(xs, 1 << log_n), bb.monty_ones(xs.shape))
    return bb.inv(zh)


@functools.partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
def _acc_add_block_fn(acc, folded, k, r: int):
    """acc[k::r] += folded, as a (m, r, 4) view with a traced block index
    (natural row i = k + r*t lives at view [t, k]) — one compile per r."""
    n = acc.shape[0]
    a3 = acc.reshape(n // r, r, 4)
    blk = ext4.add(a3[:, k, :], folded)
    return a3.at[:, k, :].set(blk).reshape(n, 4)


@jax.jit
def _mul_base_fn(acc, inv_z):
    return ext4.mul_base(acc, inv_z)


def _class_eval_fn(part, log_n: int, log_m: int, num_pis: int):
    """The un-jitted constraint-eval+fold callable for ONE partition
    instance (see ``_class_fn`` for the class-level contract)."""
    n = 1 << log_n
    last_pt = rf.finv(bb.two_adic_generator(log_n))  # trace domain shift=1

    def pfn(panel, next_mat, local_sel, gr_pows, s_k, alpha_slice, pis_monty):
        xs = bb.mul(gr_pows, s_k)  # block points s_k * g^(r*t)
        zh = bb.sub(bb.pow_const(xs, n), bb.monty_ones(xs.shape))
        selectors = {
            "is_first_row": bb.mul(
                zh, bb.inv(bb.sub(xs, bb.monty_ones(xs.shape)))
            ),
            "is_last_row": bb.mul(
                zh, bb.inv(bb.sub(xs, bb.monty_scalar(last_pt)))
            ),
            "is_transition": bb.sub(xs, bb.monty_scalar(last_pt)),
        }
        b = _PartitionBuilder(
            panel[:, local_sel],
            next_mat,
            part.local_cols,
            part.next_cols,
            selectors,
            [DevVal(pis_monty[i]) for i in range(num_pis)],
        )
        part.eval(b)
        return b.folded_constraints(alpha_slice)

    return pfn


@functools.lru_cache(maxsize=None)
def _class_fn(air_key, class_key, log_n: int, log_m: int, num_pis: int):
    """One jitted constraint-eval program per (air, partition CLASS): panel
    and next-row columns arrive pre-evaluated on the block's sub-coset; the
    program builds the trace-domain selectors from the block's points and
    alpha-folds the class's constraints.  Every same-key partition instance
    reuses it (positions are class-canonical, _panel_cols_for).

    The reuse contract — every instance's eval is positionally identical
    over its class-canonical column order — is CHECKED here (ADVICE r4):
    each instance's callable is traced to a jaxpr and compared against the
    representative's; any structural divergence (e.g. a future edit making a
    class's formula dst-dependent beyond its column lists) raises instead of
    silently producing verify-failing proofs for non-representative
    instances.  Trace-only (no compile), once per class per process."""
    from .prove import _AIR_REGISTRY

    air = _AIR_REGISTRY[air_key]
    insts = [p for p in air.partitions() if p.key == class_key]
    rep = insts[0]
    if len(insts) > 1:
        m = 1 << log_m
        counts = partition_counts(air, num_pis)
        idx = {id(p): i for i, p in enumerate(air.partitions())}
        u_pad = len(_panel_cols_for(rep))
        sd = jax.ShapeDtypeStruct
        args = (
            sd((m, u_pad), jnp.uint32),
            sd((m, max(1, len(rep.next_cols))), jnp.uint32),
            sd((len(rep.local_cols),), jnp.int32),
            sd((m,), jnp.uint32),
            sd((), jnp.uint32),
            sd((counts[idx[id(rep)]], 4), jnp.uint32),
            sd((num_pis,), jnp.uint32),
        )
        want = str(jax.make_jaxpr(_class_eval_fn(rep, log_n, log_m, num_pis))(*args))
        for p in insts[1:]:
            if len(_panel_cols_for(p)) != u_pad or counts[idx[id(p)]] != counts[
                idx[id(rep)]
            ]:
                raise ValueError(
                    f"partition class {class_key!r}: instance shape mismatch "
                    "(panel cols / constraint count) — class reuse unsound"
                )
            got = str(jax.make_jaxpr(_class_eval_fn(p, log_n, log_m, num_pis))(*args))
            if got != want:
                raise ValueError(
                    f"partition class {class_key!r}: instance eval diverges "
                    "from class representative — class-program reuse unsound"
                )
    return jax.jit(_class_eval_fn(rep, log_n, log_m, num_pis))


def quotient_chunks_streamed(
    air_key,
    air: BaseAir,
    source: WideMatrixSource,
    trace_domain: TwoAdicCoset,
    log_qd: int,
    alpha_pows_dev: jnp.ndarray,
    pis_dev: jnp.ndarray,
    num_pis: int,
) -> Tuple[List[TwoAdicCoset], List[jnp.ndarray]]:
    """Quotient chunk evaluations, one (n, 4) ext matrix per sub-coset,
    identical values to the dense ``_quotient_fn`` + ``[i::qd]`` split.

    Row-blocked: each partition's panel is evaluated per (sub-coset j,
    row-block k) on the strided sub-sub-coset {shift_j * g^(k + r*t)} —
    live memory is bounded by (n/r x u_pad) panels (see ``_block_count``),
    never the full (n x union) matrix, and every stage runs as a jitted
    program (the r3 eager chain OOMed before the first partition's iNTT,
    _r3_logs/keccak_air_2p20.log)."""
    timing = os.environ.get("TPU_STARK_TIMING") == "1"
    t0 = time.perf_counter()
    n = source.n
    log_n = trace_domain.log_n
    g_int = bb.two_adic_generator(log_n)
    qd = 1 << log_qd
    quotient_domain = trace_domain.create_disjoint_domain(n * qd)
    chunk_domains = quotient_domain.split_domains(qd)
    parts = air.partitions()
    counts = partition_counts(air, num_pis)
    offs = np.concatenate([[0], np.cumsum(counts)])

    g_pows_n = bb.powers_monty(g_int, n)
    accs = [ext4.zero((n,)) for _ in range(qd)]
    inv_zh = [
        _inv_zh_fn(log_n, g_pows_n, bb.monty_scalar(cd.shift))
        for cd in chunk_domains
    ]
    for p_idx, part in enumerate(parts):
        panel_cols = _panel_cols_for(part)
        u_pad = len(panel_cols)
        use_next = len(part.next_cols) > 0
        r = _block_count(n, u_pad, use_next)
        log_m = log_n - (r.bit_length() - 1)
        m = 1 << log_m
        pos: dict = {}
        for i, c in enumerate(panel_cols):
            pos.setdefault(int(c), i)
        local_sel = jnp.asarray(
            np.array([pos[int(c)] for c in part.local_cols], dtype=np.int32)
        )
        next_sel = jnp.asarray(
            np.array([pos[int(c)] for c in part.next_cols], dtype=np.int32)
        )
        # trace-frame committed coefficients, chunked by columns, computed
        # ONCE per partition and reused by every (coset, block) evaluation.
        tf_chunks = []
        for c_off in range(0, u_pad, _PANEL_COL_CHUNK):
            cc = panel_cols[c_off : c_off + _PANEL_COL_CHUNK]
            tf = source.quotient_coeffs_cols(cc)
            # serialize dispatches: bounds in-flight NTT temps (r3's
            # observed runtime HBM exhaustion mode)
            jax.block_until_ready(tf)
            tf_chunks.append(tf)
        alpha_slice = alpha_pows_dev[offs[p_idx] : offs[p_idx + 1]]
        pfn = _class_fn(air_key, part.key, log_n, log_m, num_pis)
        gr_pows = bb.powers_monty(bb.two_adic_generator(log_m), m)

        def build_panel(shift: int) -> jnp.ndarray:
            s_k = bb.monty_scalar(shift)
            panels = [_panel_eval_fn(log_m, tf, s_k) for tf in tf_chunks]
            return panels[0] if len(panels) == 1 else jnp.concatenate(
                panels, axis=1
            )

        for j, cd in enumerate(chunk_domains):
            shifts = [
                (cd.shift * pow(g_int, k, bb.P)) % bb.P for k in range(r)
            ]
            p0 = build_panel(shifts[0])
            panels = {0: p0}
            for k in range(r):
                cur = panels.pop(k)
                if use_next and k + 1 < r:
                    panels[k + 1] = build_panel(shifts[k + 1])
                    nmat = _next_mat_fn(panels[k + 1], next_sel, False)
                elif use_next:  # last block wraps into block 0, shifted
                    nmat = _next_mat_fn(p0, next_sel, True)
                else:
                    nmat = _next_mat_fn(cur, next_sel, False)
                folded = pfn(
                    cur, nmat, local_sel, gr_pows,
                    bb.monty_scalar(shifts[k]), alpha_slice, pis_dev,
                )
                accs[j] = _acc_add_block_fn(accs[j], folded, jnp.int32(k), r)
                # serialize blocks (see tf_chunks note)
                jax.block_until_ready(accs[j])
                del cur, nmat, folded
                if not use_next and k + 1 < r:
                    panels[k + 1] = build_panel(shifts[k + 1])
            del p0, panels
    chunks = [_mul_base_fn(accs[j], inv_zh[j]) for j in range(qd)]
    if timing:
        jax.block_until_ready(chunks[-1])
        print(
            f"[wide] streamed quotient ({len(parts)} partitions x {qd} "
            f"cosets): {time.perf_counter() - t0:.3f}s",
            flush=True,
        )
    return chunk_domains, chunks


# ---------------------------------------------------------------------------
# The streaming prove
# ---------------------------------------------------------------------------
def prove_wide(
    config,
    air: BaseAir,
    trace: np.ndarray,  # (n, width) canonical uint8/uint32 host
    public_values: Sequence[int],
) -> Proof:
    """Same transcript as ``prove.prove`` (proofs verify with the unchanged
    verifier and match dense proofs byte-for-byte where both paths fit —
    including zk with a single column chunk); works on both commitment
    stacks (Keccak per ``fib_air.rs:28-51``, Poseidon2 field-native) and in
    zk mode (device-rng randomizer/salts streamed per chunk)."""
    from .prove import _register_air, get_log_quotient_degree

    timing = os.environ.get("TPU_STARK_TIMING") == "1"
    t_last = [time.perf_counter()]

    def mark(phase: str) -> None:
        if timing:
            now = time.perf_counter()
            print(f"[prove-wide] {phase}: {now - t_last[0]:.3f}s", flush=True)
            t_last[0] = now

    pcs = config.pcs
    challenger = config.challenger()
    n, width = trace.shape
    assert width == air.width
    assert air.partitions() is not None, (
        "wide prover needs air.partitions() (see air.keccak_air.Partition)"
    )
    if config.zk:
        assert config.zk_rng == "device", (
            "zk wide prover streams the trace randomizer from the "
            "counter-based device rng (a host SmallRng stream would "
            "materialize the full (n, w) randomizer)"
        )
    log_n = log2_strict(n)
    log_qd = get_log_quotient_degree(air, len(public_values), config.zk)

    trace_domain = pcs.natural_domain_for_degree(n)
    source = WideMatrixSource(
        trace, pcs.dft, pcs.fri.log_blowup, trace_domain,
        zk_seed=config.rng_seed if config.zk else None,
    )
    committed_domain = pcs.natural_domain_for_degree(source.n_committed)
    trace_commit, trace_data = commit_wide(pcs, committed_domain, source)
    mark("trace commit (streamed)")

    challenger.observe_u32(log_n)
    challenger.observe_commitment(trace_commit)
    challenger.observe_u32s([int(p) % bb.P for p in public_values])
    alpha = challenger.sample_ext()

    num_constraints, _ = get_symbolic_info(air, len(public_values))
    apows = [(1, 0, 0, 0)]
    for _ in range(num_constraints - 1):
        apows.append(rf.emul(apows[-1], alpha))
    alpha_pows_dev = jnp.asarray(
        bb.np_to_monty(np.array(apows, dtype=np.uint64).astype(np.uint32))
    )
    pis_dev = jnp.asarray(
        bb.np_to_monty(
            np.array([int(p) % bb.P for p in public_values], dtype=np.uint32)
        )
    )
    air_key = _register_air(air)
    chunk_domains, chunks = quotient_chunks_streamed(
        air_key, air, source, trace_domain, log_qd,
        alpha_pows_dev, pis_dev, len(public_values),
    )
    mark("quotient eval (streamed)")
    quotient_commit, quotient_data = pcs.commit(list(zip(chunk_domains, chunks)))
    mark("quotient commit")
    challenger.observe_commitment(quotient_commit)

    zeta = challenger.sample_ext()
    zeta_next = trace_domain.next_point_ext(zeta)
    qd = 1 << log_qd
    opened, fri_proof = pcs.open(
        [
            (trace_data, [[zeta, zeta_next]]),
            (quotient_data, [[zeta]] * qd),
        ],
        challenger,
    )
    mark("pcs open (streamed round + FRI + queries)")
    trace_local = [tuple(v) for v in opened[0][0][0]]
    trace_next = [tuple(v) for v in opened[0][0][1]]
    quotient_opened = [[tuple(v) for v in opened[1][i][0]] for i in range(qd)]

    return Proof(
        commitments=Commitments(trace_commit, quotient_commit),
        opened_values=OpenedValues(trace_local, trace_next, quotient_opened),
        opening_proof=fri_proof,
        degree_bits=log_n,
        log_quotient_degree=log_qd,
    )
