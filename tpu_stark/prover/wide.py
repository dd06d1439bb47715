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
    intermediate stays ~<=256 MB — the commit pipeline holds several chunk
    intermediates in flight (monty cast, coeffs, pad, NTT out, bit-reversal,
    absorb transpose) and 512-col chunks at 2^21 rows OOMed a 16 GB chip.
    TPU_STARK_WIDE_CHUNK overrides."""
    env = os.environ.get("TPU_STARK_WIDE_CHUNK")
    if env:
        return int(env)
    budget_elems = (256 << 20) // 4
    return max(poseidon2_mmcs.RATE, min(512, (budget_elems // lde_h) // 8 * 8))


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

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.lde_h, self.w)

    def chunks(self):
        for off in range(0, self.w, self.col_chunk):
            yield off, min(self.col_chunk, self.w - off)

    # -- per-chunk pipeline --------------------------------------------------
    def monty_cols(self, cols) -> jnp.ndarray:
        """(n, k) Monty device values of the given global columns."""
        raw = self.trace_dev[:, jnp.asarray(np.asarray(cols))]
        return bb.from_u32(raw.astype(bb.u32))

    def _rand_chunk(self, chunk_idx: int, wc: int) -> jnp.ndarray:
        """(n, wc) Monty randomizer columns of chunk ``chunk_idx``."""
        from ..compat.device_rng import _sample_monty

        key = jax.random.fold_in(self._zk_key, chunk_idx)
        return _sample_monty(key, self.n, wc)

    def _rand_cols(self, cols: np.ndarray) -> jnp.ndarray:
        """(n, k) randomizer values of sorted-unique global columns —
        regenerated from the per-chunk counter-based stream."""
        cols = np.asarray(cols)
        assert np.all(np.diff(cols) > 0), "cols must be sorted unique"
        parts = []
        for c in sorted({int(j) // self.col_chunk for j in cols}):
            off = c * self.col_chunk
            wc = min(self.col_chunk, self.w - off)
            local = np.array(
                [int(j) - off for j in cols if off <= int(j) < off + wc],
                dtype=np.int32,
            )
            parts.append(self._rand_chunk(c, wc)[:, jnp.asarray(local)])
        return jnp.concatenate(parts, axis=1)

    def _randomize(self, q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
        """Trace coeffs (n, k) -> committed T' coeffs (2n, k):
        [q - r ; r] (T + Z_H·R with Z_H = x^n - 1)."""
        return jnp.concatenate([bb.sub(q, r), r], axis=0)

    def coeff_chunk(self, off: int, wc: int) -> jnp.ndarray:
        """(n_committed, wc) plain-frame coefficients (the dense path's
        r_small)."""
        q = self.dft.idft_batch(self.monty_cols(np.arange(off, off + wc)))
        if self.zk:
            q = self._randomize(q, self._rand_chunk(off // self.col_chunk, wc))
        return bb.mul(q, bb.powers_monty(self._sigma, self.n_committed)[:, None])

    def quotient_coeffs_cols(self, cols: np.ndarray) -> jnp.ndarray:
        """(n_committed, k) TRACE-FRAME committed coefficients of arbitrary
        columns (no plain-frame relabel) — the streamed quotient evaluates
        T' on the quotient sub-cosets from these."""
        q = self.dft.idft_batch(self.monty_cols(cols))
        if self.zk:
            q = self._randomize(q, self._rand_cols(cols))
        return q

    def lde_br_chunk(self, off: int, wc: int) -> jnp.ndarray:
        """(lde_h, wc) bit-reversed committed-codeword columns."""
        r_small = self.coeff_chunk(off, wc)
        r_pad = jnp.zeros((self.lde_h, wc), dtype=bb.u32).at[
            : self.n_committed
        ].set(r_small)
        return reverse_matrix_index_bits(self.dft.dft_batch(r_pad))

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
            _eval_at_point(self.coeff_chunk(off, wc), zpow)
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
    from ..commit.merkle import _compress_layer as _keccak_compress
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
        layers = [digests]
        h = source.lde_h
        while h > 1:
            h >>= 1
            digests = _keccak_compress(digests)
            layers.append(digests)
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
    layers = [digests]
    h = source.lde_h
    while h > 1:
        h >>= 1
        digests = poseidon2_mmcs._compress_layer(digests)
        layers.append(digests)
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


@functools.lru_cache(maxsize=None)
def _partition_fn(air_key, part_idx: int, log_n: int, num_pis: int):
    """One jitted program per (air, partition): coset NTT of the partition's
    columns is done eagerly outside; this evaluates constraints + alpha-folds.
    xs (the coset points) is data, so all ``qd`` sub-cosets share the compile."""
    from .prove import _AIR_REGISTRY

    air = _AIR_REGISTRY[air_key]
    part = air.partitions()[part_idx]
    n = 1 << log_n
    last_pt = rf.finv(bb.two_adic_generator(log_n))  # trace domain shift=1

    @jax.jit
    def pfn(lde_union, local_sel, next_sel, xs, alpha_slice, pis_monty):
        # selectors of the trace domain over this coset, from traced points
        zh = bb.sub(bb.pow_const(xs, n), bb.monty_ones(xs.shape))
        first = bb.mul(zh, bb.inv(bb.sub(xs, bb.monty_ones(xs.shape))))
        last = bb.mul(zh, bb.inv(bb.sub(xs, bb.monty_scalar(last_pt))))
        transition = bb.sub(xs, bb.monty_scalar(last_pt))
        selectors = {
            "is_first_row": first,
            "is_last_row": last,
            "is_transition": transition,
        }
        lde_next = jnp.roll(lde_union, -1, axis=0)
        b = _PartitionBuilder(
            lde_union[:, local_sel],
            lde_next[:, next_sel],
            part.local_cols,
            part.next_cols,
            selectors,
            [DevVal(pis_monty[i]) for i in range(num_pis)],
        )
        part.eval(b)
        folded = b.folded_constraints(alpha_slice)
        return folded, bb.inv(zh)

    return pfn


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
    identical values to the dense ``_quotient_fn`` + ``[i::qd]`` split."""
    timing = os.environ.get("TPU_STARK_TIMING") == "1"
    t0 = time.perf_counter()
    n = source.n
    log_n = trace_domain.log_n
    qd = 1 << log_qd
    quotient_domain = trace_domain.create_disjoint_domain(n * qd)
    chunk_domains = quotient_domain.split_domains(qd)
    parts = air.partitions()
    counts = partition_counts(air, num_pis)
    offs = np.concatenate([[0], np.cumsum(counts)])

    base_pts = bb.powers_monty(bb.two_adic_generator(log_n), n)
    accs = [ext4.zero((n,)) for _ in range(qd)]
    inv_zeroifier: List[Optional[jnp.ndarray]] = [None] * qd
    for p_idx, part in enumerate(parts):
        union = np.unique(np.concatenate([part.local_cols, part.next_cols]))
        upos = {int(c): i for i, c in enumerate(union)}
        local_sel = jnp.asarray(
            np.array([upos[int(c)] for c in part.local_cols], dtype=np.int32)
        )
        next_sel = jnp.asarray(
            np.array([upos[int(c)] for c in part.next_cols], dtype=np.int32)
        )
        # one iNTT per partition; each sub-coset reuses the coefficients.
        # zk: coeffs are the degree-<2n committed T' — evaluating on a
        # size-n coset c·K_n folds the halves first (x^n = c^n is constant
        # on the coset): p(x) = sum_i (c_i + c^n·c_{i+n}) x^i there.
        coeffs = source.quotient_coeffs_cols(union)
        alpha_slice = alpha_pows_dev[offs[p_idx] : offs[p_idx + 1]]
        pfn = _partition_fn(air_key, p_idx, log_n, num_pis)
        for j, cd in enumerate(chunk_domains):
            spow = bb.powers_monty(cd.shift, n)
            if source.zk:
                c_n = bb.monty_scalar(pow(cd.shift, n, bb.P))
                folded_c = bb.add(coeffs[:n], bb.mul(coeffs[n:], c_n))
            else:
                folded_c = coeffs
            on_coset = source.dft.dft_batch(bb.mul(folded_c, spow[:, None]))
            xs = bb.mul(base_pts, bb.monty_scalar(cd.shift))
            folded, inv_z = pfn(
                on_coset, local_sel, next_sel, xs, alpha_slice, pis_dev
            )
            accs[j] = ext4.add(accs[j], folded)
            if inv_zeroifier[j] is None:
                inv_zeroifier[j] = inv_z
            # serialize partition/coset iterations: an unbounded dispatch
            # queue lets several partitions' (n, |union|) u32 casts + NTT
            # temps coexist — observed runtime HBM exhaustion at the
            # keccak-air 2^20 quotient on a 16 GB chip (commit_wide guards
            # its chunk loop the same way)
            jax.block_until_ready(accs[j])
    chunks = [ext4.mul_base(accs[j], inv_zeroifier[j]) for j in range(qd)]
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
