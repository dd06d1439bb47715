"""TwoAdicFriPcs — the FRI polynomial commitment scheme, with optional hiding.

TPU-native rebuild of ``p3-fri``'s ``TwoAdicFriPcs`` + ``HidingFriPcs`` as
assembled by the reference (``/root/reference/native/src/fib_air.rs:54-65``):

* ``commit``: per matrix, interpret the evals on their domain as a polynomial,
  low-degree extend by ``2^log_blowup`` onto the generator coset, and commit
  the **bit-reversed** rows in a (optionally salted/hiding) Keccak Merkle tree.
* ``open``:  observe all out-of-domain values, sample one alpha, combine every
  (matrix, point, column) quotient ``(p(x)-p(z))/(x-z)`` into one reduced
  codeword per height, then run the FRI commit phase (arity-2 folds), grind
  the proof-of-work, and answer query indices with Merkle openings.
* hiding (``num_random_codewords > 0``, the reference's ``HidingFriPcs`` with
  4 random codewords, fib_air.rs:63-65): an extra commitment of random
  degree-<n codewords is mixed into the batch so query openings reveal nothing
  about the committed polynomials beyond the claimed evaluations.

Frame convention: every committed codeword is relabeled onto the *plain*
subgroup (rows of height H live at y = g_H^bitrev(i)); out-of-domain points
map to ``zeta / GENERATOR`` uniformly.  Relabeling by a multiplicative shift
preserves degree, so one FRI run covers all rounds (this mirrors p3's
shift-free ``fold_row``).

Device/host split (SURVEY.md par7.2): LDEs, reduced openings, folds and Merkle
layers are jitted device work; per-query path verification and the transcript
are host tails.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..challenger.challenger import Challenger
from ..compat.smallrng import SmallRng
from ..fields import babybear as bb
from ..fields import extension as ext4
from ..fields import ref_field as rf
from ..fri.config import FriParameters
from ..fri.domains import ExtPoint, TwoAdicCoset
from ..matrix import bit_reversal_perm, log2_strict, reverse_matrix_index_bits
from ..ntt.dft import Dft
from .merkle import BatchOpening, Digest, MerkleTreeMmcs, gather_if_tiny


# ---------------------------------------------------------------------------
# Proof structures
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class CommitPhaseStep:
    opening: BatchOpening  # the (pair) row of the folded codeword + path


@dataclasses.dataclass
class QueryProof:
    input_openings: List[BatchOpening]  # one per commit round
    commit_phase_openings: List[CommitPhaseStep]


@dataclasses.dataclass
class FriProof:
    commit_phase_commits: List[Digest]
    query_proofs: List[QueryProof]
    final_poly: List[ExtPoint]
    pow_witness: int
    random_commit: Optional[Digest] = None  # hiding: random-codeword round


@dataclasses.dataclass
class PcsProverData:
    merkle: object  # MerkleTreeMmcs ProverData
    r_coeffs: List[jnp.ndarray]  # per matrix: plain-frame coeffs (H_lde, w)
    domains: List[TwoAdicCoset]
    widths: List[int]


OpenedValues = List[List[List[List[int]]]]
# [round][matrix][point][column] -> ext value as 4 canonical ints... flattened
# per column: each entry is an ExtPoint tuple.


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------
_COL_CHUNK = 64  # bounds the (H, chunk, 4) intermediates (wide AIRs at 2^20+
# rows would otherwise materialize multi-GB products and OOM HBM)


def _chunk_for(w: int) -> int:
    """Column-chunk width: cap at _COL_CHUNK but never pad a narrow matrix up
    to it — fib's 2-column trace at 2^22 LDE rows padded to 64 cols costs a
    32x blowup (measured: 32 GB of (H, 64, 4) intermediates, HBM OOM)."""
    return min(_COL_CHUNK, max(8, -(-w // 8) * 8))


_ROW_BLOCK = 1 << 20  # rows per sequential block in eval/combine: bounds the
# (block, chunk, 4) intermediate at ~1 GB regardless of trace height, so the
# open phase scales to the 2^24-row north-star target (2^26 LDE rows)


def _host_tail_log() -> int:
    """FRI folds at <= 2^this rows run host-side (0 disables; OPT-0018).
    Default from the device policy (larger on tunneled devices where every
    sync costs a round trip); ``TPU_STARK_FRI_HOST_TAIL`` overrides."""
    import os

    from ..backend.policy import current_policy

    env = os.environ.get("TPU_STARK_FRI_HOST_TAIL")
    if env is not None:
        try:
            return int(env)
        except ValueError:
            pass
    return current_policy().fri_host_tail_log


@functools.cache
def _cpu_dev():
    """The host CPU jax device, or None when unavailable."""
    try:
        return jax.local_devices(backend="cpu")[0]
    except Exception:  # noqa: BLE001 — no cpu backend: host tail disabled
        return None


def _commit_on_host(mmcs, mats_np: List[np.ndarray]):
    """Commit tiny FRI fold codewords on the host CPU backend — the same
    (tested) XLA sponge code, placed on cpu, results re-homed as numpy so the
    query phase's gathers are tunnel-free too (OPT-0018).  Forces the XLA
    sponge impls: Mosaic/Pallas is TPU-only and the impl knobs read
    ``jax.default_backend()``, which stays the accelerator under
    ``jax.default_device(cpu)``."""
    import os

    forced = {
        "TPU_STARK_KECCAK_IMPL": "xla",
        "TPU_STARK_POSEIDON2_IMPL": "xla",
        # layout knobs read jax.default_backend(), which stays "tpu" under
        # default_device(cpu) — without forcing the stacked (rolled) layouts
        # the host commit traces the unrolled LANE layouts, whose XLA:CPU
        # compile runs MINUTES PER SHAPE: the actual root cause of the r3
        # poseidon2-chain 2^18 ">65 min fold-phase stall" (one such compile
        # per host-tail fold level; stack captured via faulthandler,
        # _r4_logs/p2chain_2p16_fixed.log)
        "TPU_STARK_POSEIDON2_LAYOUT": "stacked",
        "TPU_STARK_KECCAK_LAYOUT": "stacked",
    }
    saved = {k: os.environ.get(k) for k in forced}
    os.environ.update(forced)
    try:
        with jax.default_device(_cpu_dev()):
            root, data = mmcs.commit([jnp.asarray(m) for m in mats_np])
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return root, mmcs.to_host_data(data)


def _group_budget_bytes() -> int:
    """Max bytes of one grouped commit transform (see pcs.commit); env
    ``TPU_STARK_COMMIT_GROUP_MB`` overrides (default 1 GiB)."""
    import os

    try:
        return int(os.environ.get("TPU_STARK_COMMIT_GROUP_MB", "1024")) << 20
    except ValueError:
        return 1 << 30


from .lowmem import lowmem_rows as _lowmem_rows


class _LazyLde:
    """Stand-in for a released committed codeword: recomputes the LDE on
    demand from the stored h-height coefficients.  In low-memory mode every
    post-commit consumer (quotient-domain slicing, reduced openings, random
    codeword combine, query row gathers) goes through here, so the dense
    codeword exists only transiently inside each consumer."""

    def __init__(self, r_small: jnp.ndarray, lde_h: int, dft):
        self._rc = r_small
        self._dft = dft
        self.shape = (lde_h, int(r_small.shape[1]))

    def _codeword(self) -> jnp.ndarray:
        h, w = int(self._rc.shape[0]), int(self._rc.shape[1])
        r_pad = jnp.zeros((self.shape[0], w), dtype=bb.u32).at[:h].set(self._rc)
        return self._dft.dft_batch(r_pad)

    def lde_br(self) -> jnp.ndarray:
        return reverse_matrix_index_bits(self._codeword())

    def evals_strided(self, stride: int) -> jnp.ndarray:
        return self._codeword()[::stride]

    def reduced_contrib(self, apows, p_z, z_dev, y_br) -> jnp.ndarray:
        return _reduced_quotient(self.lde_br(), apows, p_z, z_dev, y_br)

    def combine_contrib(self, apows) -> jnp.ndarray:
        return _combine_columns(self.lde_br(), apows)

    def __getitem__(self, rows):
        return self.lde_br()[rows]


def _pad_cols(mat: jnp.ndarray, multiple: int) -> jnp.ndarray:
    w = mat.shape[1]
    pad = (-w) % multiple
    if pad:
        mat = jnp.concatenate(
            [mat, jnp.zeros(mat.shape[:1] + (pad,) + mat.shape[2:], mat.dtype)],
            axis=1,
        )
    return mat


@jax.jit
def _eval_at_point(r_coeffs: jnp.ndarray, zpow: jnp.ndarray) -> jnp.ndarray:
    """r(z) for every column: (H, w) base coeffs x (H, 4) ext powers -> (w, 4).
    Sequential over row blocks (scan) and column chunks (lax.map) — peak
    memory is one (block, chunk, 4) product regardless of H or w."""
    h, w = r_coeffs.shape
    ch = _chunk_for(w)
    rc = _pad_cols(r_coeffs, ch)
    wp = rc.shape[1]
    k = wp // ch
    b = min(h, _ROW_BLOCK)
    nb = h // b
    rc_blocks = rc.reshape(nb, b, k, ch).transpose(0, 2, 1, 3)  # (nb, k, b, ch)
    zp_blocks = zpow.reshape(nb, b, 4)

    def blk(carry, xs):
        rcb, zpb = xs  # (k, b, ch), (b, 4)

        def col(chunk):  # (b, ch) -> (ch, 4)
            prod = bb.mul(chunk[:, :, None], zpb[:, None, :])
            return bb.sum_mod(prod, axis=0)

        part = jax.lax.map(col, rcb)  # (k, ch, 4)
        return bb.add(carry, part), None

    init = jnp.zeros((k, ch, 4), dtype=bb.u32)
    acc, _ = jax.lax.scan(blk, init, (rc_blocks, zp_blocks))
    return acc.reshape(wp, 4)[:w]


def _ext_scale_rows(ext_vec: jnp.ndarray, base_vec: jnp.ndarray) -> jnp.ndarray:
    """(H, 4) ext times (H,) base, rowwise."""
    return bb.mul(ext_vec, base_vec[:, None])


# ---------------------------------------------------------------------------
# The PCS
# ---------------------------------------------------------------------------
class TwoAdicFriPcs:
    def __init__(
        self,
        dft: Dft,
        fri_params: FriParameters,
        val_mmcs: Optional[MerkleTreeMmcs] = None,
        challenge_mmcs: Optional[MerkleTreeMmcs] = None,
        num_random_codewords: int = 0,
        rng: Optional[SmallRng] = None,
        zk_layout: str = "tpu",
    ):
        self.dft = dft
        self.fri = fri_params
        self.val_mmcs = val_mmcs if val_mmcs is not None else MerkleTreeMmcs()
        self.challenge_mmcs = (
            challenge_mmcs if challenge_mmcs is not None else MerkleTreeMmcs()
        )
        self.num_random_codewords = num_random_codewords
        self.rng = rng if rng is not None else SmallRng.seed_from_u64(1)
        # Hiding layout: "tpu" commits the random codewords as a separate
        # round at open time only; "p3" additionally appends
        # ``num_random_codewords`` random COLUMNS to every matrix inside the
        # hiding commit — the layout the shipped reference binary uses
        # (`p3_fri::hiding_pcs::add_random_cols` + the "randomize polys"
        # span, docs/so_evidence.md §3).  Both keep the separate
        # randomization commitment the p3 verifier demands ("ZK is enabled,
        # so we should have randomization commitment", so_evidence §5).
        assert zk_layout in ("tpu", "p3"), zk_layout
        self.zk_layout = zk_layout

    # -- domains -----------------------------------------------------------
    def natural_domain_for_degree(self, degree: int) -> TwoAdicCoset:
        return TwoAdicCoset(log2_strict(degree), 1)

    # -- commit ------------------------------------------------------------
    def commit(
        self,
        domains_and_evals: Sequence[Tuple[TwoAdicCoset, jnp.ndarray]],
        _randomize: bool = True,
    ) -> Tuple[Digest, PcsProverData]:
        """Commit bit-reversed coset LDEs of the given evaluation matrices
        (Monty device arrays, natural row order on their domain).

        Matrices on the SAME domain run their iNTT/NTT as one wide batch
        (the quotient commit is 2^log_qd same-height narrow chunks; one
        (h, sum_w) transform fills the VPU lanes that 4 separate (h, 4)
        transforms waste) and are split back per matrix for the MMCS."""
        import os
        import time

        timing = os.environ.get("TPU_STARK_TIMING") == "1"
        t_last = [time.perf_counter()]

        def mark(step: str, sync=None) -> None:
            if timing:
                if sync is not None:
                    jax.block_until_ready(sync)
                from ..bench.profiling import hbm_note

                now = time.perf_counter()
                print(f"[commit] {step}: {now - t_last[0]:.3f}s{hbm_note()}",
                      flush=True)
                t_last[0] = now

        items = list(domains_and_evals)
        if _randomize and self.num_random_codewords > 0 and self.zk_layout == "p3":
            # p3 layout: add_random_cols — every hiding commit appends
            # num_random_codewords random columns to each matrix (drawn from
            # the codeword rng per matrix in commit order), so query openings
            # of the matrix itself are hiding beyond the salt.
            items = [
                (
                    d,
                    jnp.concatenate(
                        [
                            e,
                            jnp.asarray(
                                self.rng.sample_babybear_matrix_monty(
                                    int(e.shape[0]), self.num_random_codewords
                                )
                            ),
                        ],
                        axis=1,
                    ),
                )
                for d, e in items
            ]
        ldes_br: List[Optional[jnp.ndarray]] = [None] * len(items)
        r_coeffs: List[Optional[jnp.ndarray]] = [None] * len(items)
        domains = [d for d, _ in items]
        widths = [int(e.shape[1]) for _, e in items]
        groups: Dict[int, List[int]] = {}
        for k, (domain, evals) in enumerate(items):
            assert int(evals.shape[0]) == domain.size, "evals height mismatch"
            groups.setdefault(domain.log_n, []).append(k)
        # Same-height matrices share one wide transform (OPT-0012: fills VPU
        # lanes for narrow chunks) — but ONLY while the grouped transform is
        # small enough that its in-flight intermediates don't crowd HBM: at
        # 2^24 the grouped (2^25, 16) quotient transform peaks ~10 GB of
        # workspace while ~6 GB of trace tree is resident (observed OOM).
        # Above the budget, split into sub-batches; lanes are saturated at
        # these heights anyway, and proof bytes are identical either way.
        budget_elems = _group_budget_bytes() // 4
        split_groups: List[Tuple[int, List[int]]] = []
        for log_n, ks in groups.items():
            lde_h_g = (1 << log_n) << self.fri.log_blowup
            batch: List[int] = []
            wsum = 0
            for k in ks:
                if batch and (wsum + widths[k]) * lde_h_g > budget_elems:
                    split_groups.append((log_n, batch))
                    batch, wsum = [], 0
                batch.append(k)
                wsum += widths[k]
            split_groups.append((log_n, batch))
        for log_n, ks in split_groups:
            h = 1 << log_n
            lde_h = h << self.fri.log_blowup
            wide = (
                items[ks[0]][1]
                if len(ks) == 1
                else jnp.concatenate([items[k][1] for k in ks], axis=1)
            )
            # release this group's input evals NOW (the caller dropped its
            # refs): at 2^24 the four 1 GB quotient chunks otherwise stay
            # alive under every group's multi-GB transform temps (observed
            # runtime HBM exhaustion on a 16 GB chip)
            for k in ks:
                items[k] = (items[k][0], None)
            # q(y) = p(shift * y); committed codeword = q on (GEN/shift)*K,
            # relabeled to plain frame r(y) with r = q(sigma * y).  Only the
            # relabeling scale depends on the domain SHIFT, so matrices on
            # different cosets of the same size (the quotient chunks'
            # split_domains) still share both transforms — the scale vector
            # is per-matrix columnwise.
            q_coeffs = self.dft.idft_batch(wide)
            mark(f"idft ({h}, {wide.shape[1]})", q_coeffs)
            shifts = [items[k][0].shift for k in ks]
            if len(set(shifts)) == 1:
                sigma = (bb.GENERATOR * rf.finv(shifts[0])) % bb.P
                sig_mat = bb.powers_monty(sigma, h)[:, None]
            else:
                cols = []
                for k in ks:
                    sigma = (bb.GENERATOR * rf.finv(items[k][0].shift)) % bb.P
                    cols.append(
                        jnp.broadcast_to(
                            bb.powers_monty(sigma, h)[:, None], (h, widths[k])
                        )
                    )
                sig_mat = jnp.concatenate(cols, axis=1)
            r_small = bb.mul(q_coeffs, sig_mat)
            r_pad = jnp.zeros((lde_h, wide.shape[1]), dtype=bb.u32).at[:h].set(
                r_small
            )
            codeword = self.dft.dft_batch(r_pad)
            mark(f"dft ({lde_h}, {wide.shape[1]})", codeword)
            del wide, q_coeffs, r_pad  # free 2^24+-row intermediates eagerly
            codeword_br = reverse_matrix_index_bits(codeword)
            del codeword
            off = 0
            for k in ks:
                w = widths[k]
                ldes_br[k] = codeword_br[:, off : off + w]
                # store the h-height coeffs, NOT the lde_h zero-pad: the pad
                # quadrupled retained HBM at 2^24 (r_small's high rows are 0,
                # and _eval_at_point sizes its power vector by shape[0])
                r_coeffs[k] = r_small[:, off : off + w]
                off += w
            del codeword_br, r_small
        mark("bitrev+split")
        root, merkle_data = self.val_mmcs.commit(ldes_br)
        mark("mmcs tree (salts + layers + root)")
        # Low-memory: once the tree exists the dense codewords' only readers
        # are recompute-friendly (see _LazyLde); at 2^24-scale heights drop
        # them now rather than pinning GBs until the query phase.
        if _lowmem_rows():
            for k in range(len(items)):
                lde_h_k = domains[k].size << self.fri.log_blowup
                if lde_h_k >= _lowmem_rows():
                    merkle_data.matrices[k] = _LazyLde(
                        r_coeffs[k], lde_h_k, self.dft
                    )
            ldes_br = None
        return root, PcsProverData(merkle_data, r_coeffs, domains, widths)

    def get_evaluations_on_domain(
        self, data: PcsProverData, idx: int, domain: TwoAdicCoset
    ) -> jnp.ndarray:
        """Natural-order evals of committed polynomial idx on ``domain``
        (must be a sub-coset of the committed LDE coset)."""
        own = data.domains[idx]
        lde_h = own.size << self.fri.log_blowup
        assert domain.size <= lde_h
        # committed coset = GEN * K_lde (p-frame); requested domain must be
        # GEN * K_m: its points are every (lde_h/m)-th point.
        expected_shift = (own.shift * bb.GENERATOR) % bb.P
        assert domain.shift == expected_shift % bb.P, (
            f"domain shift {domain.shift} not the LDE coset {expected_shift}"
        )
        stride = lde_h // domain.size
        mat = data.merkle.matrices[idx]
        if isinstance(mat, _LazyLde):
            return mat.evals_strided(stride)
        return reverse_matrix_index_bits(mat)[::stride]

    # -- open --------------------------------------------------------------
    def open(
        self,
        rounds: Sequence[Tuple[PcsProverData, List[List[ExtPoint]]]],
        challenger: Challenger,
    ) -> Tuple[OpenedValues, FriProof]:
        import os
        import time

        timing = os.environ.get("TPU_STARK_TIMING") == "1"
        t_last = [time.perf_counter()]

        def mark(step: str) -> None:
            if timing:
                from ..bench.profiling import hbm_note

                now = time.perf_counter()
                print(f"[open]   {step}: {now - t_last[0]:.3f}s{hbm_note()}",
                      flush=True)
                t_last[0] = now

        fri = self.fri
        rounds = list(rounds)

        # Hiding: append a round of random codewords (no opening points).
        if self.num_random_codewords > 0:
            max_h = max(
                int(m.shape[0])
                for data, _ in rounds
                for m in data.merkle.matrices
            )
            n_max = max_h >> fri.log_blowup
            rand_coeffs = jnp.asarray(
                self.rng.sample_babybear_matrix_monty(n_max, self.num_random_codewords)
            )
            rand_domain = TwoAdicCoset(log2_strict(n_max), 1)
            rand_evals = self.dft.dft_batch(rand_coeffs)
            random_commit, r_data = self.commit(
                [(rand_domain, rand_evals)], _randomize=False
            )
            challenger.observe_commitment(random_commit)
            rounds.append((r_data, [[]]))
        else:
            random_commit = None
        mark("random codeword commit")

        # 1. Out-of-domain values at z_y = zeta / GENERATOR, observed in order.
        # All (matrix, point) evals are queued, then resolved with ONE
        # device_get (OPT-0017: each np.asarray sync paid a tunnel round trip);
        # the Monty device values stay resident for the reduced openings.
        gen_inv = rf.finv(bb.GENERATOR)
        eval_dev: List[jnp.ndarray] = []
        for data, points in rounds:
            for m_idx, mat_points in enumerate(points):
                rc = data.r_coeffs[m_idx]
                for zeta in mat_points:
                    z_y = rf.escale(zeta, gen_inv)
                    if hasattr(rc, "eval_at_point"):  # streamed wide matrix
                        eval_dev.append(rc.eval_at_point(z_y))
                    else:
                        zpow = ext4.powers_device(z_y, int(rc.shape[0]))
                        eval_dev.append(_eval_at_point(rc, zpow))
        eval_host = iter(jax.device_get(eval_dev))
        eval_queue = iter(eval_dev)
        opened_values: OpenedValues = []
        opened_dev: List[List[List[jnp.ndarray]]] = []
        for data, points in rounds:
            rv, rd = [], []
            for m_idx, mat_points in enumerate(points):
                mv, md = [], []
                for _zeta in mat_points:
                    vals_np = bb.np_from_monty(next(eval_host))  # (w, 4)
                    mv.append([tuple(int(c) for c in row) for row in vals_np])
                    md.append(next(eval_queue))
                rv.append(mv)
                rd.append(md)
            opened_values.append(rv)
            opened_dev.append(rd)

        for rv in opened_values:
            for mv in rv:
                for pv in mv:
                    for val in pv:
                        challenger.observe_u32s(val)

        alpha = challenger.sample_ext()
        mark("out-of-domain evals")

        # 2. Reduced openings per log-height (bit-reversed plain-frame).
        # Jobs are collected first, then consecutive same-(height, zeta) jobs
        # merge into ONE _reduced_quotient call over concatenated columns
        # (OPT-0017: the quotient round's 2^log_qd chunks share height and
        # zeta — merging shares the (y - z) batch inversion and the scan).
        # Alpha-power assignment is per height in global job order, exactly
        # the verifier's alpha_ctr walk; merging never reorders within a
        # height, so offsets stay contiguous and transcripts unchanged.
        jobs_by_height: Dict[int, list] = {}
        for (data, points), r_opened in zip(rounds, opened_dev):
            for m_idx, mat_points in enumerate(points):
                mat_br = data.merkle.matrices[m_idx]
                w = int(mat_br.shape[1])
                log_h = log2_strict(int(mat_br.shape[0]))
                hjobs = jobs_by_height.setdefault(log_h, [])
                if not mat_points:
                    # random codewords: mixed in directly (already low degree)
                    hjobs.append((None, mat_br, None, w))
                for p_idx, zeta in enumerate(mat_points):
                    z_y = rf.escale(zeta, gen_inv)
                    hjobs.append((z_y, mat_br, r_opened[m_idx][p_idx], w))

        ro: Dict[int, jnp.ndarray] = {}
        for log_h, hjobs in jobs_by_height.items():
            y_br = _plain_points_br(log_h)
            ro[log_h] = ext4.zero((1 << log_h,))
            groups: List[list] = []
            for job in hjobs:
                wide = hasattr(job[1], "reduced_contrib") or (
                    groups and hasattr(groups[-1][-1][1], "reduced_contrib")
                )
                if (
                    groups
                    and job[0] is not None
                    and groups[-1][-1][0] == job[0]
                    and not wide  # streamed matrices never merge
                ):
                    groups[-1].append(job)
                else:
                    groups.append([job])
            off = 0
            for grp in groups:
                z_y = grp[0][0]
                w_total = sum(g[3] for g in grp)
                apows = _alpha_pows_dev(alpha, off, w_total)
                if z_y is None:
                    m0 = grp[0][1]
                    contrib = (
                        m0.combine_contrib(apows)
                        if hasattr(m0, "combine_contrib")
                        else _combine_columns(m0, apows)
                    )
                elif hasattr(grp[0][1], "reduced_contrib"):  # streamed/lazy
                    contrib = grp[0][1].reduced_contrib(
                        apows, grp[0][2], ext4.scalar(z_y), y_br
                    )
                else:
                    mat = (
                        grp[0][1]
                        if len(grp) == 1
                        else jnp.concatenate([g[1] for g in grp], axis=1)
                    )
                    p_z = (
                        grp[0][2]
                        if len(grp) == 1
                        else jnp.concatenate([g[2] for g in grp], axis=0)
                    )
                    contrib = _reduced_quotient(
                        mat, apows, p_z, ext4.scalar(z_y), y_br
                    )
                ro[log_h] = ext4.add(ro[log_h], contrib)
                off += w_total

        mark("reduced openings (queued)")

        # 3. FRI commit phase.  The chain is Fiat-Shamir-serialized (each
        # level's root must reach the transcript before beta exists), so every
        # level costs at least one device->host sync; once the codeword is
        # tiny the per-level tunnel round trips dominate the (trivial) math.
        # OPT-0018: below 2^TPU_STARK_FRI_HOST_TAIL rows, pull the codeword
        # with ONE device_get and run the remaining commits+folds on the host
        # CPU backend (same XLA sponge/fold code, zero further tunnel syncs).
        log_max = max(ro)
        log_min = fri.log_blowup + fri.log_final_poly_len
        tail_log = _host_tail_log()
        commit_phase_commits: List[Digest] = []
        commit_phase_data = []
        current = ro[log_max]
        log_h = log_max
        on_host = False

        def lvl_mark(step: str, sync=None) -> None:
            # per-fold-level timing (diagnosis of the r3 poseidon2-chain 2^18
            # stall: >65 min with no mark between "reduced openings" and
            # "FRI folds" left the failing level/step unknown)
            if timing:
                if sync is not None:
                    jax.block_until_ready(sync)
                now = time.perf_counter()
                print(
                    f"[fri]    level 2^{log_h} {step}: {now - t_last[0]:.3f}s",
                    flush=True,
                )
                t_last[0] = now

        while log_h > log_min:
            if not on_host and log_h <= tail_log and _cpu_dev() is not None:
                pull_heights = [lh for lh in sorted(ro) if lh < log_h]
                got = jax.device_get([current] + [ro[lh] for lh in pull_heights])
                current = got[0]
                for lh, v in zip(pull_heights, got[1:]):
                    ro[lh] = v
                on_host = True
            if on_host:
                pairs = current.reshape(-1, 2, 4)
                c_root, c_data = _commit_on_host(
                    self.challenge_mmcs, [pairs.reshape(-1, 8)]
                )
                lvl_mark("host commit")
            else:
                # multi-device folds collapse to one device once tiny (see
                # merkle.gather_if_tiny: sub-device-count GSPMD shapes are both
                # slow and hazardous); the big early folds stay sharded.
                # Reshapes happen INSIDE the jitted consumers: an eager
                # (2^26, 4) -> (2^25, 2, 4) reshape compiled standalone chose
                # a minor-dim-padded T(8,128) relayout — a 32 GB copy of a
                # 1 GB array (observed compile OOM at the 2^24 prove).
                current = gather_if_tiny(current)
                flat = _pairs_flat(current)  # (h/2, 8) ExtensionMmcs rows
                lvl_mark("pairs (forces queued folds)", flat)
                c_root, c_data = self.challenge_mmcs.commit([flat])
                lvl_mark("commit", c_data.layers[-1])
            commit_phase_commits.append(c_root)
            commit_phase_data.append(c_data)
            challenger.observe_commitment(c_root)
            beta = challenger.sample_ext()
            if on_host:
                with jax.default_device(_cpu_dev()):
                    current = np.asarray(
                        _fold_pairs(jnp.asarray(pairs), ext4.scalar(beta), log_h)
                    )
            else:
                current = _fold_codeword(current, ext4.scalar(beta), log_h)
            log_h -= 1
            if log_h in ro:
                if on_host:
                    with jax.default_device(_cpu_dev()):
                        current = np.asarray(
                            ext4.add(jnp.asarray(current), jnp.asarray(ro[log_h]))
                        )
                else:
                    current = ext4.add(current, ro[log_h])

        # final polynomial: un-bit-reverse, idft, keep final_poly_len coeffs
        if on_host:
            with jax.default_device(_cpu_dev()):
                final_evals = reverse_matrix_index_bits(jnp.asarray(current))
                final_coeffs = self.dft.idft_batch(final_evals)
        else:
            final_evals = reverse_matrix_index_bits(current)
            final_coeffs = self.dft.idft_batch(final_evals)
        final_np = bb.np_from_monty(np.asarray(final_coeffs))
        n_final = 1 << fri.log_final_poly_len
        final_poly = [tuple(int(c) for c in final_np[i]) for i in range(n_final)]
        # sanity: high coefficients must vanish (degree bound)
        assert not final_np[n_final:].any(), "FRI final polynomial degree too high"
        for coeff in final_poly:
            challenger.observe_u32s(coeff)

        mark("FRI folds + final poly")

        # 4. Proof of work.
        pow_witness = challenger.grind(fri.proof_of_work_bits)
        mark("PoW grind")


        # 5. Queries — indices first (transcript order unchanged), then ALL
        # trees' openings (commit rounds + every fold level) pooled into ONE
        # device_get (OPT-0017: one transfer per tree still paid ~24 tunnel
        # round trips at 2^20 — rounds + ~21 commit-phase levels).
        indices = [challenger.sample_bits(log_max) for _ in range(fri.num_queries)]
        pooled_fetch: List = []
        finishers: List = []

        def _drain(fetch):
            # serialize per-tree fetch construction: lazy-codeword recomputes
            # and salt regeneration are multi-GB transients, and an unbounded
            # dispatch queue let several trees' transients coexist on top of
            # the retained fold matrices (observed runtime HBM exhaustion at
            # the 2^24 warm rep).  The fetch results themselves are tiny.
            for arr in reversed(fetch):  # last queued: drains the in-order stream
                if isinstance(arr, jnp.ndarray):
                    jax.block_until_ready(arr)
                    break

        for data, _pts in rounds:
            r_max = max(int(m.shape[0]) for m in data.merkle.matrices)
            shift_bits = log_max - log2_strict(r_max)
            fetch, fin = self.val_mmcs.open_batch_many_lazy(
                [i >> shift_bits for i in indices], data.merkle
            )
            _drain(fetch)
            pooled_fetch.append(fetch)
            finishers.append(fin)
        idxs = list(indices)
        for c_data in commit_phase_data:
            fetch, fin = self.challenge_mmcs.open_batch_many_lazy(
                [i >> 1 for i in idxs], c_data
            )
            pooled_fetch.append(fetch)
            finishers.append(fin)
            idxs = [i >> 1 for i in idxs]
        host_all = jax.device_get(pooled_fetch)
        results = [fin(host) for fin, host in zip(finishers, host_all)]
        round_openings = results[: len(rounds)]
        cp_level_openings = results[len(rounds) :]
        query_proofs = [
            QueryProof(
                [ro[q] for ro in round_openings],
                [CommitPhaseStep(lv[q]) for lv in cp_level_openings],
            )
            for q in range(fri.num_queries)
        ]

        mark("query openings")

        return opened_values, FriProof(
            commit_phase_commits, query_proofs, final_poly, pow_witness,
            random_commit,
        )

    # -- verify ------------------------------------------------------------
    def verify(
        self,
        rounds: Sequence[
            Tuple[Digest, List[Tuple[TwoAdicCoset, List[Tuple[ExtPoint, List[ExtPoint]]]]]]
        ],
        proof: FriProof,
        challenger: Challenger,
    ) -> bool:
        """rounds: per commit round, (commitment, [per matrix: (domain,
        [(zeta, [value per column]), ...])]).  In hiding mode the
        random-codeword round commitment travels in ``proof.random_commit``."""
        fri = self.fri
        rounds = list(rounds)
        if self.num_random_codewords > 0:
            if proof.random_commit is None:
                return False
            challenger.observe_commitment(proof.random_commit)
            max_lh = max(
                d.log_n + fri.log_blowup for _, mats in rounds for d, _ in mats
            )
            rand_domain = TwoAdicCoset(max_lh - fri.log_blowup, 1)
            rounds.append((proof.random_commit, [(rand_domain, [])]))

        # transcript: observe opened values, sample alpha
        for _c, mats in rounds:
            for _domain, pts in mats:
                for _z, vals in pts:
                    for v in vals:
                        challenger.observe_u32s(v)
        alpha = challenger.sample_ext()

        betas = []
        for c in proof.commit_phase_commits:
            challenger.observe_commitment(c)
            betas.append(challenger.sample_ext())
        for coeff in proof.final_poly:
            challenger.observe_u32s(coeff)
        if not challenger.check_witness(fri.proof_of_work_bits, proof.pow_witness):
            return False

        log_max = max(
            d.log_n + fri.log_blowup for _c, mats in rounds for d, _ in mats
        )
        log_min = fri.log_blowup + fri.log_final_poly_len
        if len(proof.commit_phase_commits) != log_max - log_min:
            return False
        gen_inv = rf.finv(bb.GENERATOR)

        for q_idx in range(fri.num_queries):
            index = challenger.sample_bits(log_max)
            if len(proof.query_proofs) <= q_idx:
                return False
            qp = proof.query_proofs[q_idx]

            # reduced openings at this index per height
            ro: Dict[int, ExtPoint] = {}
            alpha_ctr: Dict[int, int] = {}
            if len(qp.input_openings) != len(rounds):
                return False
            for (commitment, mats), opening in zip(rounds, qp.input_openings):
                if len(opening.opened_values) != len(mats):
                    return False
                dims = []
                for (domain, _pts), w in zip(
                    mats, [len(v) for v in opening.opened_values]
                ):
                    dims.append((domain.size << fri.log_blowup, w))
                r_max = max(h for h, _ in dims)
                reduced_index = index >> (log_max - log2_strict(r_max))
                if not self.val_mmcs.verify_batch(
                    commitment, dims, reduced_index, opening
                ):
                    return False
                for (domain, pts), row in zip(mats, opening.opened_values):
                    log_h = domain.log_n + fri.log_blowup
                    mat_index = index >> (log_max - log_h)
                    y = _plain_point_at(log_h, mat_index)
                    w = len(row)
                    ro.setdefault(log_h, (0, 0, 0, 0))
                    alpha_ctr.setdefault(log_h, 0)
                    # alpha powers walk INCREMENTALLY (one emul per column):
                    # an epow per column cost O(w log) ext muls — at
                    # keccak-air's 3,608 columns x 100 queries that was the
                    # bulk of an 84.5 s verify
                    if not pts:
                        # random codeword contribution: sum alpha^k * value
                        acc = ro[log_h]
                        apow = rf.epow(alpha, alpha_ctr[log_h])
                        for col in range(w):
                            acc = rf.eadd(acc, rf.escale(apow, int(row[col])))
                            apow = rf.emul(apow, alpha)
                        ro[log_h] = acc
                        alpha_ctr[log_h] += w
                        continue
                    for zeta, vals in pts:
                        z_y = rf.escale(zeta, gen_inv)
                        num = (0, 0, 0, 0)
                        apow = rf.epow(alpha, alpha_ctr[log_h])
                        for col in range(w):
                            t = rf.esub(rf.efrom_base(int(row[col])), tuple(vals[col]))
                            num = rf.eadd(num, rf.emul(apow, t))
                            apow = rf.emul(apow, alpha)
                        denom_inv = rf.einv(rf.esub(rf.efrom_base(y), z_y))
                        ro[log_h] = rf.eadd(ro[log_h], rf.emul(num, denom_inv))
                        alpha_ctr[log_h] += w

            # walk the fold chain
            value = ro.get(log_max, (0, 0, 0, 0))
            idx = index
            log_h = log_max
            if len(qp.commit_phase_openings) != len(betas):
                return False
            for step_i, (step, beta) in enumerate(
                zip(qp.commit_phase_openings, betas)
            ):
                row = step.opening.opened_values[0]  # (8,) flattened pair
                if len(row) != 8:
                    return False
                e = tuple(int(v) for v in row[0:4])
                o = tuple(int(v) for v in row[4:8])
                mine = e if idx & 1 == 0 else o
                if mine != tuple(value):
                    return False
                if not self.challenge_mmcs.verify_batch(
                    proof.commit_phase_commits[step_i],
                    [(1 << (log_h - 1), 8)],
                    idx >> 1,
                    step.opening,
                ):
                    return False
                # fold: value = (e+o)/2 + beta*(e-o)/(2*y_pair)
                y_pair = _plain_point_at(log_h, idx & ~1)
                inv2 = rf.finv(2)
                half_sum = rf.escale(rf.eadd(e, o), inv2)
                half_diff = rf.escale(rf.esub(e, o), (inv2 * rf.finv(y_pair)) % bb.P)
                value = rf.eadd(half_sum, rf.emul(beta, half_diff))
                idx >>= 1
                log_h -= 1
                if log_h in ro and log_h >= log_min:
                    value = rf.eadd(value, ro[log_h])

            # final check: value == final_poly(y_final)
            y_final = _plain_point_at(log_h, idx)
            acc = (0, 0, 0, 0)
            ypow = 1
            for coeff in proof.final_poly:
                acc = rf.eadd(acc, rf.escale(tuple(coeff), ypow))
                ypow = (ypow * y_final) % bb.P
            if tuple(value) != acc:
                return False
        return True


# ---------------------------------------------------------------------------
# module helpers
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _plain_points_br_np(log_h: int) -> np.ndarray:
    g = bb.two_adic_generator(log_h)
    pts = bb.np_powers(g, 1 << log_h)
    return bb.np_to_monty(pts[bit_reversal_perm(log_h)])


def _plain_points_br(log_h: int) -> jnp.ndarray:
    return jnp.asarray(_plain_points_br_np(log_h))


def _plain_point_at(log_h: int, index: int) -> int:
    g = bb.two_adic_generator(log_h)
    rev = int(bit_reversal_perm(log_h)[index])
    return pow(g, rev, bb.P)


def _alpha_pows_dev(alpha: ExtPoint, offset: int, w: int) -> jnp.ndarray:
    """(w, 4) device ext array [alpha^offset, ..., alpha^(offset+w-1)]."""
    rows = []
    cur = rf.epow(alpha, offset)
    for _ in range(w):
        rows.append(cur)
        cur = rf.emul(cur, alpha)
    return jnp.asarray(
        bb.np_to_monty(np.array(rows, dtype=np.uint64).astype(np.uint32))
    )


@jax.jit
def _combine_columns(mat_br: jnp.ndarray, apows: jnp.ndarray) -> jnp.ndarray:
    """sum_col alpha^(off+col) * y_col(x): (H, w) x (w, 4) -> (H, 4) ext.
    Sequential over row blocks (lax.map) and column chunks (scan) — peak
    memory is one (block, chunk, 4) product regardless of H or w."""
    h, w = mat_br.shape
    ch = _chunk_for(w)
    mp = _pad_cols(mat_br, ch)
    ap = jnp.concatenate(
        [apows, jnp.zeros((mp.shape[1] - w, 4), dtype=apows.dtype)], axis=0
    )
    k = mp.shape[1] // ch
    b = min(h, _ROW_BLOCK)
    nb = h // b
    m_blocks = mp.reshape(nb, b, k, ch).transpose(0, 2, 1, 3)  # (nb, k, b, ch)
    a_chunks = ap.reshape(k, ch, 4)

    def rowblk(mb):  # (k, b, ch) -> (b, 4)
        def body(carry, xs):
            m, a = xs  # (b, ch), (ch, 4)
            contrib = bb.sum_mod(ext4.mul_base(a[None, :, :], m), axis=1)
            return ext4.add(carry, contrib), None

        acc, _ = jax.lax.scan(body, ext4.zero((b,)), (mb, a_chunks))
        return acc

    return jax.lax.map(rowblk, m_blocks).reshape(h, 4)


@jax.jit
def _reduced_quotient(mat_br, apows, p_z, z_dev, y_br):
    """One matrix/point contribution to the reduced opening:
    (sum_col alpha^k (y_col(x) - y_col(z))) * inv(y - z) over the codeword.
    Row-blocked end to end (lax.map): at 2^26 LDE rows the unblocked ext
    chain (column combine, subtract, batch inversion, multiply) peaked
    21 GB of fused HLO temps — a compile-time OOM on a 16 GB chip (observed
    at the 2^24 zk north-star prove); blocking bounds temps to one
    (_ROW_BLOCK, 4) slice."""
    h, w = mat_br.shape
    b = bb.sum_mod(ext4.mul(apows, p_z), axis=0)  # (4,)
    blk = min(h, _ROW_BLOCK)
    nb = h // blk

    def rowblk(args):
        m, y = args  # (blk, w), (blk,)
        a_x = _combine_columns(m, apows)  # (blk, 4)
        diff = ext4.sub(a_x, b[None, :])
        y_minus_z = ext4.sub(ext4.from_base(y), z_dev[None, :])
        return ext4.mul(diff, ext4.inv(y_minus_z))

    out = jax.lax.map(
        rowblk, (mat_br.reshape(nb, blk, w), y_br.reshape(nb, blk))
    )
    return out.reshape(h, 4)


@jax.jit
def _pairs_flat(cw: jnp.ndarray) -> jnp.ndarray:
    """(H, 4) ext codeword -> (H/2, 8) ExtensionMmcs leaf rows.  Strided
    slices + concat, NOT ``reshape(-1, 8)``: the rank-preserving reshape of a
    (2^26, 4) u32 forces XLA:TPU through a minor-dim-padded {1,0:T(8,128)}
    relayout — a 32 GB copy of a 1 GB array (reproduced standalone; compile
    OOM).  The slice form compiles with 1 GB of temps."""
    return jnp.concatenate([cw[0::2], cw[1::2]], axis=1)


@functools.partial(jax.jit, static_argnums=(2,))
def _fold_codeword(cw: jnp.ndarray, beta_dev: jnp.ndarray, log_h: int) -> jnp.ndarray:
    """One fold straight from the (H, 4) codeword (strided-slice pairing —
    see ``_pairs_flat``)."""
    return _fold_eo(cw[0::2], cw[1::2], beta_dev, log_h)


@functools.partial(jax.jit, static_argnums=(2,))
def _fold_pairs(pairs: jnp.ndarray, beta_dev: jnp.ndarray, log_h: int) -> jnp.ndarray:
    """One arity-2 FRI fold from (H/2, 2, 4) pairs (host-tail path)."""
    return _fold_eo(pairs[:, 0], pairs[:, 1], beta_dev, log_h)


@functools.partial(jax.jit, static_argnums=(0,))
def _fold_inv2y_build(log_h: int) -> jnp.ndarray:
    """(2^(log_h-1),) Monty 1/(2*y_j), y[j] = g_lh^(bitrev_{lh-1}(j)) —
    built ON DEVICE (bitrev of iota + square-and-multiply + Fermat inverse):
    a host table as a traced literal made the compile REQUEST itself 256 MB
    at 2^26 rows (remote-compile HTTP 413; the OPT-0022 pathology)."""
    half = (bb.P + 1) // 2
    h2 = 1 << (log_h - 1)
    exps = reverse_matrix_index_bits(
        jnp.arange(h2, dtype=bb.u32)[:, None]
    ).ravel()
    y = bb.pow_exponents(bb.two_adic_generator(log_h), exps, log_h)
    return bb.mul(bb.inv(y), jnp.asarray(np.uint32(bb.host_to_monty(half))))


@functools.lru_cache(maxsize=None)
def _fold_inv2y_dev(log_h: int, _devkey: str) -> jnp.ndarray:
    out = _fold_inv2y_build(log_h)
    jax.block_until_ready(out)
    return out


def _fold_inv2y(log_h: int) -> jnp.ndarray:
    """Per-level fold constant, cached as a DEVICE buffer (OPT-0032): the
    r1-r4 fold rebuilt it inside every fold call — a bitrev gather, a
    log_h-step exponent walk, and a ~45-multiply Fermat inversion per call
    dominated the fold's runtime (fri_fold scored 13.9% SoL with the ext
    arithmetic itself nowhere near binding)."""
    if bb._tracing():
        return _fold_inv2y_build(log_h)  # in-graph when called under jit
    return _fold_inv2y_dev(log_h, bb._default_device_key())


def _fold_eo(e: jnp.ndarray, o: jnp.ndarray, beta_dev: jnp.ndarray, log_h: int) -> jnp.ndarray:
    """One arity-2 FRI fold in bit-reversed plain frame: even/odd halves
    (H/2, 4); result (H/2, 4) on the squared domain."""
    return _fold_eo_jit(e, o, beta_dev, _fold_inv2y(log_h))


@jax.jit
def _fold_eo_jit(e, o, beta_dev, inv_2y) -> jnp.ndarray:
    half_sum = ext4.scale(ext4.add(e, o), bb.monty_scalar((bb.P + 1) // 2))
    half_diff = _ext_scale_rows(ext4.sub(e, o), inv_2y)
    return ext4.add(half_sum, ext4.mul(beta_dev[None, :], half_diff))
