"""Sharded PCS + DFT facade — the full multi-chip prover path.

``ShardedPcs`` is a drop-in ``TwoAdicFriPcs`` whose commit path runs the
distributed NTT of ``dist/ntt.py`` (log2(n_dev) ppermute exchange stages over
ICI, local fused stages, output directly in commit order) and keeps every
large array contiguously row-sharded over the mesh:

* **commit**: per matrix, bitrev-reshard -> sharded iNTT -> coset scale ->
  zero-pad (GSPMD reshard) -> sharded DIF NTT whose output *is* the
  bit-reversed committed frame; Merkle layers are built by the existing
  batched-hash programs on the sharded codewords (leaf hashing and the large
  compress layers stay device-local under contiguous sharding — the
  "device-local hashing plus collective tree reduction" of the BASELINE north
  star falls out of GSPMD propagation because a contiguous block of 2^k
  leaves is a complete subtree).
* **get_evaluations_on_domain**: in the bit-reversed frame the stride-s
  subsampling of the natural frame is the *prefix* of length H/s, so the
  quotient-domain evaluations are one slice + one bitrev reshard.
* **open**: inherited — reduced openings, FRI folds, and quotient chunk
  extraction are all row-local under contiguous sharding (fold pairs (2i,2i+1)
  are adjacent in the bit-reversed frame; stride-qd chunk decimation maps each
  device block onto one block of each chunk), so the parent's jitted programs
  parallelize over the mesh with no code change; host tails (transcript,
  query sampling) are unchanged, guaranteeing bit-identical proofs.

The reference is single-device; this layer is built to BASELINE config 5
("Sharded 2^24-row fib_air prove: distributed NTT + collective Merkle") and
validated bit-exactly against the single-device prover on a virtual CPU mesh
(tests/test_dist_prove.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..commit.pcs import PcsProverData, TwoAdicFriPcs
from ..fields import babybear as bb
from ..fields import ref_field as rf
from ..fri.domains import TwoAdicCoset
from ..matrix import log2_strict
from ..ntt import radix2
from . import ntt as dntt


def _min_sharded_log_h(mesh: Mesh) -> int:
    """Smallest transform the mesh path handles: the bitrev reshard needs
    H >= n_dev^2 (every device block must contain all residues mod n_dev)."""
    return 2 * log2_strict(int(mesh.devices.size))


class ShardedDft:
    """The ``Dft`` facade over a mesh: same TwoAdicSubgroupDft surface
    (natural-order in/out, ntt/dft.py), computed by the distributed kernels.
    Transforms smaller than n_dev^2 rows (FRI final polynomial, tiny tails)
    run on the single-device kernels — replicated work at sizes where a
    collective would cost more than the compute."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def _put(self, mat: jnp.ndarray) -> jnp.ndarray:
        return jax.device_put(mat, dntt.row_sharding(self.mesh))

    def _small(self, log_h: int) -> bool:
        return log_h < _min_sharded_log_h(self.mesh)

    def dft_batch(self, mat: jnp.ndarray) -> jnp.ndarray:
        log_h = log2_strict(int(mat.shape[0]))
        if self._small(log_h):
            return radix2.dft_batch(mat)
        br = dntt.dft_br_fn(self.mesh, log_h)(self._put(mat))
        return dntt.bitrev_reshard_fn(self.mesh, log_h)(br)

    def idft_batch(self, mat: jnp.ndarray) -> jnp.ndarray:
        log_h = log2_strict(int(mat.shape[0]))
        if self._small(log_h):
            return radix2.idft_batch(mat)
        br = dntt.bitrev_reshard_fn(self.mesh, log_h)(self._put(mat))
        return dntt.idft_from_br_fn(self.mesh, log_h)(br)

    def coset_lde_batch(
        self, mat: jnp.ndarray, added_bits: int, shift: int = 1
    ) -> jnp.ndarray:
        log_h = log2_strict(int(mat.shape[0]))
        if self._small(log_h):
            return radix2.coset_lde_batch(mat, added_bits, shift)
        br = dntt.coset_lde_br(self.mesh, self._put(mat), added_bits, shift)
        return dntt.bitrev_reshard_fn(self.mesh, log_h + added_bits)(br)

    def lde_batch(self, mat: jnp.ndarray, added_bits: int) -> jnp.ndarray:
        return self.coset_lde_batch(mat, added_bits, 1)


@functools.lru_cache(maxsize=None)
def _prefix_fn(mesh: Mesh, log_h: int, log_m: int, w: int):
    """(H, w) sharded -> first 2^log_m rows, resharded contiguously."""
    out_shard = dntt.row_sharding(mesh)

    def f(x):
        return jax.lax.with_sharding_constraint(x[: 1 << log_m], out_shard)

    return jax.jit(f)


class ShardedPcs(TwoAdicFriPcs):
    """TwoAdicFriPcs over a device mesh; see module docstring."""

    def __init__(self, mesh: Mesh, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.mesh = mesh
        self.dft = ShardedDft(mesh)  # override the facade for prove()'s use
        if self.val_mmcs.hiding and getattr(self.val_mmcs, "sharding", None) is None:
            self.val_mmcs.sharding = dntt.row_sharding(mesh)

    # -- commit (sharded LDE straight into the committed frame) -------------
    def commit(
        self,
        domains_and_evals: Sequence[Tuple[TwoAdicCoset, jnp.ndarray]],
        _randomize: bool = True,
    ):
        mesh = self.mesh
        if _randomize and self.num_random_codewords > 0 and self.zk_layout == "p3":
            # p3 add_random_cols layout in the sharded path: append the
            # random columns before sharding (same draw order as the
            # replicated path — proofs stay byte-identical across meshes)
            domains_and_evals = [
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
                for d, e in domains_and_evals
            ]
        if any(
            log2_strict(int(e.shape[0])) < _min_sharded_log_h(mesh)
            for _, e in domains_and_evals
        ):
            # tiny commits (FRI tails / sub-mesh heights): replicated parent
            # path; its dft facade is this object, which self-selects kernels.
            return super().commit(domains_and_evals, _randomize=False)
        shard = dntt.row_sharding(mesh)
        ldes_br, r_coeffs, domains, widths = [], [], [], []
        for domain, evals in domains_and_evals:
            h, w = int(evals.shape[0]), int(evals.shape[1])
            assert h == domain.size, "evals height must match domain size"
            log_h = log2_strict(h)
            sigma = (bb.GENERATOR * rf.finv(domain.shift)) % bb.P
            evals = jax.device_put(evals, shard)
            # natural evals -> bitrev frame -> coeffs -> plain-frame relabel
            evals_br = dntt.bitrev_reshard_fn(mesh, log_h)(evals)
            q_coeffs = dntt.idft_from_br_fn(mesh, log_h)(evals_br)
            r_small = dntt.scale_rows_by_powers_fn(mesh, log_h, sigma)(q_coeffs)
            r_pad = dntt._pad_rows_fn(mesh, log_h, self.fri.log_blowup, w)(r_small)
            codeword_br = dntt.dft_br_fn(mesh, log_h + self.fri.log_blowup)(r_pad)
            ldes_br.append(codeword_br)
            # h-height coeffs, not the lde_h pad (see commit/pcs.py — the pad
            # quadrupled retained HBM; _eval_at_point sizes by shape[0])
            r_coeffs.append(r_small)
            domains.append(domain)
            widths.append(w)
        root, merkle_data = self.val_mmcs.commit(ldes_br)
        return root, PcsProverData(merkle_data, r_coeffs, domains, widths)

    # -- natural-order evals on a sub-domain (prefix + bitrev reshard) ------
    def get_evaluations_on_domain(
        self, data: PcsProverData, idx: int, domain: TwoAdicCoset
    ) -> jnp.ndarray:
        own = data.domains[idx]
        lde_h = own.size << self.fri.log_blowup
        assert domain.size <= lde_h
        expected_shift = (own.shift * bb.GENERATOR) % bb.P
        assert domain.shift == expected_shift % bb.P
        codeword_br = data.merkle.matrices[idx]
        log_lde = log2_strict(lde_h)
        log_m = log2_strict(domain.size)
        if log_m < _min_sharded_log_h(self.mesh):
            return super().get_evaluations_on_domain(data, idx, domain)
        w = int(codeword_br.shape[1])
        # natural[i] = codeword[stride*i] = codeword_br[bitrev_m(i)] for the
        # length-m prefix (low log2(stride) bits of a stride-multiple are 0,
        # so its bit-reversal lands in the prefix, ordered by bitrev_m).
        prefix = _prefix_fn(self.mesh, log_lde, log_m, w)(codeword_br)
        return dntt.bitrev_reshard_fn(self.mesh, log_m)(prefix)
