"""TwoAdicFriPcs round-trip tests (SURVEY.md par7.1 steps 9-10 groundwork)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_stark.challenger.challenger import Challenger
from tpu_stark.commit.merkle import MerkleTreeMmcs
from tpu_stark.commit.pcs import TwoAdicFriPcs
from tpu_stark.fields import babybear as bb
from tpu_stark.fields import ref_field as rf
from tpu_stark.fri.config import create_test_fri_params
from tpu_stark.ntt.dft import Dft

RNG = np.random.default_rng(11)


def rand_evals(h, w):
    return jnp.asarray(bb.np_to_monty((RNG.integers(0, bb.P, size=(h, w))).astype(np.uint32)))


def make_pcs(hiding=False):
    fri = create_test_fri_params(log_blowup=2)
    if hiding:
        return TwoAdicFriPcs(
            Dft(backend="cpu"), fri,
            val_mmcs=MerkleTreeMmcs(hiding=True, rng_seed=1),
            challenge_mmcs=MerkleTreeMmcs(),
            num_random_codewords=4,
        )
    return TwoAdicFriPcs(Dft(backend="cpu"), fri)


def ext_sample(ch):
    return ch.sample_ext()


class TestPcsRoundTrip:
    def _run(self, hiding, heights_widths_points):
        pcs = make_pcs(hiding)
        p_ch = Challenger()
        v_ch = Challenger()
        datas, commits, all_evals = [], [], []
        for mats, _pts in heights_widths_points:
            dn_evals = []
            for h, w in mats:
                d = pcs.natural_domain_for_degree(h)
                e = rand_evals(h, w)
                dn_evals.append((d, e))
            c, data = pcs.commit(dn_evals)
            commits.append(c)
            datas.append(data)
            all_evals.append(dn_evals)
            p_ch.observe_commitment(c)
            v_ch.observe_commitment(c)
        # sample opening points from the transcript (mimics the prover flow)
        zeta = p_ch.sample_ext()
        assert v_ch.sample_ext() == zeta
        rounds_open = []
        for (mats, pts_per_mat), data in zip(heights_widths_points, datas):
            rounds_open.append((data, [[zeta] * npts for npts in pts_per_mat]))
        opened, proof = pcs.open(rounds_open, p_ch)
        # verifier
        rounds_verify = []
        for (mats, pts_per_mat), c, dn_evals, ropened in zip(
            heights_widths_points, commits, all_evals, opened
        ):
            mat_entries = []
            for (domain, _e), npts, mopened in zip(dn_evals, pts_per_mat, ropened):
                mat_entries.append(
                    (domain, [(zeta, mopened[i]) for i in range(npts)])
                )
            rounds_verify.append((c, mat_entries))
        assert pcs.verify(rounds_verify, proof, v_ch)
        return pcs, opened, all_evals, zeta, commits, proof

    @pytest.mark.slow  # multi-second prove: slow tier (docs/testing.md)
    def test_single_matrix(self):
        self._run(False, [([(8, 2)], [1])])

    def test_opened_value_matches_interpolation(self):
        pcs, opened, all_evals, zeta, _, _ = self._run(False, [([(8, 2)], [1])])
        domain, evals = all_evals[0][0]
        coeffs = bb.np_from_monty(np.asarray(Dft(backend="cpu").idft_batch(evals)))
        for col in range(2):
            want = (0, 0, 0, 0)
            zp = (1, 0, 0, 0)
            for i in range(8):
                want = rf.eadd(want, rf.escale(zp, int(coeffs[i, col])))
                zp = rf.emul(zp, zeta)
            assert tuple(opened[0][0][0][col]) == want

    def test_multi_round_multi_height(self):
        # round 0: one 16x3 matrix opened at 2 points... points count via pts list
        self._run(False, [([(16, 3)], [2]), ([(8, 2), (8, 2)], [1, 1])])

    def test_hiding(self):
        pcs, opened, _, _, commits, proof = self._run(True, [([(8, 2)], [1])])
        assert proof.random_commit is not None

    def test_tampered_value_rejected(self):
        pcs, opened, all_evals, zeta, commits, proof = self._run(False, [([(8, 2)], [1])])
        v_ch = Challenger()
        v_ch.observe_commitment(commits[0])
        assert v_ch.sample_ext() == zeta
        domain = all_evals[0][0][0]
        bad = list(opened[0][0][0])
        bad[0] = tuple((bad[0][0] + 1) % bb.P if i == 0 else bad[0][i] for i in range(4))
        rounds_verify = [(commits[0], [(domain, [(zeta, bad)])])]
        assert not pcs.verify(rounds_verify, proof, v_ch)

    def test_tampered_pow_rejected(self):
        pcs, opened, all_evals, zeta, commits, proof = self._run(False, [([(8, 2)], [1])])
        v_ch = Challenger()
        v_ch.observe_commitment(commits[0])
        v_ch.sample_ext()
        proof.pow_witness = (proof.pow_witness + 1) % bb.P
        rounds_verify = [(commits[0], [(all_evals[0][0][0], [(zeta, opened[0][0][0])])])]
        assert not pcs.verify(rounds_verify, proof, v_ch)


@pytest.mark.slow  # multi-second prove: slow tier (docs/testing.md)
def test_fri_host_tail_byte_identical(monkeypatch):
    """OPT-0018: the host-CPU FRI fold tail must be transcript-invisible —
    identical serialized proofs with the tail disabled (0) and fully
    engaged (99)."""
    from tpu_stark.air.fibonacci import FibonacciAir, generate_trace_rows
    from tpu_stark.prover.config import create_config
    from tpu_stark.prover.proof import serialize_proof
    from tpu_stark.prover.prove import prove
    from tpu_stark.prover.verify import verify

    trace = generate_trace_rows(0, 1, 64)
    pis = [0, 1, int(trace[-1, 1])]
    blobs = {}
    for tail in ("0", "99"):
        monkeypatch.setenv("TPU_STARK_FRI_HOST_TAIL", tail)
        cfg = create_config(zk=True)
        proof = prove(cfg, FibonacciAir(), trace, pis)
        assert verify(create_config(zk=True), FibonacciAir(), proof, pis)
        blobs[tail] = serialize_proof(proof)
    assert blobs["0"] == blobs["99"]
