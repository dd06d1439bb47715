"""uni-stark prove — the full pipeline of SURVEY.md par3.1.

Transcript (the framework's canonical Fiat-Shamir spec, mirrored by verify.py):

1. observe log_degree (u32)
2. observe trace commitment; observe public values
3. alpha  = sample_ext           (constraint folding challenge)
4. observe quotient-chunks commitment
5. zeta   = sample_ext           (out-of-domain point); zeta' = g * zeta
6. pcs.open: [hiding: observe random-codeword commitment], observe opened
   values, FRI alpha/betas/final-poly/PoW/queries

zk mode (the reference's ``test_zk`` shape, fib_air.rs:27-75): the committed
trace is the randomized T'(x) = T(x) + Z_H(x)*R(x) with R of degree < n drawn
from the zk rng stream (compat/device_rng.py; ``zk_rng="smallrng"`` for the
reference's host Xoshiro stream) — T' agrees with T on H, has degree < 2n, and makes
the two out-of-domain trace openings perfectly hiding; Merkle leaves are
salted and 4 random codewords mask the FRI batch (HidingFriPcs semantics).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..air.air import BaseAir, SymbolicAirBuilder, get_symbolic_info
from ..air.builders import QuotientBuilder
from ..air.values import DevVal
from ..compat.device_rng import make_zk_rng
from ..fields import babybear as bb
from ..fields import extension as ext4
from ..fields import ref_field as rf
from ..fri.domains import TwoAdicCoset
from ..matrix import log2_strict
from .config import StarkConfig
from .proof import Commitments, OpenedValues, Proof


from ..bench.profiling import hbm_note as _hbm_note


@functools.lru_cache(maxsize=None)
def _quotient_fn(air_key, log_n: int, log_m: int, num_pis: int):
    """One jitted program for the whole quotient pass (OPT-0003): selectors,
    vectorized constraint eval, alpha folding, zeroifier division — keyed on
    (air, trace size, quotient-domain size, #public values)."""
    air = _AIR_REGISTRY[air_key]
    trace_domain = TwoAdicCoset(log_n, 1)
    quotient_domain = trace_domain.create_disjoint_domain(1 << log_m)
    step = (1 << log_m) >> log_n

    @jax.jit
    def qfn(trace_on_q, pis_monty, alpha_pows):
        selectors = trace_domain.selectors_on_coset_device(quotient_domain)
        builder = QuotientBuilder(
            main_local=trace_on_q,
            main_next=jnp.roll(trace_on_q, -step, axis=0),
            selectors=selectors,
            public_values=[DevVal(pis_monty[i]) for i in range(num_pis)],
        )
        air.eval(builder)
        folded = builder.folded_constraints(alpha_pows)
        return ext4.mul_base(folded, selectors["inv_zeroifier"])

    return qfn


_AIR_REGISTRY: dict = {}


def _register_air(air: BaseAir):
    key = (type(air).__module__, type(air).__qualname__, air.width)
    _AIR_REGISTRY[key] = air
    return key


def get_log_quotient_degree(air: BaseAir, num_public_values: int, zk: bool) -> int:
    """Quotient chunk-count exponent: constraints' max degree in multiples of n
    (trace vars count 2 multiples when the zk-randomized trace has degree 2n),
    chunks = next_pow2(max(d, 2) - 1)."""
    import math

    b = SymbolicAirBuilder(
        air.width, num_public_values, trace_degree_multiple=2 if zk else 1
    )
    air.eval(b)
    d = max(b.max_degree, 2)
    return max(0, math.ceil(math.log2(d - 1)))


def prove(
    config: StarkConfig,
    air: BaseAir,
    trace: np.ndarray,  # (n, width) canonical uint32
    public_values: Sequence[int],
) -> Proof:
    import os
    import time

    timing = os.environ.get("TPU_STARK_TIMING") == "1"
    t_last = [time.perf_counter()]

    def mark(phase: str) -> None:
        if timing:
            now = time.perf_counter()
            print(
                f"[prove] {phase}: {now - t_last[0]:.3f}s{_hbm_note()}",
                flush=True,
            )
            t_last[0] = now

    pcs = config.pcs
    dft = pcs.dft
    challenger = config.challenger()

    n, width = trace.shape
    assert width == air.width
    log_n = log2_strict(n)
    log_qd = get_log_quotient_degree(air, len(public_values), config.zk)
    qd = 1 << log_qd

    trace_domain = pcs.natural_domain_for_degree(n)
    trace_dev = jnp.asarray(bb.np_to_monty(trace.astype(np.uint32)))

    # -- 1. commit (possibly randomized) trace -----------------------------
    if config.zk:
        rng = make_zk_rng(config.zk_rng, config.rng_seed, "trace")
        r = jnp.asarray(rng.sample_babybear_matrix_monty(n, width))
        coeffs = dft.idft_batch(trace_dev)
        coeffs2 = jnp.concatenate([bb.sub(coeffs, r), r], axis=0)  # (2n, w)
        committed_domain = pcs.natural_domain_for_degree(2 * n)
        committed_evals = dft.dft_batch(coeffs2)
        del r, coeffs, coeffs2, trace_dev  # 2^24-scale locals: free eagerly
    else:
        committed_domain = trace_domain
        committed_evals = trace_dev

    mark("trace randomize+lde prep")
    trace_commit, trace_data = pcs.commit([(committed_domain, committed_evals)])
    del committed_evals
    mark("trace commit")

    challenger.observe_u32(log_n)
    challenger.observe_commitment(trace_commit)
    challenger.observe_u32s([int(p) % bb.P for p in public_values])
    alpha = challenger.sample_ext()

    # -- 2. quotient over the disjoint coset (one jitted program) ----------
    quotient_domain = trace_domain.create_disjoint_domain(n * qd)
    trace_on_q = pcs.get_evaluations_on_domain(trace_data, 0, quotient_domain)
    if int(trace_on_q.shape[1]) > width:
        # p3 zk layout: the committed trace carries appended random columns
        # (add_random_cols); constraints read only the AIR columns.  The
        # randomized T' still agrees with T on H, so the quotient divides.
        trace_on_q = trace_on_q[:, :width]
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
    qfn = _quotient_fn(
        _register_air(air), log_n, log_n + log_qd, len(public_values)
    )
    quotient_vals = qfn(trace_on_q, pis_dev, alpha_pows_dev)
    del trace_on_q
    mark("quotient eval")

    chunk_domains = quotient_domain.split_domains(qd)
    chunks = [quotient_vals[i::qd] for i in range(qd)]  # (n, 4) base mats
    del quotient_vals
    chunk_items = list(zip(chunk_domains, chunks))
    del chunks  # commit releases each group's evals as it consumes them
    quotient_commit, quotient_data = pcs.commit(chunk_items)
    del chunk_items
    mark("quotient commit")
    challenger.observe_commitment(quotient_commit)

    # -- 3. open at zeta ---------------------------------------------------
    zeta = challenger.sample_ext()
    zeta_next = trace_domain.next_point_ext(zeta)

    opened, fri_proof = pcs.open(
        [
            (trace_data, [[zeta, zeta_next]]),
            (quotient_data, [[zeta]] * qd),
        ],
        challenger,
    )
    mark("pcs open (reduced openings + FRI + queries)")
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
