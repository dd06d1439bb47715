"""StarkConfig — the type-stack assembly point.

Rebuild of the reference's config assembly (``/root/reference/native/src/
fib_air.rs:22-68``): hash stack + MMCS + FRI params + DFT backend + challenger,
with the zk (hiding) switch that the reference's ``test_zk``-style workload
enables (salted Merkle leaves, 4 random FRI codewords, randomized trace).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from ..challenger.challenger import Challenger
from ..commit.merkle import MerkleTreeMmcs
from ..commit.pcs import TwoAdicFriPcs
from ..compat.device_rng import make_zk_rng
from ..fri.config import FriParameters, create_test_fri_params
from ..ntt.dft import Dft


@dataclasses.dataclass
class StarkConfig:
    pcs: TwoAdicFriPcs
    zk: bool = False
    rng_seed: int = 1  # trace-randomizer stream (zk)
    challenger_factory: type = Challenger
    zk_rng: str = "device"  # hiding-randomness generator (see make_zk_rng)

    def challenger(self):
        """Fresh Fiat-Shamir transcript (Challenger::from_hasher(vec![], keccak),
        fib_air.rs:66; or a Poseidon2 duplex challenger)."""
        return self.challenger_factory()


def create_config(
    fri_params: Optional[FriParameters] = None,
    zk: bool = True,
    backend: Optional[str] = None,
    rng_seed: int = 1,
    hash: str = "keccak",
    mesh=None,
    zk_rng: str = "device",
    zk_layout: str = "tpu",
) -> StarkConfig:
    """Assemble a full config.

    ``hash="keccak"`` reproduces the reference's zk stack: hiding Keccak
    Merkle commitments (seeded salt stream), HidingFriPcs with 4 random
    codewords, byte-level Fiat-Shamir (fib_air.rs:40-66).
    ``hash="poseidon2"`` is the field-native production stack (BASELINE
    configs): Poseidon2 MMCS + duplex challenger — no serialization anywhere.
    ``mesh`` (a jax.sharding.Mesh) switches the PCS to the multi-chip sharded
    path (dist/pcs.py): distributed NTT + collective Merkle, bit-identical
    proofs (BASELINE config 5).
    ``zk_rng`` selects the hiding-randomness stream: ``"device"`` (default)
    generates salts/random codewords/trace randomizers counter-based in HBM
    (OPT-0014 — the host stream's transfer dominated hiding commits);
    ``"smallrng"`` is the reference-parity host Xoshiro256++ stream
    (SmallRng::seed_from_u64, fib_air.rs:50,65).
    ``zk_layout``: ``"tpu"`` (round-1/2 layout) or ``"p3"`` — random columns
    appended to every hiding commit per the shipped binary's
    ``add_random_cols`` evidence (commit/pcs.py, docs/so_evidence.md §3).
    """
    fri = fri_params if fri_params is not None else create_test_fri_params(2)
    dft = Dft(backend=backend)
    if hash == "keccak":
        mmcs_cls = MerkleTreeMmcs
        challenger_factory = Challenger
    elif hash == "poseidon2":
        from ..commit.poseidon2_mmcs import DuplexChallenger, Poseidon2Mmcs

        mmcs_cls = Poseidon2Mmcs
        challenger_factory = DuplexChallenger
    else:
        raise ValueError(f"unknown hash stack {hash!r}")
    if mesh is not None:
        from ..dist.pcs import ShardedPcs

        def pcs_cls(*args, **kwargs):
            return ShardedPcs(mesh, *args, **kwargs)
    else:
        pcs_cls = TwoAdicFriPcs
    if zk:
        # Like the reference, the MMCS salt stream and the HidingPcs codeword
        # stream are independently seeded rngs (fib_air.rs:50,65); device mode
        # additionally domain-separates them by stream tag.
        pcs = pcs_cls(
            dft,
            fri,
            val_mmcs=mmcs_cls(hiding=True, rng=make_zk_rng(zk_rng, rng_seed, "salts")),
            challenge_mmcs=mmcs_cls(),
            num_random_codewords=4,
            rng=make_zk_rng(zk_rng, rng_seed, "codewords"),
            zk_layout=zk_layout,
        )
    else:
        pcs = pcs_cls(dft, fri, val_mmcs=mmcs_cls(), challenge_mmcs=mmcs_cls())
    return StarkConfig(
        pcs=pcs, zk=zk, rng_seed=rng_seed, challenger_factory=challenger_factory,
        zk_rng=zk_rng,
    )
