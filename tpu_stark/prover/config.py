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
from ..compat.smallrng import SmallRng
from ..fri.config import FriParameters, create_test_fri_params
from ..ntt.dft import Dft


@dataclasses.dataclass
class StarkConfig:
    pcs: TwoAdicFriPcs
    zk: bool = False
    rng_seed: int = 1  # trace-randomizer stream (zk)
    challenger_factory: type = Challenger

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
) -> StarkConfig:
    """Assemble a full config.

    ``hash="keccak"`` reproduces the reference's zk stack: hiding Keccak
    Merkle commitments (SmallRng(1) salts), HidingFriPcs with 4 random
    codewords, byte-level Fiat-Shamir (fib_air.rs:40-66).
    ``hash="poseidon2"`` is the field-native production stack (BASELINE
    configs): Poseidon2 MMCS + duplex challenger — no serialization anywhere.
    ``mesh`` (a jax.sharding.Mesh) switches the PCS to the multi-chip sharded
    path (dist/pcs.py): distributed NTT + collective Merkle, bit-identical
    proofs (BASELINE config 5).
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
        pcs = pcs_cls(
            dft,
            fri,
            val_mmcs=mmcs_cls(hiding=True, rng=SmallRng.seed_from_u64(rng_seed)),
            challenge_mmcs=mmcs_cls(),
            num_random_codewords=4,
            rng=SmallRng.seed_from_u64(rng_seed),
        )
    else:
        pcs = pcs_cls(dft, fri, val_mmcs=mmcs_cls(), challenge_mmcs=mmcs_cls())
    return StarkConfig(
        pcs=pcs, zk=zk, rng_seed=rng_seed, challenger_factory=challenger_factory
    )
