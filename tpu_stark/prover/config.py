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

    def challenger(self) -> Challenger:
        """Fresh Fiat-Shamir transcript (Challenger::from_hasher(vec![], keccak),
        fib_air.rs:66)."""
        return Challenger()


def create_config(
    fri_params: Optional[FriParameters] = None,
    zk: bool = True,
    backend: Optional[str] = None,
    rng_seed: int = 1,
) -> StarkConfig:
    """The reference's zk config: hiding Merkle commitments (SmallRng(1) salts),
    HidingFriPcs with 4 random codewords, test FRI params w/ log_blowup=2
    (fib_air.rs:40-65)."""
    fri = fri_params if fri_params is not None else create_test_fri_params(2)
    dft = Dft(backend=backend)
    if zk:
        pcs = TwoAdicFriPcs(
            dft,
            fri,
            val_mmcs=MerkleTreeMmcs(hiding=True, rng=SmallRng.seed_from_u64(rng_seed)),
            challenge_mmcs=MerkleTreeMmcs(),
            num_random_codewords=4,
            rng=SmallRng.seed_from_u64(rng_seed),
        )
    else:
        pcs = TwoAdicFriPcs(dft, fri)
    return StarkConfig(pcs=pcs, zk=zk, rng_seed=rng_seed)
