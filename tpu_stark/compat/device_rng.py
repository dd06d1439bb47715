"""Counter-based device RNG for zk hiding randomness (salts, random
codewords, trace randomizers).

The reference's hiding randomness is a host-side sequential ``SmallRng``
(fib_air.rs:50,65 — seeded 1); reproducing that on TPU means sampling on the
host and shipping the stream over PCIe/the tunnel: at the 2^20 north-star
trace the salt matrices alone are 67 MB per hiding commit, and the transfer
was measured to dominate the entire commit phase (docs/optimization_attempts
OPT-0014).  This module is the TPU-native replacement: a **counter-based**
(Threefry, via ``jax.random``) stream generated directly in HBM.

Properties:

* deterministic in (seed, call index) — proofs are reproducible;
* mesh-invariant — values depend only on the logical position, never on the
  device layout, so sharded and single-device proves stay byte-identical
  (tests/test_dist_prove.py);
* distributionally identical to the host stream's target: uniform residues
  interpreted as Monty form, exactly like p3's ``StandardUniform`` for
  ``MontyField31`` (compat/smallrng.py::sample_babybear_monty) — here via a
  64-bit sample reduced mod p (bias 2^-33, vs. the host path's rejection
  loop, which cannot be data-parallel because consumption varies).

``DeviceRng`` duck-types ``SmallRng.sample_babybear_matrix_monty`` so the
MMCS/PCS/prover accept either; ``create_config(zk_rng=...)`` selects
(``"device"`` default, ``"smallrng"`` for the reference-parity stream).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import babybear as bb


@functools.partial(jax.jit, static_argnums=(1, 2))
def _sample_monty(key, rows: int, cols: int) -> jnp.ndarray:
    """Uniform Monty-form residues: r = (hi·2^32 + lo) mod p from 64 random
    bits per element.  hi·2^32 mod p is exactly ``from_u32(hi)``'s stored
    value (REDC(hi·R²) = hi·R mod p); lo mod p needs at most two conditional
    subtracts (2^32 < 3p)."""
    k_hi, k_lo = jax.random.split(key)
    hi = jax.random.bits(k_hi, (rows, cols), jnp.uint32)
    lo = jax.random.bits(k_lo, (rows, cols), jnp.uint32)
    p = jnp.uint32(bb.P)
    lo = jnp.where(lo >= p, lo - p, lo)
    lo = jnp.where(lo >= p, lo - p, lo)
    return bb.add(bb.from_u32(hi), lo)


class LazyMatrix:
    """Descriptor of one counter-based sample call: the matrix is a pure
    function of (folded key, shape), so holders can release the dense array
    and regenerate it on demand — bit-identical to the eager sample (same
    ``_sample_monty`` program).  The 2^24 lowmem lever for hiding salts
    (commit/lowmem.py): commit hashes the transient matrix into the leaf
    layer, stores this handle, and the query phase regenerates once."""

    def __init__(self, key, rows: int, cols: int):
        self._key = key
        self.shape = (rows, cols)

    def materialize(self) -> jnp.ndarray:
        return _sample_monty(self._key, *self.shape)


class DeviceRng:
    """Stateful call counter over a fixed Threefry key (one fold_in per
    sample call — the device analog of the persistent host rng whose state
    advances across commits, merkle.py::MerkleTreeMmcs docstring)."""

    def __init__(self, seed: int, stream: str = ""):
        import zlib

        self._key = jax.random.key(np.uint64(seed) & np.uint64(0xFFFFFFFF))
        if stream:
            # domain separation between consumers (the reference seeds its
            # salt and codeword rngs identically, so their streams collide;
            # device mode fixes that without changing the smallrng path)
            self._key = jax.random.fold_in(self._key, zlib.crc32(stream.encode()))
        self._counter = 0

    def sample_babybear_matrix_monty(self, rows: int, cols: int) -> jnp.ndarray:
        return self.sample_lazy(rows, cols).materialize()

    def sample_lazy(self, rows: int, cols: int) -> LazyMatrix:
        """Advance the stream but defer generation (values identical to
        ``sample_babybear_matrix_monty`` of the same call position)."""
        key = jax.random.fold_in(self._key, self._counter)
        self._counter += 1
        return LazyMatrix(key, rows, cols)


def make_zk_rng(mode: str, seed: int, stream: str = ""):
    """``"device"`` -> DeviceRng; ``"smallrng"`` -> the bit-exact host
    Xoshiro256++ stream (reference parity, pays the host->device transfer;
    ``stream`` is ignored there to preserve the reference's identical-seed
    behavior)."""
    if mode == "device":
        return DeviceRng(seed, stream)
    if mode == "smallrng":
        from .smallrng import SmallRng

        return SmallRng.seed_from_u64(seed)
    raise ValueError(f"unknown zk_rng mode {mode!r}")
