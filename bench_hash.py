"""Micro-benchmark: batched hash kernels (Keccak sponge, Poseidon2) on TPU.

These bound every Merkle layer of the commit phases (SURVEY.md §2.3
"SIMD-vectorized hashing": the reference vectorizes Keccak lanes across
leaves; here the leaf axis fills the VPU).

Timing discipline: the axon tunnel's ``block_until_ready`` can return before
remote execution finishes, so each benchmark chains R dependent rounds inside
ONE jitted loop and forces a device_get at the end; throughput = N*R / wall.
(A naive per-call timer reported >8 Gperm/s — far above VPU speed-of-light —
which is how this discipline was discovered.)"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_stark.fields import babybear as bb
from tpu_stark.hash import poseidon2, sponge


def _timed_chain(chain, arg, n, reps):
    out = chain(arg)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    out = chain(arg)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = time.perf_counter() - t0
    return dt, n * reps / dt / 1e6


def main() -> None:
    n = 1 << 20
    reps = 32
    rng = np.random.default_rng(0)

    @jax.jit
    def keccak_chain(mat):
        def body(_, m):
            digs = sponge.hash_field_rows_batched(m)  # (N, 4, 2)
            return digs.reshape(m.shape[0], 8)[:, :6]

        return jax.lax.fori_loop(0, reps, body, mat)

    mat = jnp.asarray(rng.integers(0, 1 << 31, size=(n, 6), dtype=np.uint32))
    dt, mperm = _timed_chain(keccak_chain, mat, n, reps)
    print(f"keccak leaf sponge  (N={n}, 6 u32, R={reps}): "
          f"{dt*1e3:8.2f} ms  {mperm:8.1f} Mperm/s")

    @jax.jit
    def p2_chain(state):
        def body(_, s):
            return poseidon2.permute_batched(s)

        return jax.lax.fori_loop(0, reps, body, state)

    st = jnp.asarray(
        bb.np_to_monty(rng.integers(0, bb.P, size=(n, 16), dtype=np.uint32))
    )
    dt, mperm = _timed_chain(p2_chain, st, n, reps)
    print(f"poseidon2-16        (N={n}, R={reps}):        "
          f"{dt*1e3:8.2f} ms  {mperm:8.1f} Mperm/s")


if __name__ == "__main__":
    main()
