"""A/B: generic-limb REDC vs shift-based REDC (P/MU structure) on the chip.

Chained dependent montmuls on a (4096, 512) u32 array — compute-bound, no
HBM or launch effects inside the fori chain.
"""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_stark_jit_cache")
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from tpu_stark.fields import babybear as bb

u32 = jnp.uint32
_P32 = np.uint32(bb.P)
_MASK16 = np.uint32(0xFFFF)


def _umul32_wide(a, b):
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = lh + (ll >> 16)
    mid2 = mid + hl
    carry = (mid2 < mid).astype(u32)
    lo = (ll & _MASK16) | (mid2 << 16)
    hi = hh + (mid2 >> 16) + (carry << 16)
    return hi, lo


def mul_shift(a, b):
    hi, lo = _umul32_wide(a, b)
    # t = lo * MU mod 2^32 ; MU = 2^31 + 2^27 + 1
    t = lo + (lo << 27) + (lo << 31)
    # u_hi = hi32(t * P) ; P = 2^31 - 2^27 + 1 ; lo32(t*P) == lo (REDC identity)
    l31 = t << 31
    l27 = t << 27
    L1 = l31 + t
    c1 = (L1 < t).astype(u32)
    H1 = (t >> 1) + c1
    bor = (L1 < l27).astype(u32)
    u_hi = H1 - (t >> 5) - bor
    r = hi - u_hi
    return jnp.where(hi < u_hi, r + _P32, r)


def bench(fn, name, reps=400):
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, bb.P, (4096, 512), dtype=np.uint32)
    )
    y = jnp.asarray(
        np.random.default_rng(1).integers(0, bb.P, (4096, 512), dtype=np.uint32)
    )

    @jax.jit
    def chain(a, b):
        def body(_, v):
            return fn(v, b)

        return jax.lax.fori_loop(0, reps, body, a)

    out = chain(x, y)
    _ = jax.device_get(out.ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(x, y)
        _ = jax.device_get(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    n = 4096 * 512 * reps
    print(f"{name}: {n / best / 1e9:.1f} Gmul/s  ({best*1e3:.2f} ms / {reps} reps)")
    return out


# correctness first
rng = np.random.default_rng(7)
a = rng.integers(0, bb.P, (1 << 16,), dtype=np.uint32)
b = rng.integers(0, bb.P, (1 << 16,), dtype=np.uint32)
ref = np.array(
    [bb.host_monty_mul(int(x), int(y)) for x, y in zip(a[:512], b[:512])],
    dtype=np.uint32,
)
got = np.asarray(mul_shift(jnp.asarray(a[:512]), jnp.asarray(b[:512])))
assert (got == ref).all(), "mul_shift mismatch"
print("correctness ok (512 random pairs vs host oracle)")

bench(bb.mul, "generic-limb REDC (current)")
bench(mul_shift, "shift-based REDC (proposed)")
