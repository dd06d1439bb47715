"""Compute-bound A/B: 10 dependent montmuls per fori body + raw-op cost probes."""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_stark_jit_cache")
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from tpu_stark.fields import babybear as bb
from _r5_logs.redc_probe import mul_shift  # noqa: E402

u32 = jnp.uint32
SHAPE = (1024, 512)  # 2 MB


def bench_chain(fn, name, depth=10, reps=100):
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, bb.P, SHAPE, dtype=np.uint32)
    )
    y = jnp.asarray(
        np.random.default_rng(1).integers(0, bb.P, SHAPE, dtype=np.uint32)
    )

    @jax.jit
    def chain(a, b):
        def body(_, v):
            for _ in range(depth):
                v = fn(v, b)
            return v

        return jax.lax.fori_loop(0, reps, body, a)

    out = chain(x, y)
    _ = jax.device_get(out.ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(x, y)
        _ = jax.device_get(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    n = SHAPE[0] * SHAPE[1] * reps * depth
    print(f"{name}: {n / best / 1e9:6.1f} Gop/s  ({best*1e3:.2f} ms)")


print("== montmul variants (10 deep per body) ==")
bench_chain(bb.mul, "generic-limb REDC")
bench_chain(mul_shift, "shift-based REDC ")

print("== raw op costs (10 deep per body) ==")
bench_chain(lambda a, b: a * b, "u32 mul          ")
bench_chain(lambda a, b: a + b, "u32 add          ")
bench_chain(lambda a, b: a ^ b, "u32 xor          ")
bench_chain(lambda a, b: a >> 7, "u32 shr const    ")
bench_chain(lambda a, b: (a & np.uint32(0xFFFF)) * (b & np.uint32(0xFFFF)),
            "u16xu16 mul      ")
bench_chain(lambda a, b: jnp.where(a < b, a, b), "cmp+select       ")

f32x = jnp.asarray(np.random.default_rng(2).random(SHAPE, dtype=np.float32))
f32y = jnp.asarray(np.random.default_rng(3).random(SHAPE, dtype=np.float32) + 1.0)


def bench_f32(fn, name, depth=10, reps=100):
    @jax.jit
    def chain(a, b):
        def body(_, v):
            for _ in range(depth):
                v = fn(v, b)
            return v

        return jax.lax.fori_loop(0, reps, body, a)

    out = chain(f32x, f32y)
    _ = jax.device_get(out.ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(f32x, f32y)
        _ = jax.device_get(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    n = SHAPE[0] * SHAPE[1] * reps * depth
    print(f"{name}: {n / best / 1e9:6.1f} Gop/s  ({best*1e3:.2f} ms)")


print("== f32 ==")
bench_f32(lambda a, b: a * b, "f32 mul          ")
bench_f32(lambda a, b: a * b + a, "f32 fma-ish      ")
