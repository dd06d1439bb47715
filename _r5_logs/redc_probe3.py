"""Depth-sweep: time(depth) = a + b*depth separates fori overhead from op cost."""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_stark_jit_cache")
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from tpu_stark.fields import babybear as bb
from _r5_logs.redc_probe import mul_shift  # noqa: E402

SHAPE = (1024, 512)
REPS = 100


def timeit(fn, depth):
    x = jnp.asarray(np.random.default_rng(0).integers(0, bb.P, SHAPE, dtype=np.uint32))
    y = jnp.asarray(np.random.default_rng(1).integers(0, bb.P, SHAPE, dtype=np.uint32))

    @jax.jit
    def chain(a, b):
        def body(_, v):
            for _ in range(depth):
                v = fn(v, b)
            return v
        return jax.lax.fori_loop(0, REPS, body, a)

    out = chain(x, y)
    _ = jax.device_get(out.ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(x, y)
        _ = jax.device_get(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / REPS * 1e6  # us per iteration


for name, fn in [
    ("raw u32 mul", lambda a, b: a * b),
    ("montmul generic", bb.mul),
    ("montmul shift", mul_shift),
]:
    ts = {d: timeit(fn, d) for d in (1, 4, 16, 64)}
    # slope from the two largest depths
    slope = (ts[64] - ts[16]) / 48
    icept = ts[1] - slope
    line = "  ".join(f"d{d}={t:7.1f}us" for d, t in ts.items())
    elems = SHAPE[0] * SHAPE[1]
    print(f"{name:16s} {line}  | per-op {slope:6.2f}us = {elems/slope/1e3:7.1f} Melems/s/op  overhead~{icept:5.1f}us")
