import os, time, sys
import jax, jax.numpy as jnp, numpy as np
from tpu_stark.fields import babybear as bb
from tpu_stark.ntt import radix2

def bench(h, w, reps=20):
    rng = np.random.default_rng(0)
    mat = jnp.asarray(bb.np_to_monty(rng.integers(0, bb.P, size=(h, w), dtype=np.uint32)))
    @jax.jit
    def chain(m):
        return jax.lax.fori_loop(0, reps, lambda _, v: radix2.dft_batch(v), m)
    out = chain(mat); jax.device_get(out.ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(mat); jax.device_get(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"  {h}x{w}: {reps*h*w/best/1e6:.1f} Melems/s", flush=True)

for mode in ("0", "1"):
    os.environ["TPU_STARK_NTT_RADIX4"] = mode
    jax.clear_caches()
    print(f"radix4={mode}:", flush=True)
    bench(16384, 128)
    bench(65536, 128)
