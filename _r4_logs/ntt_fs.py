import time
import jax, jax.numpy as jnp, numpy as np
from tpu_stark.fields import babybear as bb
from tpu_stark.ntt import radix2

def bench(fn, h, w, reps=20, label=""):
    rng = np.random.default_rng(0)
    mat = jnp.asarray(bb.np_to_monty(rng.integers(0, bb.P, size=(h, w), dtype=np.uint32)))
    @jax.jit
    def chain(m):
        return jax.lax.fori_loop(0, reps, lambda _, v: fn(v), m)
    out = chain(mat); jax.device_get(out.ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(mat); jax.device_get(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"  {label} {h}x{w}: {reps*h*w/best/1e6:.1f} Melems/s", flush=True)
    return np.asarray(out)

import math
def four_step(m):
    lh = int(math.log2(m.shape[0]))
    return radix2._four_step_core(lh, False, m)

# correctness vs dft_batch first (small)
x = jnp.asarray(bb.np_to_monty(np.random.default_rng(1).integers(0, bb.P, size=(1024, 4), dtype=np.uint32)))
assert np.array_equal(np.asarray(radix2.dft_batch(x)), np.asarray(four_step(x))), "four-step mismatch"
print("four-step matches dft_batch", flush=True)

bench(radix2.dft_batch, 16384, 128, label="stage-loop")
bench(four_step, 16384, 128, label="four-step ")
bench(radix2.dft_batch, 65536, 128, label="stage-loop")
bench(four_step, 65536, 128, label="four-step ")
