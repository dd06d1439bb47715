"""Quick NTT kernel-tier micro-bench: chained dft_batch reps, device_get-forced
(same discipline as bench.py). Compares the radix-4 pair-fused stage loop
against the r3-recorded radix-2 numbers (1440 / 1972 / 948 Melems/s)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_stark.fields import babybear as bb
from tpu_stark.ntt import radix2


def bench(h, w, reps=8):
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
    mel = reps * h * w / best / 1e6
    print(f"{h}x{w}: {mel:.1f} Melems/s ({best/reps*1e3:.3f} ms/call)", flush=True)


bench(16384, 128)
bench(65536, 128)
bench(1 << 20, 8)
bench(1 << 22, 8)
