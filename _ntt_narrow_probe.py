import time, numpy as np, jax, jax.numpy as jnp
from tpu_stark.fields import babybear as bb
from tpu_stark.ntt import radix2, mxu_ntt

rng = np.random.default_rng(0)

def timed(fn, mat, reps=4):
    @jax.jit
    def chain(m):
        return jax.lax.fori_loop(0, reps, lambda _, v: fn(v), m)
    out = chain(mat); jax.device_get(out.ravel()[0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); out = chain(mat)
        jax.device_get(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    h, w = mat.shape
    return h * w * reps / best / 1e6

for (h, w) in [(1 << 22, 2), (1 << 23, 2), (1 << 22, 4), (1 << 20, 8)]:
    mat = jnp.asarray(bb.np_to_monty(rng.integers(0, bb.P, size=(h, w), dtype=np.uint32)))
    r1 = timed(radix2.dft_batch, mat)
    r2 = timed(lambda m: mxu_ntt.dft_batch(m), mat)
    try:
        r3 = timed(lambda m: mxu_ntt.dft_batch(m, use_pallas=True), mat)
    except Exception as e:
        r3 = float('nan')
    print(f"{h}x{w}: radix2 {r1:8.1f}  mxu {r2:8.1f}  mxu-pallas {r3:8.1f} Melems/s", flush=True)
