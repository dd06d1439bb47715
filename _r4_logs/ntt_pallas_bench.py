import time
import jax, jax.numpy as jnp, numpy as np
from tpu_stark.fields import babybear as bb
from tpu_stark.matrix import reverse_matrix_index_bits
from tpu_stark.ntt import pallas_ntt, radix2

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

def pallas_dft(m):
    return pallas_ntt.ntt_from_bitrev(reverse_matrix_index_bits(m))

# correctness on-chip first
x = jnp.asarray(bb.np_to_monty(np.random.default_rng(1).integers(0, bb.P, size=(4096, 128), dtype=np.uint32)))
a = np.asarray(radix2.dft_batch(x)); b = np.asarray(pallas_dft(x))
print("pallas matches XLA:", bool(np.array_equal(a, b)), flush=True)

bench(radix2.dft_batch, 16384, 128, label="xla   ")
bench(pallas_dft,      16384, 128, label="pallas")
bench(radix2.dft_batch, 65536, 128, label="xla   ")
bench(pallas_dft,      65536, 128, label="pallas")
