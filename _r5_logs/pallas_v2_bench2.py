"""Clean per-pass bench: two-buffer carry defeats XLA's while-loop VMEM pinning."""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_stark_jit_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from tpu_stark.bench.harness import benchmark_input
from tpu_stark.fields import babybear as bb
from tpu_stark.matrix import reverse_matrix_index_bits
from tpu_stark.ntt import pallas_ntt, radix2


def timeit(fn, mat, reps=10, label=""):
    """Carry = (A, B); each iter applies fn to both.  2 applications/iter."""
    @jax.jit
    def chain(m):
        def body(_, c):
            a, b = c
            return fn(b), fn(a)
        return jax.lax.fori_loop(0, reps, body, (m, m + np.uint32(0)))

    out = chain(mat); jax.device_get(out[0].ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); out = chain(mat); jax.device_get(out[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    dt = best / (2 * reps)
    n = mat.shape[0] * mat.shape[1]
    print(f"  {label:26s} {dt*1e3:7.3f} ms  {n/dt/1e6:8.1f} Melems/s")
    return dt


for h, w in [(16384, 128)]:
    print(f"== {h}x{w} ==")
    mat = jnp.asarray(bb.np_to_monty(benchmark_input(h, w)))
    log_h = int(np.log2(h))
    timeit(lambda v: reverse_matrix_index_bits(v), mat, label="bitrev only")
    timeit(lambda v: pallas_ntt._run_pass(v, 0, 9, False, False), mat,
           label="pass1 only (9 stages)")
    timeit(lambda v: pallas_ntt._run_pass(v, 9, log_h - 9, False, False), mat,
           label=f"pass2 only ({log_h-9} stages)")
    timeit(lambda v: pallas_ntt.ntt_from_bitrev(reverse_matrix_index_bits(v)),
           mat, label="full pallas v2")
    timeit(lambda v: radix2.dft_batch(v), mat, label="XLA stage loop")
