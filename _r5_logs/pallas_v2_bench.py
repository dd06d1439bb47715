"""On-chip bench of pallas_ntt v2: full path + per-pass breakdown."""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_stark_jit_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from tpu_stark.bench.harness import benchmark_input
from tpu_stark.fields import babybear as bb
from tpu_stark.matrix import reverse_matrix_index_bits
from tpu_stark.ntt import pallas_ntt, radix2


def timeit(fn, mat, reps=20, label=""):
    @jax.jit
    def chain(m):
        return jax.lax.fori_loop(0, reps, lambda _, v: fn(v), m)

    out = chain(mat); jax.device_get(out.ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); out = chain(mat); jax.device_get(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    dt = best / reps
    n = mat.shape[0] * mat.shape[1]
    print(f"  {label:24s} {dt*1e3:7.3f} ms  {n/dt/1e6:8.1f} Melems/s")
    return dt


for h, w in [(16384, 128), (65536, 128)]:
    print(f"== {h}x{w} ==")
    mat = jnp.asarray(bb.np_to_monty(benchmark_input(h, w)))
    log_h = int(np.log2(h))
    # correctness vs XLA path first
    want = np.asarray(radix2.dft_batch(mat))
    got = np.asarray(
        pallas_ntt.ntt_from_bitrev(reverse_matrix_index_bits(mat))
    )
    assert (want == got).all(), "pallas v2 mismatch vs XLA"
    print("  bit-identical to XLA path")

    timeit(lambda v: reverse_matrix_index_bits(v), mat, label="bitrev only")
    timeit(lambda v: pallas_ntt._run_pass(v, 0, 9, False, False), mat,
           label="pass1 only (9 stages)")
    timeit(lambda v: pallas_ntt._run_pass(v, 9, log_h - 9, False, False), mat,
           label=f"pass2 only ({log_h-9} stages)")
    timeit(lambda v: pallas_ntt.ntt_from_bitrev(reverse_matrix_index_bits(v)),
           mat, label="full pallas v2")
    timeit(lambda v: radix2.dft_batch(v), mat, label="XLA stage loop")
