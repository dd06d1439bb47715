"""Floor-cleared re-run of the NTT variant A/B matrix (OPT-0028 redo).

Old kernel-tier conclusions were taken at reps=20 against a ~24 ms
dispatch floor; this uses sol._timed (auto-scaled reps, floor <= 5%).
"""
import os, sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_stark_jit_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from tpu_stark.bench.harness import benchmark_input
from tpu_stark.bench import sol
from tpu_stark.fields import babybear as bb
from tpu_stark.matrix import reverse_matrix_index_bits
from tpu_stark.ntt import pallas_ntt, radix2


def run(fn, mat, label):
    def mk(reps):
        @jax.jit
        def chain(m):
            return jax.lax.fori_loop(0, reps, lambda _, v: fn(v), m)
        return chain

    calls_s = sol._timed(mk, mat, 20)
    n = mat.shape[0] * mat.shape[1]
    print(f"  {label:28s} {1e3/calls_s:8.3f} ms  {n*calls_s/1e6:9.1f} Melems/s",
          flush=True)


def with_env(**env):
    import contextlib

    @contextlib.contextmanager
    def cm():
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            yield
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    return cm()


print(f"dispatch floor: {sol.dispatch_floor()*1e3:.1f} ms", flush=True)

for h, w in [(16384, 128), (65536, 128)]:
    print(f"== {h}x{w} ==", flush=True)
    mat = jnp.asarray(bb.np_to_monty(benchmark_input(h, w)))
    log_h = int(np.log2(h))
    run(lambda v: radix2._dit_core(log_h, v, *radix2._stage_twiddles(log_h, False)),
        mat, "XLA radix-2 stage loop")
    with with_env(TPU_STARK_NTT_RADIX4="1"):
        # fresh jit identity: _dit_core caches on fn id; env read at trace
        run(lambda v: radix2._dit_core.__wrapped__(
            log_h, v, *radix2._stage_twiddles(log_h, False)), mat,
            "XLA radix-4 pair-fused")
    run(lambda v: radix2._four_step_core.__wrapped__(log_h, False, v), mat,
        "XLA four-step")
    if pallas_ntt.supports(h, w):
        try:
            run(lambda v: pallas_ntt.ntt_from_bitrev(reverse_matrix_index_bits(v)),
                mat, "pallas v2 (+XLA bitrev)")
        except Exception as e:
            print(f"  pallas v2 failed: {str(e)[:90]}")

for h, w in [(1 << 20, 8), (1 << 22, 2)]:
    print(f"== {h}x{w} (narrow) ==", flush=True)
    mat = jnp.asarray(bb.np_to_monty(benchmark_input(h, w)))
    log_h = int(np.log2(h))
    run(lambda v: radix2._dit_core(log_h, v, *radix2._stage_twiddles(log_h, False)),
        mat, "XLA radix-2 stage loop")
    run(lambda v: radix2._four_step_core.__wrapped__(log_h, False, v), mat,
        "XLA four-step (vpu4 default)")
