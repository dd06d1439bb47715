"""Bit-reversal implementation A/B at 16384x128 on chip."""
import os, sys, time, functools

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_stark_jit_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpu_stark.bench.harness import benchmark_input
from tpu_stark.fields import babybear as bb
from tpu_stark.matrix import reverse_matrix_index_bits, bit_reversal_perm

H, W = 16384, 128
LOG_H = 14
mat = jnp.asarray(bb.np_to_monty(benchmark_input(H, W)))
ref = np.asarray(reverse_matrix_index_bits(mat))


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
    print(f"  {label:28s} {dt*1e3:7.3f} ms")


def check(fn, label):
    got = np.asarray(fn(mat))
    ok = (got == ref).all()
    print(f"  {label:28s} correct={ok}")
    return ok


# (b) rank-15 transpose form
def br_transpose(m):
    x = m.reshape((2,) * LOG_H + (W,))
    perm = tuple(range(LOG_H - 1, -1, -1)) + (LOG_H,)
    return x.transpose(perm).reshape(H, W)


# (e) single take
PERM = jnp.asarray(bit_reversal_perm(LOG_H).astype(np.int32))
def br_take(m):
    return jnp.take(m, PERM, axis=0)


# (f) pallas 8-in-spec kernel: out rows [8i, 8i+8) <- in rows rev3(j)*2048 + rev11(i)
def _rev_bits(x, n):
    r = 0
    for b in range(n):
        r = (r << 1) | ((x >> b) & 1)
    return r


def _br_kernel(*refs):
    o_ref = refs[-1]
    for j in range(8):
        o_ref[j, :] = refs[j][0, :]


def br_pallas(m):
    log_blk = LOG_H - 3
    def imap(j):
        # out block i covers rows 8i..8i+8; source row for sublane j:
        # rev14(8i+j) = rev3(j)*2048 + rev11(i)
        def f(i):
            # rev11(i) via scalar arithmetic
            r = 0
            x = i
            for b in range(log_blk):
                r = (r * 2) + ((x >> b) & 1)
            return (_rev_bits(j, 3) * (1 << log_blk) + r, 0)
        return f
    in_specs = [
        pl.BlockSpec((1, W), imap(j), memory_space=pltpu.VMEM) for j in range(8)
    ]
    return pl.pallas_call(
        _br_kernel,
        grid=(H // 8,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), m.dtype),
    )(*([m] * 8))


print("== correctness ==")
check(br_transpose, "rank-15 transpose")
check(br_take, "single take")
try:
    check(br_pallas, "pallas 8-spec")
except Exception as e:
    print(f"  pallas 8-spec failed: {str(e)[:150]}")

print("== speed ==")
timeit(reverse_matrix_index_bits, mat, label="current (2 gathers+swap)")
timeit(br_transpose, mat, label="rank-15 transpose")
timeit(br_take, mat, label="single take")
try:
    timeit(br_pallas, mat, label="pallas 8-spec")
except Exception as e:
    print(f"  pallas 8-spec bench failed: {str(e)[:150]}")
