"""Pallas bitrev prototype: [A(3) | B(L-9) | z(6)] decomposition.

out row r = A*2^(L-3) + B*64 + z   (z = zh*8 + zl)
in  row rev_L(r) = rev3(zl)*2^(L-3) + rev3(zh)*2^(L-6) + rev_{L-9}(B)*8 + rev3(A)

in  view (8_p, 8_q, 2^(L-9), 8_j, W)  block (8,8,1,8,W) at (0,0,rev(B),0,0)
out view (8_A, 2^(L-9), 8_zh, 8_zl, W) block (8,1,8,8,W) at (0,B,0,0,0)
kernel: ob[A, zh, zl] = ib[rev3(zl), rev3(zh), rev3(A)]
"""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_stark_jit_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpu_stark.bench.harness import benchmark_input
from tpu_stark.fields import babybear as bb
from tpu_stark.matrix import reverse_matrix_index_bits

REV3 = np.array([0, 4, 2, 6, 1, 5, 3, 7])


def _rev_scalar(x, n):
    r = x * 0
    for b in range(n):
        r = r * 2 + ((x >> b) & 1)
    return r


def _rev3_axis(v, axis):
    return jnp.concatenate(
        [jax.lax.index_in_dim(v, int(i), axis, keepdims=True) for i in REV3],
        axis=axis,
    )


def _kernel(i_ref, o_ref):
    x = i_ref[:, :, 0, :, :]  # (8_p, 8_q, 8_j, W)
    y = jnp.transpose(x, (2, 1, 0, 3))  # (8_j, 8_q, 8_p, W)
    y = _rev3_axis(y, 0)  # rev3 on A axis (outer)
    y = _rev3_axis(y, 1)  # rev3 on zh axis (outer)
    y = _rev3_axis(y, 2)  # rev3 on zl axis (sublane)
    o_ref[...] = y[:, None]


def bitrev_pallas(mat, interpret=False):
    h, w = mat.shape
    log_h = h.bit_length() - 1
    assert (1 << log_h) == h and log_h >= 9 and w % 128 == 0
    nb = 1 << (log_h - 9)
    iv = mat.reshape(8, 8, nb, 8, w)
    out = pl.pallas_call(
        _kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(
                (8, 8, 1, 8, w),
                lambda b: (0, 0, _rev_scalar(b, (h.bit_length() - 1) - 9), 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (8, 1, 8, 8, w), lambda b: (0, b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, nb, 8, 8, w), mat.dtype),
        interpret=interpret,
    )(iv)
    return out.reshape(h, w)


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


if __name__ == "__main__":
    for h in (16384, 65536):
        mat = jnp.asarray(bb.np_to_monty(benchmark_input(h, 128)))
        ref = np.asarray(reverse_matrix_index_bits(mat))
        got = np.asarray(bitrev_pallas(mat))
        print(f"h={h}: correct={bool((got == ref).all())}")
        timeit(bitrev_pallas, mat, label=f"pallas bitrev {h}")
        timeit(reverse_matrix_index_bits, mat, label=f"XLA bitrev {h}")
