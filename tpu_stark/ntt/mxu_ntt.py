"""MXU 4-step NTT — BabyBear DFT as bf16 limb matmuls on the systolic array.

OPT-0004 established that the radix-2 NTT on TPU is bound by u32 VPU multiply
throughput, not HBM.  The MXU does 128x128 bf16 matmuls at ~400 TFLOP/s; this
module moves the NTT's multiplies there:

* 4-step (Bailey) decomposition: H = A * B with x[a + A*b];
    y[c + B*d] = sum_a w_A^(ad) * w^(ac) * (sum_b x[a + A*b] * w_B^(bc))
  — two matrix DFTs (sizes A, B <= 256) along array axes plus one elementwise
  twiddle, batched over trace columns.
* Exact integer matmul: operands stay **Montgomery**; DFT matrices are stored
  as Monty residues split into four 8-bit limbs in bf16.  Each limb-pair
  product is a bf16 x bf16 -> f32 matmul whose 2^16-scale terms accumulate
  exactly (B * 255^2 < 2^24 for B <= 256).  Limb diagonals are cast to i32 and
  recombined into a 3-word (96-bit) integer, then reduced with one Montgomery
  REDC step + Solinas folds (p = 2^31 - 2^27 + 1 => 2^32 === 2^28 - 2) — the
  matrix carries one extra R factor so the REDC lands back in Monty form.
* Recursion on the A axis handles H > 2^16.

Everything is jnp (einsum + elementwise); XLA schedules MXU + VPU — no Pallas
needed for this one.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import babybear as bb
from ..matrix import log2_strict

MAX_DIRECT = 256  # largest direct DFT matmul (exactness: 256 * 255^2 < 2^24)

_P32 = np.uint32(bb.P)
_MU32 = np.uint32(bb.MU)
_MASK8 = np.uint32(0xFF)


# ---------------------------------------------------------------------------
# 3-word Montgomery reduction (the exactness-critical core)
# ---------------------------------------------------------------------------
def _reduce_3word_monty(w0, w1, w2):
    """(w0 + 2^32 w1 + 2^64 w2) * R^-1 mod p, reduced to [0, p).

    Requires total value < 2^64 * p (true for our < 2^74 accumulations).
    One REDC step (divides by 2^32 exactly), then Solinas folds of the high
    word (2^32 === 2^28 - 2 mod p), then conditional subtracts.
    """
    # REDC: t = w0 * MU mod 2^32; u = t * p; V - u is divisible by 2^32.
    t = bb._mul_lo32(w0, _MU32)
    u_hi, u_lo = bb._umul32_wide(t, _P32)  # u_lo == w0 by construction
    # (V - u) >> 32 as a 2-word value: subtract with borrow then shift.
    borrow = (w1 < u_hi).astype(jnp.uint32)
    v0 = w1 - u_hi
    v1 = w2 - borrow
    # V - u may be negative (V < u when V is small): detected by the wrapped
    # high word; correct by adding p * 2^32 (congruent mod p, restores >= 0).
    v1 = jnp.where(v1 >= np.uint32(1 << 31), v1 + _P32, v1)
    # Solinas folds: v0 + 2^32 v1 === v0 + (2^28 - 2) v1 (v1 < 2^31 shrinks
    # ~4 bits per fold)
    for _ in range(8):
        lo = v1 << np.uint32(28)
        hi = v1 >> np.uint32(4)
        two_v1 = v1 << np.uint32(1)
        # r = v0 + (lo + 2^32 hi) - 2*v1
        s0 = v0 + lo
        carry = (s0 < v0).astype(jnp.uint32)
        b0 = s0 - two_v1
        borrow2 = (s0 < two_v1).astype(jnp.uint32)
        v0 = b0
        v1 = hi + carry - borrow2
    # after 3 folds v1 is 0 or 1: final scalar fold with wrap correction
    fold_c = np.uint32((1 << 28) - 2)
    add = jnp.where(v1 != 0, fold_c, np.uint32(0))
    s = v0 + add
    wrapped = (s < v0) & (add != 0)
    v0 = jnp.where(wrapped, s + fold_c, s)
    # reduce v0 < 2^32 into [0, p) (2^32 < 2.14 p)
    v0 = jnp.where(v0 >= _P32, v0 - _P32, v0)
    v0 = jnp.where(v0 >= _P32, v0 - _P32, v0)
    return v0


# ---------------------------------------------------------------------------
# Limb-matmul modular contraction
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _dft_matrix_limbs(n: int, inverse: bool, extra_r: bool = True) -> np.ndarray:
    """(4, n, n) bf16 limb decomposition of the n-point DFT matrix
    W[b, c] = g_n^(bc), stored with an extra Montgomery R factor so that
    REDC(x_monty . W) stays in Monty form."""
    g = bb.two_adic_generator(log2_strict(n))
    if inverse:
        g = pow(g, bb.P - 2, bb.P)
    rows = np.arange(n, dtype=np.uint64)
    exps = (rows[:, None] * rows[None, :]) % (bb.P - 1)
    base = np.ones((n, n), dtype=np.uint64)
    cur = np.full((n, n), g, dtype=np.uint64)
    e = exps.copy()
    # vectorized modpow: square-and-multiply over the exponent bits
    max_bits = int(e.max()).bit_length()
    for _ in range(max_bits):
        base = np.where(e & 1 == 1, (base * cur) % bb.P, base)
        cur = (cur * cur) % bb.P
        e >>= 1
    w = base  # canonical
    if extra_r:
        w = (w << 32) % bb.P  # multiply by R
    w = w.astype(np.uint32)
    limbs = np.stack([(w >> (8 * i)) & 0xFF for i in range(4)], axis=0)
    return limbs.astype(np.float32).astype(jnp.bfloat16)


def _limb_dot_diagonals(xl: List[jnp.ndarray], w_limbs: jnp.ndarray):
    """16 limb matmuls -> 7 u32 diagonal sums (shared by XLA and Pallas paths).
    xl: 4 bf16 (b, m) arrays; w_limbs: (4, b, c) bf16."""
    diags: List = [None] * 7
    for i in range(4):
        for j in range(4):
            m = jax.lax.dot_general(
                w_limbs[j],
                xl[i],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (c, m)
            d = m.astype(jnp.int32).astype(jnp.uint32)
            s = i + j
            diags[s] = d if diags[s] is None else diags[s] + d
    return diags


def _accumulate_and_reduce(diags):
    """sum_s 2^(8s) diags[s] -> 3 u32 words -> Monty-reduced u32."""
    w0 = diags[0]
    w1 = jnp.zeros_like(w0)
    w2 = jnp.zeros_like(w0)
    for s in range(1, 7):
        d = diags[s]
        shift = 8 * s
        if shift < 32:
            lo = d << np.uint32(shift)
            hi = d >> np.uint32(32 - shift)
            nw0 = w0 + lo
            carry = (nw0 < w0).astype(jnp.uint32)
            w0 = nw0
            nw1 = w1 + hi + carry
            carry2 = (nw1 < w1).astype(jnp.uint32)
            w1 = nw1
            w2 = w2 + carry2
        else:
            sh = shift - 32
            lo = d << np.uint32(sh) if sh else d
            hi = d >> np.uint32(32 - sh) if sh else jnp.zeros_like(d)
            nw1 = w1 + lo
            carry = (nw1 < w1).astype(jnp.uint32)
            w1 = nw1
            w2 = w2 + hi + carry
    return _reduce_3word_monty(w0, w1, w2)


def _mm_kernel(x_ref, w_ref, o_ref):
    """Pallas: fused limb-matmul + recombination for one (n, TM) tile."""
    x = x_ref[...]  # (n, TM) u32 Monty
    # Mosaic has no u32->bf16 cast; hop through int32 -> f32 -> bf16.
    xl = [
        ((x >> np.uint32(8 * i)) & _MASK8)
        .astype(jnp.int32)
        .astype(jnp.float32)
        .astype(jnp.bfloat16)
        for i in range(4)
    ]
    diags = _limb_dot_diagonals(xl, w_ref[...])
    o_ref[...] = _accumulate_and_reduce(diags)


_PALLAS_TM = 512


def _mod_matmul_axis_pallas(
    x_monty: jnp.ndarray, w_limbs: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Pallas-fused version of _mod_matmul_axis: the 16 limb products stay in
    VMEM (OPT-0005's HBM-materialization fix)."""
    n = x_monty.shape[0]
    rest = x_monty.shape[1:]
    x2 = x_monty.reshape(n, -1)
    m = x2.shape[1]
    tm = min(_PALLAS_TM, m)
    if m % tm != 0:
        return _mod_matmul_axis(x_monty, w_limbs)  # unaligned: XLA path
    out = pl.pallas_call(
        _mm_kernel,
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec((n, tm), lambda mi: (0, mi), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (4, n, n), lambda mi: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((n, tm), lambda mi: (0, mi), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.uint32),
        interpret=interpret,
    )(x2, w_limbs)
    return out.reshape((n,) + rest)


def _mod_matmul_axis(x_monty: jnp.ndarray, w_limbs: jnp.ndarray) -> jnp.ndarray:
    """Contract axis 0 of x (n, ...) with the (4, n, n) limb matrix:
    out[c, ...] = sum_b x[b, ...] * W[b, c]  (Monty in, Monty out).  XLA path
    (limb products materialize; see _mod_matmul_axis_pallas for the fused one)."""
    n = x_monty.shape[0]
    rest = x_monty.shape[1:]
    x2 = x_monty.reshape(n, -1)
    xl = [
        ((x2 >> np.uint32(8 * i)) & _MASK8).astype(jnp.bfloat16) for i in range(4)
    ]
    out = _accumulate_and_reduce(_limb_dot_diagonals(xl, w_limbs))
    return out.reshape((n,) + rest)


# ---------------------------------------------------------------------------
# 4-step DFT along axis 0
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _twiddle_monty(a: int, b: int, inverse: bool) -> np.ndarray:
    """(A, B) Monty twiddles w^(a*c) for w = g_(A*B)."""
    g = bb.two_adic_generator(log2_strict(a * b))
    if inverse:
        g = pow(g, bb.P - 2, bb.P)
    # w^(ac): rows a in [A], cols c in [B]
    out = np.ones((a, b), dtype=np.uint64)
    base = np.ones(a, dtype=np.uint64)
    ga = bb.np_powers(g, a).astype(np.uint64)  # g^row
    for c in range(b):
        out[:, c] = base
        base = (base * ga) % bb.P
    return bb.np_to_monty(out.astype(np.uint32))


def _dft_axis0(x: jnp.ndarray, inverse: bool, use_pallas: bool = False,
               interpret: bool = False) -> jnp.ndarray:
    """DFT along axis 0 (length n power of two), natural order in/out,
    arbitrary trailing batch axes; Monty in/out."""
    n = x.shape[0]
    log_n = log2_strict(n)
    mm = (
        functools.partial(_mod_matmul_axis_pallas, interpret=interpret)
        if use_pallas
        else _mod_matmul_axis
    )
    if n <= MAX_DIRECT:
        return mm(x, jnp.asarray(_dft_matrix_limbs(n, inverse)))
    log_b = min(log_n // 2, 8)
    B = 1 << log_b
    A = n // B
    rest = x.shape[1:]
    # x[a + A*b] -> X[b, a, ...]; inner DFT over b for each a
    xv = x.reshape(B, A, *rest)
    t1 = mm(xv, jnp.asarray(_dft_matrix_limbs(B, inverse)))
    # t1[c, a, ...] ; twiddle w^(a*c)
    tw = jnp.asarray(_twiddle_monty(A, B, inverse))  # (A, B)
    t2 = bb.mul(t1, tw.T.reshape(B, A, *([1] * len(rest))))
    # outer DFT over a (recursive): axis 1 -> move to front
    t2 = jnp.moveaxis(t2, 1, 0)  # (A, B, ...)
    t3 = _dft_axis0(t2, inverse, use_pallas, interpret)  # DFT along a -> d
    # y[c + B*d] = t3[d, c, ...]: flatten (A=d, B=c) row-major gives d*B + c
    return t3.reshape((n,) + rest)


@functools.partial(
    jax.jit, static_argnames=("inverse", "use_pallas", "interpret")
)
def _dft_jit(mat, *, inverse: bool, use_pallas: bool, interpret: bool):
    """One jitted program per (shape, direction) — the OPT-0011-addendum
    regression was this path dispatching EAGERLY: every call re-uploaded the
    limb/twiddle tables over the tunnel (16 MB at 2^22) and paid a ~30 ms
    round trip per op.  Under jit the tables are compile-time constants
    resident with the executable and the whole 4-step chain is one dispatch,
    like the VPU paths (_dit_core/_four_step_core)."""
    out = _dft_axis0(mat, inverse, use_pallas, interpret)
    if inverse:
        h = mat.shape[0]
        out = bb.mul(out, bb.monty_scalar(pow(h, bb.P - 2, bb.P)))
    return out


def dft_batch(mat: jnp.ndarray, use_pallas: bool = False,
              interpret: bool = False) -> jnp.ndarray:
    """(H, W) Monty batched NTT, natural order — MXU path."""
    return _dft_jit(mat, inverse=False, use_pallas=use_pallas,
                    interpret=interpret)


def idft_batch(mat: jnp.ndarray, use_pallas: bool = False,
               interpret: bool = False) -> jnp.ndarray:
    return _dft_jit(mat, inverse=True, use_pallas=use_pallas,
                    interpret=interpret)


def supports(h: int, w: int) -> bool:
    return h >= 2 and h <= (1 << bb.TWO_ADICITY)
