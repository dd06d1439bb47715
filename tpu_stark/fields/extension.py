"""Quartic binomial extension BabyBear^4 = F_p[X] / (X^4 - 11).

TPU-native equivalent of ``p3_field::extension::BinomialExtensionField<BabyBear, 4>``,
the challenge field of the reference pipeline (``/root/reference/native/src/fib_air.rs:23``).
W = 11 is a quadratic non-residue mod p (11^((p-1)/2) = -1), so X^4 - 11 is
irreducible; this matches the upstream choice (SURVEY.md par2.2, p3-field row).

Representation: extension elements are uint32 Monty arrays with a **trailing axis
of length 4** (coefficients a0..a3, little-endian in X).  All ops are elementwise
jnp over that axis and vectorize over any leading shape — idiomatic for the VPU
(the 4-coefficient axis rides in-lane; no cross-lane traffic).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import babybear as bb

D = 4
W = 11  # X^4 = W
# Frobenius twist f = W^((p-1)/4); X^(p^j) = f^j X. f has order 4 (f^2 = -1).
FROB = pow(W, (bb.P - 1) // 4, bb.P)


def from_base(a):
    """Embed base-field array (...,) -> (..., 4)."""
    z = jnp.zeros(a.shape + (D - 1,), dtype=bb.u32)
    return jnp.concatenate([a[..., None], z], axis=-1)


def scalar(coeffs) -> jnp.ndarray:
    """Python ints (canonical) -> (4,) Monty device array."""
    c = [bb.host_to_monty(int(x) % bb.P) for x in coeffs]
    return jnp.asarray(np.array(c, dtype=np.uint32))


def zero(shape=()):
    return jnp.zeros(shape + (D,), dtype=bb.u32)


def one(shape=()):
    z = jnp.zeros(shape + (D,), dtype=bb.u32)
    return z.at[..., 0].set(np.uint32(bb.MONTY_R))


def add(a, b):
    return bb.add(a, b)


def sub(a, b):
    return bb.sub(a, b)


def neg(a):
    return bb.neg(a)


def scale(a, s):
    """Multiply ext (..., 4) by base (...,) or scalar."""
    if isinstance(s, (int, np.integer)):
        s = bb.monty_scalar(int(s))
    return bb.mul(a, jnp.asarray(s)[..., None])


def mul(a, b):
    """Schoolbook product with X^4 = W reduction (16 base muls, fused by XLA)."""
    a0, a1, a2, a3 = (a[..., i] for i in range(4))
    b0, b1, b2, b3 = (b[..., i] for i in range(4))
    m = bb.mul
    wc = bb.monty_scalar(W)

    def wmul(x):
        return m(x, wc)

    c0 = bb.add(m(a0, b0), wmul(bb.add(bb.add(m(a1, b3), m(a2, b2)), m(a3, b1))))
    c1 = bb.add(bb.add(m(a0, b1), m(a1, b0)), wmul(bb.add(m(a2, b3), m(a3, b2))))
    c2 = bb.add(bb.add(m(a0, b2), bb.add(m(a1, b1), m(a2, b0))), wmul(m(a3, b3)))
    c3 = bb.add(bb.add(m(a0, b3), m(a1, b2)), bb.add(m(a2, b1), m(a3, b0)))
    return jnp.stack([c0, c1, c2, c3], axis=-1)


def mul_base(a, b):
    """Ext (...,4) times base (...,): coefficientwise."""
    return bb.mul(a, b[..., None])


def frobenius(a, j: int = 1):
    """a -> a^(p^j): coefficient i picks up f^(i*j)."""
    twists = np.array(
        [bb.host_to_monty(pow(FROB, (i * j) % 4, bb.P)) for i in range(4)],
        dtype=np.uint32,
    )
    return bb.mul(a, jnp.asarray(twists))


def inv(a):
    """Inverse via norm: b = prod of the 3 conjugates; N = (a*b)[...,0] in F_p;
    a^-1 = b / N.  inv(0) = 0."""
    b = mul(frobenius(a, 1), mul(frobenius(a, 2), frobenius(a, 3)))
    norm = mul(a, b)[..., 0]
    return mul_base(b, bb.inv(norm))


import functools as _functools
import jax as _jax


@_functools.partial(_jax.jit, static_argnums=(1,))
def _powers_device_jit(z_dev: jnp.ndarray, n: int) -> jnp.ndarray:
    out = one((1,))
    step = z_dev
    while out.shape[0] < n:
        out = jnp.concatenate([out, mul(out, step[None, :])], axis=0)
        step = mul(step, step)  # z^L -> z^(2L)
    return out[:n]


def powers_device(z_canonical, n: int) -> jnp.ndarray:
    """Device array (n, 4) of [1, z, z^2, ...] in Monty form for an ext point
    given as canonical coefficient tuple — one jitted doubling chain (a single
    dispatch; the loop lives in-graph)."""
    z = scalar(tuple(int(c) % bb.P for c in z_canonical))
    return _powers_device_jit(z, n)


def pow_const(a, e: int):
    acc = None
    base = a
    while e:
        if e & 1:
            acc = base if acc is None else mul(acc, base)
        e >>= 1
        if e:
            base = mul(base, base)
    if acc is None:
        return one(a.shape[:-1])
    return acc


