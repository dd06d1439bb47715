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


_W_SHOUP = int(bb.np_shoup(np.array([W], dtype=np.uint32))[0])


def _wmul(x):
    """x * 11 mod P via the Shoup constant path (W is canonical, so this
    maps Monty to Monty) — cheaper than a full Montgomery multiply."""
    return bb.shoup_mul(x, np.uint32(W), np.uint32(_W_SHOUP))


def mul(a, b):
    """Product with X^4 = W reduction, two-level Karatsuba (OPT-0029
    addendum): 9 base muls + 2 Shoup W-muls instead of the schoolbook's
    16 + 3 — on a VPU where total op count binds, ~1.8x fewer ops per
    ext-ext multiply.  All intermediate sums canonicalize, so results are
    bit-identical to the schoolbook form (differential:
    tests/test_fields.py vs the scalar oracle ref_field.emul).

    Split A = AL + AH*Y, Y = X^2 (Y^2 = W); each half is linear in X.
    Linear products take 3 muls (Karatsuba); P1 = (AL+AH)(BL+BH)-P0-P2.
    A deg-2-in-X product p = p0 + p1*X + p2*X^2 re-embeds as the pair
    (p0 + W*p2... ) — X^2 folds into the Y coordinate."""
    m = bb.mul
    add = bb.add
    sub = bb.sub

    a0, a1, a2, a3 = (a[..., i] for i in range(4))
    b0, b1, b2, b3 = (b[..., i] for i in range(4))

    def lin_mul(u0, u1, v0, v1):
        """(u0 + u1 X)(v0 + v1 X) -> (m0, m1, m2) coeffs of 1, X, X^2."""
        p0 = m(u0, v0)
        p2 = m(u1, v1)
        p1 = sub(m(add(u0, u1), add(v0, v1)), add(p0, p2))
        return p0, p1, p2

    # P0 = AL*BL, P2 = AH*BH, P1 = (AL+AH)(BL+BH) - P0 - P2
    p00, p01, p02 = lin_mul(a0, a1, b0, b1)
    p20, p21, p22 = lin_mul(a2, a3, b2, b3)
    s0, s1 = add(a0, a2), add(a1, a3)
    t0, t1 = add(b0, b2), add(b1, b3)
    q0, q1, q2 = lin_mul(s0, s1, t0, t1)
    p10, p11, p12 = sub(q0, add(p00, p20)), sub(q1, add(p01, p21)), sub(
        q2, add(p02, p22)
    )
    # result = P0 + P1*Y + P2*Y^2, with X^2 = Y and Y^2 = W:
    #   c0 = p00 + W*(p12 + p20)        (Y from p02 handled below)
    #   c1 = p01 + W*p21
    #   c2 = p02 + p10 + W*p22
    #   c3 = p11
    c0 = add(p00, _wmul(add(p12, p20)))
    c1 = add(p01, _wmul(p21))
    c2 = add(add(p02, p10), _wmul(p22))
    c3 = p11
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


