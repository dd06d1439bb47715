"""BabyBear prime field (p = 2^31 - 2^27 + 1) as vectorized uint32 Montgomery lanes.

This is the TPU-native equivalent of the reference's field layer:

* the Rust side uses ``p3-baby-bear`` / ``p3-monty-31`` (32-bit Montgomery form,
  consumed at ``/root/reference/native/src/fib_air.rs:9-10`` and
  ``backend_vulkan.rs:977-996``);
* the reference WGSL shader does the same Montgomery arithmetic with native u64
  (``/root/reference/native/shaders/fft_stage.wgsl:36-70``, constants PRIME =
  0x78000001, MU = 0x88000001 at ``backend_vulkan.rs:883-885``).

TPUs have no 64-bit integer multiply on the VPU, so the 32x32->64 product is
decomposed into 16-bit limb products recombined in uint32 (SURVEY.md par7.2 "hard
parts" #1).  Everything here is pure ``jax.numpy`` on uint32 arrays and fuses
under jit; the Pallas NTT kernel re-uses the same formulas.

Conventions
-----------
* Device arrays hold field elements in **Montgomery form** (``x * 2^32 mod p``),
  dtype uint32, always reduced to ``[0, p)`` — mirroring p3's `MontyField31`.
* ``to_u32`` / ``from_u32`` convert to/from the canonical residue
  (= p3 ``to_unique_u32`` / ``new``, used at ``backend_vulkan.rs:2005,2023``).
* Host-side exact helpers use numpy uint64 (products of 31-bit values fit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Constants (verified: P * MU == 1 mod 2^32; 31 generates the full group).
# ---------------------------------------------------------------------------
P = 0x78000001  # 2^31 - 2^27 + 1
MU = 0x88000001  # P^{-1} mod 2^32  (p3 MONTY_MU; fft_stage.wgsl:38)
TWO_ADICITY = 27  # p - 1 = 2^27 * 15
GENERATOR = 31  # multiplicative generator of F_p^*
MONTY_R = (1 << 32) % P  # Montgomery form of 1  = 0x0ffffffe
MONTY_R2 = (1 << 64) % P  # for canonical -> Monty conversion
# Root of the 2^27 subgroup = 31 ** 15 mod p = 0x1a427a41 (same value as
# Plonky3's two_adic_generator(27); derived, not copied).
ROOT_27 = pow(GENERATOR, (P - 1) >> TWO_ADICITY, P)

_P32 = np.uint32(P)
_MU32 = np.uint32(MU)
_MASK16 = np.uint32(0xFFFF)

u32 = jnp.uint32


# ---------------------------------------------------------------------------
# Host (python int / numpy) helpers — exact, used for twiddle precompute and
# as the differential-test oracle.
# ---------------------------------------------------------------------------
def host_to_monty(x: int) -> int:
    return (x << 32) % P


def host_from_monty(x: int) -> int:
    return (x * pow(1 << 32, P - 2, P)) % P


def host_monty_mul(a: int, b: int) -> int:
    """REDC on python ints: inputs/outputs in Monty form, [0, p)."""
    x = a * b
    t = (x * MU) & 0xFFFFFFFF
    u = t * P
    r = (x - u) >> 32
    return r + P if r < 0 else r


def np_powers(base_canonical: int, n: int) -> np.ndarray:
    """[1, w, w^2, ..., w^(n-1)] canonical form, uint32, via doubling (O(log n) vector steps)."""
    out = np.array([1], dtype=np.uint64)
    w = base_canonical % P
    while len(out) < n:
        step = pow(w, len(out), P)
        out = np.concatenate([out, (out * step) % P])
    return out[:n].astype(np.uint32)


def np_to_monty(x: np.ndarray) -> np.ndarray:
    return ((x.astype(np.uint64) << 32) % P).astype(np.uint32)


def np_from_monty(x: np.ndarray) -> np.ndarray:
    inv_r = pow(1 << 32, P - 2, P)
    return ((x.astype(np.uint64) * inv_r) % P).astype(np.uint32)


def two_adic_generator(bits: int) -> int:
    """Canonical generator of the order-2^bits subgroup (p3 semantics:
    successive squares of the 2^27 root; fib_air ref backend_vulkan.rs:977-996)."""
    assert 0 <= bits <= TWO_ADICITY
    return pow(ROOT_27, 1 << (TWO_ADICITY - bits), P)


# ---------------------------------------------------------------------------
# Device (jnp uint32) kernels.
# ---------------------------------------------------------------------------
def _umul32_wide(a, b):
    """Full 32x32 -> (hi, lo) product via 16-bit limbs (TPU has no u64 mul)."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    # mid = lh + hl + (ll >> 16); lh + (ll>>16) cannot overflow u32.
    mid = lh + (ll >> 16)
    mid2 = mid + hl
    carry = (mid2 < mid).astype(u32)  # wrapped iff result < addend
    lo = (ll & _MASK16) | (mid2 << 16)
    hi = hh + (mid2 >> 16) + (carry << 16)
    return hi, lo


def _mul_lo32(a, b):
    """Low 32 bits of a*b (3 limb products)."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    return a0 * b0 + ((a0 * b1 + a1 * b0) << 16)


def _check_u32(*xs):
    # Trace-time contract check (free at runtime): Monty lanes must be uint32;
    # signed dtypes would corrupt the limb shifts silently.
    for x in xs:
        if hasattr(x, "dtype") and x.dtype != jnp.uint32:
            raise TypeError(f"BabyBear ops require uint32 Monty lanes, got {x.dtype}")


def add(a, b):
    _check_u32(a, b)
    s = a + b  # < 2^32 since both < p < 2^31
    return jnp.where(s >= _P32, s - _P32, s)


def sub(a, b):
    d = a - b
    return jnp.where(a < b, d + _P32, d)


def neg(a):
    return jnp.where(a == 0, a, _P32 - a)


def mul(a, b):
    """Montgomery product of Monty-form operands; result reduced to [0, p).

    The REDC multiplies exploit the prime's structure (OPT-0029): both
    MU = 2^31 + 2^27 + 1 and P = 2^31 - 2^27 + 1 turn their 32x32 products
    into shift-adds, cutting the op count vs the generic limb path (the
    reference shader pays neither cost — it has native u64,
    fft_stage.wgsl:55-70)."""
    _check_u32(a, b)
    hi, lo = _umul32_wide(a, b)
    # t = lo * MU mod 2^32  (MU = 2^31 + 2^27 + 1)
    t = lo + (lo << 27) + (lo << 31)
    # u_hi = hi32(t * P), P = 2^31 - 2^27 + 1:  t*P = (t<<31)_64 + t - (t<<27)_64
    # (lo32(t*P) == lo by the REDC identity, so only the carry/borrow of the
    # low half is needed, not its value)
    l31 = t << 31
    l27 = t << 27
    low1 = l31 + t
    carry = (low1 < t).astype(u32)
    u_hi = (t >> 1) + carry - (t >> 5) - (low1 < l27).astype(u32)
    r = hi - u_hi
    return jnp.where(hi < u_hi, r + _P32, r)


def np_shoup(w_canonical: np.ndarray) -> np.ndarray:
    """Shoup precomputation floor(w * 2^32 / P) for canonical constants w < P."""
    return ((w_canonical.astype(np.uint64) << 32) // P).astype(np.uint32)


def shoup_mul(x, w, w_pr):
    """x * w mod P for a CONSTANT w < P with precomputed
    w_pr = floor(w * 2^32 / P) (Harvey/Shoup) — the butterfly-twiddle fast
    path (OPT-0029): 7 limb muls + ~18 alu vs ``mul``'s 4 muls + ~29 alu,
    and on a VPU where u32 mul issues like an add, total op count is what
    binds.

    Representation-agnostic: with x in Montgomery form and w CANONICAL, the
    result (x*R)*w = (x*w)*R stays in Montgomery form — twiddle tables for
    this path are stored canonical, not Monty.

    Correctness: q = floor(x*w_pr / 2^32) gives r = x*w - q*P in [0, 2P) for
    ANY x < 2^32 (error bound P*x/2^32 + P <= 2P; 2P = 0xF0000002 < 2^32),
    so one conditional subtract canonicalizes."""
    _check_u32(x)
    q = _umul32_wide(x, w_pr)[0]  # hi32(x * w_pr)
    # r = lo32(x*w) - lo32(q*P) mod 2^32;  lo32(q*P) = q + (q<<31) - (q<<27)
    r = _mul_lo32(x, w) - (q + (q << 31) - (q << 27))
    return jnp.where(r >= _P32, r - _P32, r)


def from_u32(x):
    """Canonical residue -> Monty form (multiply by R^2 then REDC)."""
    return mul(x, jnp.asarray(np.uint32(MONTY_R2)))


def to_u32(x):
    """Monty form -> canonical residue (REDC of the bare value)."""
    # t = x * MU mod 2^32; u_hi = hi32(t * P) — shift-add forms as in mul()
    t = x + (x << 27) + (x << 31)
    l31 = t << 31
    l27 = t << 27
    low1 = l31 + t
    carry = (low1 < t).astype(u32)
    u_hi = (t >> 1) + carry - (t >> 5) - (low1 < l27).astype(u32)
    # hi part of input is 0: r = 0 - u_hi
    r = jnp.asarray(np.uint32(0)) - u_hi
    return jnp.where(u_hi > 0, r + _P32, r)


def pow_const(a, e: int):
    """a^e for a static non-negative integer exponent (square-and-multiply)."""
    acc = None
    base = a
    while e:
        if e & 1:
            acc = base if acc is None else mul(acc, base)
        e >>= 1
        if e:
            base = mul(base, base)
    if acc is None:
        return jnp.full_like(a, np.uint32(MONTY_R))
    return acc


def inv(a):
    """Field inverse via Fermat (a^(p-2)); inv(0) = 0."""
    return pow_const(a, P - 2)


def monty_ones(shape):
    return jnp.full(shape, np.uint32(MONTY_R), dtype=u32)


def monty_scalar(x: int):
    """Python int -> 0-d Monty uint32 device scalar."""
    return jnp.asarray(np.uint32(host_to_monty(x % P)))


@functools.lru_cache(maxsize=None)
def _cached_powers_monty(base_canonical: int, n: int) -> np.ndarray:
    return np_to_monty(np_powers(base_canonical, n))


def _default_device_key() -> str:
    """Cache key for the CURRENT default device: the FRI host tail runs under
    ``jax.default_device(cpu)`` and must not receive accelerator-committed
    buffers (and vice versa)."""
    import jax

    d = jax.config.jax_default_device
    return str(d) if d is not None else "default"


@functools.lru_cache(maxsize=None)
def _powers_monty_dev(base_canonical: int, n: int, _devkey: str) -> jnp.ndarray:
    import jax

    return jax.device_put(_cached_powers_monty(base_canonical, n))


def _tracing() -> bool:
    """True while inside a jit trace — device-buffer caches must NOT be
    consulted or populated there (a traced device_put yields a tracer, and a
    cached tracer poisons every later call: UnexpectedTracerError)."""
    try:
        from jax._src import core as _jcore

        return not _jcore.trace_state_clean()
    except Exception:  # noqa: BLE001 — API moved: fall back to constants
        return True


def powers_monty(base_canonical: int, n: int) -> jnp.ndarray:
    """Device array [1, w, ..., w^(n-1)] in Monty form, host-precomputed and
    cached AS A DEVICE BUFFER per (base, n, default device) — the analog of
    the reference's per-log_n twiddle cache (backend_vulkan.rs:977-996).
    The device cache matters on the axon tunnel: a fresh ``jnp.asarray`` per
    call re-uploads the table every time (134 MB per 2^25 NTT call).
    Inside a jit trace this returns a plain np-backed constant instead (the
    jit embeds it; see _tracing)."""
    if _tracing():
        return jnp.asarray(_cached_powers_monty(base_canonical % P, n))
    return _powers_monty_dev(base_canonical % P, n, _default_device_key())


def pow_exponents(base_canonical: int, e: jnp.ndarray, max_bits: int) -> jnp.ndarray:
    """base^e in Monty form for a traced uint32 exponent array — computed
    IN-GRAPH by square-and-multiply over ``max_bits`` exponent bits, with
    only scalar w^(2^k) constants.  Use for large power tables inside jits:
    a host-precomputed table either constant-folds for minutes (embedded
    literal) or pays a 100+ MB tunnel transfer per device_put at 2^24+."""
    acc = monty_ones(e.shape)
    b = base_canonical % P
    for k in range(max_bits):
        wk = monty_scalar(pow(b, 1 << k, P))
        acc = jnp.where((e >> np.uint32(k)) & np.uint32(1) == 1, mul(acc, wk), acc)
    return acc


def powers_traced(s, n: int) -> jnp.ndarray:
    """[1, s, s^2, ..., s^(n-1)] (Monty) of a TRACED Monty scalar ``s`` —
    in-graph square-and-multiply over log2(n) masked vector multiplies (the
    traced-base twin of ``pow_exponents``: coset shifts that are DATA, like
    the streamed quotient's per-(sub-coset, row-block) shifts, must not bake
    into the compiled program or every shift recompiles it)."""
    e = jnp.arange(n, dtype=u32)
    acc = monty_ones((n,))
    sq = s
    k = 0
    while (1 << k) < n:
        acc = jnp.where((e >> np.uint32(k)) & np.uint32(1) == 1, mul(acc, sq), acc)
        sq = mul(sq, sq)
        k += 1
    return acc


def sum_mod(arr, axis: int = 0):
    """Modular sum along an axis via log-depth pairwise ``add`` folding
    (uint32 lanes cannot accumulate raw sums without overflow)."""
    arr = jnp.moveaxis(arr, axis, 0)
    n = arr.shape[0]
    while n > 1:
        if n % 2 == 1:
            arr = jnp.concatenate(
                [arr, jnp.zeros((1,) + arr.shape[1:], dtype=u32)], axis=0
            )
            n += 1
        arr = add(arr[0::2], arr[1::2])
        n //= 2
    return arr[0]
