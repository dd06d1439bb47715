"""Batched radix-2 DIT NTT over BabyBear — the XLA compute path.

This is the central kernel of the framework, the TPU-native rebuild of the
reference's Vulkan NTT (per-stage butterflies over an h x w column batch,
``/root/reference/native/shaders/fft_stage.wgsl:75-136``, host orchestration
``backend_vulkan.rs:1028-1426``) and of the CPU ``Radix2DitParallel`` it falls
back to (``gpu_dft.rs:94-115``).

Differences from the reference, by design (SURVEY.md par2.3, par5.7):

* The stage loop is **traced once and compiled** — all stages, the bit
  reversal, and the twiddle multiplies fuse into one XLA program; there is no
  per-stage dispatch, no pipeline barrier, no host<->device staging copy. The
  reference's "single fence per DFT" lesson becomes "never leave the jitted
  graph".
* Bit-reversal is a reshape/transpose (layout move), not a host-side scatter
  into a staging buffer (backend_vulkan.rs:998-1026).
* Twiddles are host-precomputed once per log_n and cached as device constants
  (the analog of the per-log_n twiddle cache, backend_vulkan.rs:977-996);
  stage s uses w_{2m}^j for m = 2^s, j < m, the same geometry as the WGSL
  shader (fft_stage.wgsl:90-136).

Layout: (h, w) uint32 Monty arrays, rows = domain points (natural order in and
out), columns = independent polynomials.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import babybear as bb
from ..matrix import log2_strict, reverse_matrix_index_bits


@functools.lru_cache(maxsize=None)
def _stage_twiddles_np(log_h: int, inverse: bool) -> tuple[np.ndarray, ...]:
    """Shoup twiddle table per stage: stage s (s=0..log_h-1) holds a (2, m)
    array [[w_{2m}^0 .. w_{2m}^{m-1}], [shoup precomputes]], m = 2^s, where
    w_{2m} = two_adic_generator(s+1) (or its inverse for the iNTT).

    Twiddles are CANONICAL (not Monty) + their Shoup companions
    floor(w*2^32/P): ``bb.shoup_mul`` keeps Monty data in Monty form while
    multiplying by canonical constants, at ~60% of ``bb.mul``'s op count
    (OPT-0029)."""
    out = []
    for s in range(log_h):
        root = bb.two_adic_generator(s + 1)
        if inverse:
            root = pow(root, bb.P - 2, bb.P)
        w = bb.np_powers(root, 1 << s)
        out.append(np.stack([w, bb.np_shoup(w)]))
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _stage_twiddles_dev(log_h: int, inverse: bool, _devkey: str):
    return tuple(jax.device_put(t) for t in _stage_twiddles_np(log_h, inverse))


def _stage_twiddles(log_h: int, inverse: bool) -> tuple[jnp.ndarray, ...]:
    """Device-RESIDENT stage tables, cached per (log_h, inverse, default
    device): a fresh ``jnp.asarray`` per call re-uploads sum(2^s) = 2^log_h
    words over the tunnel on every dft_batch (134 MB per 2^25 call).  Inside
    a jit trace (e.g. the four-step core's sub-transforms, whose tables are
    tiny) this returns plain constants — a cached traced device_put would
    poison the cache with escaped tracers (see bb._tracing)."""
    if bb._tracing():
        return tuple(jnp.asarray(t) for t in _stage_twiddles_np(log_h, inverse))
    return _stage_twiddles_dev(log_h, inverse, bb._default_device_key())


@functools.partial(jax.jit, static_argnums=(0,))
def _dit_core(log_h: int, x: jnp.ndarray, *twiddles: jnp.ndarray) -> jnp.ndarray:
    """Bit-reverse rows, then the butterfly stages, PAIR-FUSED: consecutive
    radix-2 stages (s, s+1) execute as one radix-4 pass over the array.

    The audited op counts say the stage loop uses <17% of the ALU roof — the
    binding cost is the per-stage memory pass (reshape/stack relayout +
    HBM round trip), which the audit's mul/alu counters don't see.  Fusing
    stage pairs halves the passes at identical arithmetic: the radix-4 block
    [x0, x1, x2, x3] (stride m) performs EXACTLY the two radix-2 butterfly
    levels' operations (same multiplies, same adds, same order), so results
    are bit-identical to the unfused loop and proof bytes are unchanged
    (differential: tests/test_ntt.py vs the O(n^2) oracle).

    Static unrolled loop — XLA sees straight-line code with static shapes
    (SURVEY.md par7.2 jit-cache per (log_n, width) plan)."""
    h, w = x.shape
    x = reverse_matrix_index_bits(x)
    s = 0
    # Default radix-4 (round 5): with the dispatch-floor artifact removed
    # (OPT-0031) the r4 "radix-4 is neutral" A/B inverted — pair fusion is
    # +9% at 65536x128 (8,962 vs 8,236 Melems/s) and equal at 16384x128
    # (where the whole transform runs VMEM-resident anyway).  Identical
    # arithmetic in identical order => bit-identical outputs (differential:
    # tests/test_ntt.py).  TPU_STARK_NTT_RADIX4=0 restores the plain loop.
    if os.environ.get("TPU_STARK_NTT_RADIX4", "1") in ("0", "off"):
        s = log_h  # A/B: plain radix-2 loop below handles every stage
        for s2 in range(log_h):
            m = 1 << s2
            y = x.reshape(h // (2 * m), 2, m, w)
            lo = y[:, 0]
            if s2 == 0:  # stage-0 twiddle is [1]: skip the multiply pass
                hi = y[:, 1]
            else:
                tw = twiddles[s2]
                hi = bb.shoup_mul(
                    y[:, 1], tw[0][None, :, None], tw[1][None, :, None]
                )
            x = jnp.stack([bb.add(lo, hi), bb.sub(lo, hi)], axis=1).reshape(h, w)
        return x
    while s + 1 < log_h:
        m = 1 << s
        t1 = twiddles[s]  # (2, m)
        t2 = twiddles[s + 1]  # (2, 2m)
        y = x.reshape(h // (4 * m), 4, m, w)
        x0, x1, x2, x3 = y[:, 0], y[:, 1], y[:, 2], y[:, 3]
        if s == 0:  # stage-0 twiddle is [1]: multiply by one is the identity
            u1, u3 = x1, x3
        else:
            u1 = bb.shoup_mul(x1, t1[0][None, :, None], t1[1][None, :, None])
            u3 = bb.shoup_mul(x3, t1[0][None, :, None], t1[1][None, :, None])
        y0 = bb.add(x0, u1)
        y1 = bb.sub(x0, u1)
        y2 = bb.add(x2, u3)
        y3 = bb.sub(x2, u3)
        # stage s+1: pairs at distance 2m; position j uses t2[j], j+m t2[j+m]
        v2 = bb.shoup_mul(y2, t2[0][None, :m, None], t2[1][None, :m, None])
        v3 = bb.shoup_mul(y3, t2[0][None, m:, None], t2[1][None, m:, None])
        z0 = bb.add(y0, v2)
        z2 = bb.sub(y0, v2)
        z1 = bb.add(y1, v3)
        z3 = bb.sub(y1, v3)
        x = jnp.stack([z0, z1, z2, z3], axis=1).reshape(h, w)
        s += 2
    if s < log_h:  # odd log_h: one trailing radix-2 stage
        m = 1 << s
        tw = twiddles[s]
        y = x.reshape(h // (2 * m), 2, m, w)
        lo = y[:, 0]
        hi = bb.shoup_mul(y[:, 1], tw[0][None, :, None], tw[1][None, :, None])
        x = jnp.stack([bb.add(lo, hi), bb.sub(lo, hi)], axis=1).reshape(h, w)
    return x


def _narrow_gates() -> tuple:
    """(max_w, min_logh) for the four-step reroute, from the device policy
    (backend/policy.py — the reference's hard-coded fused-stage gates turned
    device-adaptive per SURVEY.md par5.6)."""
    from ..backend.policy import current_policy

    p = current_policy()
    return p.ntt_narrow_max_w, p.ntt_narrow_min_logh


@functools.lru_cache(maxsize=None)
def _four_step_twiddle_np(log_h: int, inverse: bool) -> np.ndarray:
    """(N1, N2) Monty table T[k1, j2] = w_N^(k1*j2), N1 = 2^ceil(log_h/2)."""
    l1 = (log_h + 1) // 2
    l2 = log_h - l1
    root = bb.two_adic_generator(log_h)
    if inverse:
        root = pow(root, bb.P - 2, bb.P)
    pows = bb.np_powers(root, 1 << log_h).astype(np.uint32)  # w_N^t, t < N
    k1 = np.arange(1 << l1, dtype=np.int64)[:, None]
    j2 = np.arange(1 << l2, dtype=np.int64)[None, :]
    idx = (k1 * j2) & ((1 << log_h) - 1)  # k1*j2 mod N (w_N has order N)
    return bb.np_to_monty(pows[idx])


@functools.partial(jax.jit, static_argnums=(0, 1))
def _four_step_core(log_h: int, inverse: bool, x: jnp.ndarray) -> jnp.ndarray:
    """Four-step DFT for tall-narrow batches, pure VPU (OPT-0016).

    The radix-2 stage loop on a (2^22, 2)-shaped batch leaves the VPU's
    128-lane minor axis ~empty (OPT-0011).  Splitting N = N1*N2 turns one
    narrow length-N transform into two *wide* sub-transforms (width N2*w and
    N1*w) joined by an elementwise twiddle and a transpose — the same
    hierarchical decomposition the reference's survey prescribes once a
    column exceeds on-chip memory (docs/mobile_gpu_zk_survey.md:349-360),
    here driven by lane utilization instead of memory.  Unlike the MXU
    variant (mxu_ntt.py, OPT-0011 addendum: end-to-end regression from
    per-call limb-constant setup), both sub-transforms reuse _dit_core
    unchanged, so single-call overhead is just two layout moves.

    Derivation (j = j1*N2 + j2, k = k2*N1 + k1):
      X[k2*N1+k1] = sum_j2 [ (sum_j1 x[j1*N2+j2] w_N1^(j1*k1)) * w_N^(j2*k1) ]
                    * w_N2^(j2*k2)
    """
    h, w = x.shape
    l1 = (log_h + 1) // 2
    l2 = log_h - l1
    n1, n2 = 1 << l1, 1 << l2
    a = x.reshape(n1, n2 * w)
    b = _dit_core(l1, a, *_stage_twiddles(l1, inverse))  # B[k1, (j2, c)]
    # join twiddle w_N^(k1*j2), built IN-GRAPH by square-and-multiply: a
    # host-precomputed table either constant-folds for minutes as an embedded
    # literal or pays a 100+ MB tunnel transfer (measured both at 2^24)
    root = bb.two_adic_generator(log_h)
    if inverse:
        root = pow(root, bb.P - 2, bb.P)
    e = (
        jnp.arange(n1, dtype=bb.u32)[:, None] * jnp.arange(n2, dtype=bb.u32)
    ) & np.uint32((1 << log_h) - 1)
    t = bb.pow_exponents(root, e, log_h)
    b = bb.mul(b.reshape(n1, n2, w), t[:, :, None])
    c = b.transpose(1, 0, 2).reshape(n2, n1 * w)
    d = _dit_core(l2, c, *_stage_twiddles(l2, inverse))  # D[k2, (k1, c)]
    return d.reshape(h, w)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _four_step_core_T(log_h: int, inverse: bool, xt: jnp.ndarray) -> jnp.ndarray:
    """`_four_step_core` with TRANSPOSED (w, h) jit boundaries.

    The 2026-08-22 tunnel-service compiler window materializes any
    `(h, w<lanes)` narrow array touched by a row-splitting reshape as a
    tile-padded `{1,0:T(8,128)}` copy — 64x the logical bytes, i.e. 32 GiB
    for u32[2^26, 2], which either fails memory assignment (16 GiB HBM) or
    crashes the compile helper.  Measured ladder: (2^24, 2) compiles,
    (2^25, 2)+ does not — which r4 code also hits, so this is a service
    regression, not ours (probe: `_r5_logs/narrow_layout_probe.md`).  With
    (w, h) boundaries every internal shape is wide and the program compiles
    and runs at 2^26 in ~0.2 s warm.  Callers eagerly transpose around this
    core (standalone (h,w)<->(w,h) transposes stay compact: measured 0.4 s
    at 2^26); the two extra HBM passes are ~2 ms against the >100 ms
    transform."""
    w, h = xt.shape
    l1 = (log_h + 1) // 2
    l2 = log_h - l1
    n1, n2 = 1 << l1, 1 << l2
    a = xt.reshape(w, n1, n2).transpose(1, 2, 0).reshape(n1, n2 * w)
    b = _dit_core(l1, a, *_stage_twiddles(l1, inverse))
    root = bb.two_adic_generator(log_h)
    if inverse:
        root = pow(root, bb.P - 2, bb.P)
    e = (
        jnp.arange(n1, dtype=bb.u32)[:, None] * jnp.arange(n2, dtype=bb.u32)
    ) & np.uint32((1 << log_h) - 1)
    t = bb.pow_exponents(root, e, log_h)
    b = bb.mul(b.reshape(n1, n2, w), t[:, :, None])
    c = b.transpose(1, 0, 2).reshape(n2, n1 * w)
    d = _dit_core(l2, c, *_stage_twiddles(l2, inverse))
    # out[k2*n1 + k1] row order == d's (n2, n1) row blocks; transpose back to
    # (w, h) so the boundary stays wide
    return d.reshape(n2, n1, w).transpose(2, 0, 1).reshape(w, h)


_transpose_dev = jax.jit(lambda a: a.T)


def _t_reroute_log() -> int:
    """Min log_h at which the narrow four-step detours through the (w, h)
    transposed core (see `_four_step_core_T`).  The padded internal copy
    costs h*128*4 bytes REGARDLESS of w (<128 lanes pad to 128), so the
    gate keys on h alone: (2^25, 2) fails compile outright, and a
    (2^24, 8) quotient-commit idft runtime-OOMed the 2^24 prove (8 GiB
    copy on top of ~4 GB of live arrays).  Default 22 keeps the copy
    risk <= 2 GiB; below that the two extra ~25 ms transpose dispatches
    would be a larger fraction of the transform.  TPU_STARK_NTT_TROUTE
    overrides (99 disables)."""
    return int(os.environ.get("TPU_STARK_NTT_TROUTE") or "22")


def _four_step(log_h: int, inverse: bool, mat: jnp.ndarray) -> jnp.ndarray:
    if log_h >= _t_reroute_log() and not isinstance(
        mat, jax.core.Tracer
    ):  # traced callers keep one fused program; eager big-narrow detours
        out_t = _four_step_core_T(log_h, inverse, _transpose_dev(mat))
        return _transpose_dev(out_t)
    return _four_step_core(log_h, inverse, mat)


def _narrow_mode(h: int, w: int) -> str | None:
    """Dispatch policy for tall-narrow inputs on accelerators.

    "vpu4" (default): the pure-VPU four-step above.  "mxu"/"1": the
    bf16-limb MXU path (mxu_ntt.py) — faster in chained micro-benchmarks but
    an end-to-end regression (OPT-0011 addendum), kept opt-in for study.
    "0"/"off": plain stage loop."""
    env = os.environ.get("TPU_STARK_NTT_NARROW", "vpu4")
    if env in ("0", "false", "off"):
        return None
    max_w, min_logh = _narrow_gates()
    if w > max_w or h < (1 << min_logh):
        return None
    import jax

    if jax.default_backend() == "cpu":
        return None
    return "mxu" if env in ("1", "mxu") else "vpu4"


def dft_batch(mat: jnp.ndarray) -> jnp.ndarray:
    """NTT of each column: out[i] = sum_j mat[j] * g^(i*j), g = generator of
    the order-h subgroup; natural-order rows in and out (p3 Radix2Dit
    semantics, consumed via gpu_dft.rs:94-115)."""
    log_h = log2_strict(mat.shape[0])
    if log_h == 0:
        return mat
    mode = _narrow_mode(mat.shape[0], mat.shape[1])
    if mode == "mxu":
        from . import mxu_ntt

        return mxu_ntt.dft_batch(mat, use_pallas=True)
    if mode == "vpu4":
        return _four_step(log_h, False, mat)
    return _dit_core(log_h, mat, *_stage_twiddles(log_h, False))


def idft_batch(mat: jnp.ndarray) -> jnp.ndarray:
    """Inverse NTT: forward with g^-1 twiddles, scaled by h^-1."""
    h = mat.shape[0]
    log_h = log2_strict(h)
    if log_h == 0:
        return mat
    mode = _narrow_mode(h, mat.shape[1])
    if mode == "mxu":
        from . import mxu_ntt

        return mxu_ntt.idft_batch(mat, use_pallas=True)
    if mode == "vpu4":
        out = _four_step(log_h, True, mat)
    else:
        out = _dit_core(log_h, mat, *_stage_twiddles(log_h, True))
    h_inv = bb.monty_scalar(pow(h, bb.P - 2, bb.P))
    return bb.mul(out, h_inv)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _coset_scale(coeffs: jnp.ndarray, shift: int, h: int) -> jnp.ndarray:
    """coeffs[i] *= shift^i — turns the subgroup DFT into a coset DFT.  The
    power vector is built in-graph (see bb.pow_exponents): embedded 2^24+
    literals constant-fold for minutes, device_put tables pay the tunnel."""
    e = jnp.arange(h, dtype=bb.u32)
    pows = bb.pow_exponents(shift, e, max(1, h.bit_length() - 1))
    return bb.mul(coeffs, pows[:, None])


def coset_dft_batch(mat: jnp.ndarray, shift: int) -> jnp.ndarray:
    return dft_batch(_coset_scale(mat, shift, mat.shape[0]))


def coset_idft_batch(mat: jnp.ndarray, shift: int) -> jnp.ndarray:
    inv_shift = pow(shift, bb.P - 2, bb.P)
    return _coset_scale(idft_batch(mat), inv_shift, mat.shape[0])


def coset_lde_batch(mat: jnp.ndarray, added_bits: int, shift: int = 1) -> jnp.ndarray:
    """Low-degree extend each column onto the coset shift*<g'> of size
    h << added_bits: iNTT -> coset scale -> zero-pad -> NTT.  This is the
    p3-dft trait-default derivation the whole prover rides on (every LDE in
    prove() funnels here; SURVEY.md par3.1 'every LDE: pcs -> dft.coset_lde_batch')."""
    h, w = mat.shape
    coeffs = idft_batch(mat)
    padded = jnp.zeros((h << added_bits, w), dtype=bb.u32).at[:h].set(coeffs)
    return coset_dft_batch(padded, shift)


def lde_batch(mat: jnp.ndarray, added_bits: int) -> jnp.ndarray:
    return coset_lde_batch(mat, added_bits, 1)
