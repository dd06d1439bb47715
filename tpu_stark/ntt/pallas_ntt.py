"""Pallas fused-stage NTT kernel — the TPU analog of the reference's
shared-memory tiled shader (``/root/reference/native/shaders/
fft_stage_fused.wgsl``: up to 8 stages fused inside a 256-row workgroup tile;
policy ``backend_vulkan.rs:841-869``), scaled to TPU VMEM.

v2 (OPT-0029/0030).  After the DIT bit-reversal, stage ``s`` butterflies rows
that differ by ``2^s``.  Two pallas passes cover up to 18 stages:

* **Pass 1** (stages 0..k-1, k <= 9) runs on contiguous ``(A=2^k, TC)`` row
  blocks.  Stages with ``m >= 8`` split the block as ``(A/2m, 2, m, TC)`` —
  a pure outer-axis view (minor dims stay tile-aligned, no Mosaic relayout)
  — and multiply ONLY the hi half (half the multiplies of the r1 roll
  formulation).  Stages ``m < 8`` pair rows inside a sublane tile and use
  hardware sublane rotations (``pltpu.roll``); stage 0's twiddle is 1, so it
  is a pure rotate/add/sub pass with no multiply at all.
* **Pass 2** (stages s0..s0+k-1, s0 >= 9) views the matrix as
  ``(H/2^s0, 2^s0, W)`` and blocks it ``(A, bt, TC)``; every butterfly
  stride lives on the OUTER axis, so all splits are free views.

All twiddle multiplies use ``bb.shoup_mul`` (canonical twiddles + Shoup
companions, ~60% of ``bb.mul``'s op count); tables are host-precomputed in
the exact physical layout the kernel consumes, per-(log_n) cached — the
analog of the reference's per-log_n twiddle cache
(``backend_vulkan.rs:977-996``).
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

MAX_FUSED_STAGES = 9  # 2^9-row tiles
LANE_TILE = 128
B_TILE = 16  # pass-2 stride-groups per block (sublane axis)
SPLIT_MIN_M = 8  # butterfly span from which the split form is tile-aligned


def _plan_passes(log_h: int) -> List[Tuple[int, int]]:
    """[(s0, k)] covering stages 0..log_h-1: first pass up to 9 fused stages
    on contiguous blocks, later passes at most 5 (A = 32 outer rows x Bt
    stride-groups keeps the unrolled stage temps inside Mosaic's scoped-vmem
    stack; k = 7 blocks measured 2x over the 16 MB limit)."""
    passes = [(0, min(MAX_FUSED_STAGES, log_h))]
    s0 = passes[0][1]
    while s0 < log_h:
        k = min(5, log_h - s0)
        passes.append((s0, k))
        s0 += k
    return passes


@functools.lru_cache(maxsize=None)
def _pass0_twiddles(k: int, inverse: bool) -> np.ndarray:
    """(2, k, A, 1): [canonical w_{2^(l+1)}^(a mod 2^l), shoup] at in-tile
    row a for stage l.  The split-form stages slice rows [:m]."""
    a_len = 1 << k
    rows = np.arange(a_len)
    out = np.zeros((2, k, a_len), dtype=np.uint32)
    for l in range(k):
        root = bb.two_adic_generator(l + 1)
        if inverse:
            root = pow(root, bb.P - 2, bb.P)
        w = bb.np_powers(root, 1 << l)[rows % (1 << l)]
        out[0, l] = w
        out[1, l] = bb.np_shoup(w)
    return out[:, :, :, None]


@functools.lru_cache(maxsize=None)
def _pass_twiddles(s0: int, k: int, inverse: bool, bt: int) -> np.ndarray:
    """(B/Bt, 2, k, A, Bt, 1): combined twiddle for local stage l at outer
    row a, stride-group b:  w(2^(s0+l+1))^((a mod 2^l) * 2^s0 + b)
    = w(2^(l+1))^(a mod 2^l) * w(2^(s0+l+1))^b,  canonical + shoup."""
    a_len = 1 << k
    b_len = 1 << s0
    out = np.zeros((b_len // bt, 2, k, a_len, bt), dtype=np.uint32)
    rows = np.arange(a_len)
    for l in range(k):
        root_l = bb.two_adic_generator(l + 1)
        root_t = bb.two_adic_generator(s0 + l + 1)
        if inverse:
            root_l = pow(root_l, bb.P - 2, bb.P)
            root_t = pow(root_t, bb.P - 2, bb.P)
        ltw = bb.np_powers(root_l, 1 << l)[rows % (1 << l)].astype(np.uint64)
        twist = bb.np_powers(root_t, b_len).astype(np.uint64)
        comb = ((ltw[:, None] * twist[None, :]) % bb.P).astype(np.uint32)  # (A, B)
        comb = comb.reshape(a_len, b_len // bt, bt)
        out[:, 0, l] = comb.transpose(1, 0, 2)
        out[:, 1, l] = bb.np_shoup(comb).transpose(1, 0, 2)
    return out[..., None]


def _split_stage(x, l: int, twc, twp, a: int):
    """One butterfly stage at span m = 2^l on a (A, TC) block via the
    outer-axis split view (m >= 8 keeps minor dims tile-aligned): multiply
    only the hi half (Shoup), then interleave back."""
    m = 1 << l
    y = x.reshape(a // (2 * m), 2, m, x.shape[-1])
    lo = y[:, 0]
    t = bb.shoup_mul(y[:, 1], twc, twp)
    out = jnp.stack([bb.add(lo, t), bb.sub(lo, t)], axis=1)
    return out.reshape(x.shape)


def _pass0_kernel(x_ref, tw_ref, o_ref, *, k: int, a: int):
    """Pass-1 (s0 == 0) on (A, TC) blocks.  Stages m < SPLIT_MIN_M pair rows
    inside sublane tiles via hardware sublane rotations; stages m >= 8 use
    the free outer-split form with hi-half-only multiplies."""
    x = x_ref[...]  # (A, TC)
    rowid = jax.lax.broadcasted_iota(jnp.uint32, (a, 1), 0)
    for l in range(k):
        m = 1 << l
        if m < SPLIT_MIN_M:
            hi_mask = ((rowid >> np.uint32(l)) & np.uint32(1)) == np.uint32(1)
            up = pltpu.roll(x, m, 0)  # x[r - m]
            down = pltpu.roll(x, a - m, 0)  # x[r + m]
            partner = jnp.where(hi_mask, up, down)
            if l == 0:
                # twiddle == 1: out_lo = x + x[r+1], out_hi = x[r-1] - x
                x = jnp.where(hi_mask, bb.sub(partner, x), bb.add(x, partner))
            else:
                t = bb.shoup_mul(
                    jnp.where(hi_mask, x, partner), tw_ref[0, l], tw_ref[1, l]
                )
                x = jnp.where(hi_mask, bb.sub(partner, t), bb.add(x, t))
        else:
            x = _split_stage(
                x, l, tw_ref[0, l, :m], tw_ref[1, l, :m], a
            )
    o_ref[...] = x


def _pass_kernel(x_ref, tw_ref, o_ref, *, k: int, a: int):
    """Pass-2 on (A, Bt, TC) blocks: every local stage splits the outer axis
    (always a free view) and multiplies only the hi half."""
    x = x_ref[...]  # (A, Bt, TC)
    for l in range(k):
        m = 1 << l
        y = x.reshape(a // (2 * m), 2, m, x.shape[1], x.shape[2])
        lo = y[:, 0]
        hi = y[:, 1]
        # (A, Bt, 1) tables sliced to the hi half's positions
        twc = tw_ref[0, 0, l, :m]
        twp = tw_ref[0, 1, l, :m]
        t = bb.shoup_mul(hi, twc, twp)
        x = jnp.stack([bb.add(lo, t), bb.sub(lo, t)], axis=1).reshape(x.shape)
    o_ref[...] = x


def _run_pass(
    x: jnp.ndarray, s0: int, k: int, inverse: bool, interpret: bool
) -> jnp.ndarray:
    h, w = x.shape
    a = 1 << k
    b = 1 << s0
    # block VMEM footprint ~ a*bt*tc x (I/O double-buffers + stage temps):
    # cap blocks at ~256 KB or Mosaic's scoped-vmem stack blows past 16 MB
    bt = min(b, B_TILE if a < 64 else 8)
    tc = min(LANE_TILE, w)
    assert w % tc == 0
    if b == 1:
        tw0 = jnp.asarray(_pass0_twiddles(k, inverse))
        out = pl.pallas_call(
            functools.partial(_pass0_kernel, k=k, a=a),
            grid=(h // a, w // tc),
            in_specs=[
                pl.BlockSpec(
                    (a, tc), lambda ai, ci: (ai, ci), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (2, k, a, 1), lambda ai, ci: (0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (a, tc), lambda ai, ci: (ai, ci), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=interpret,
        )(x, tw0)
        return out
    xv = x.reshape(h // b, b, w)
    grid = ((h // b) // a, b // bt, w // tc)
    tw = jnp.asarray(_pass_twiddles(s0, k, inverse, bt))
    out = pl.pallas_call(
        functools.partial(_pass_kernel, k=k, a=a),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (a, bt, tc),
                lambda ai, bi, ci: (ai, bi, ci),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2, k, a, bt, 1),
                lambda ai, bi, ci: (bi, 0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (a, bt, tc), lambda ai, bi, ci: (ai, bi, ci), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(xv.shape, xv.dtype),
        interpret=interpret,
    )(xv, tw)
    return out.reshape(h, w)


def ntt_from_bitrev(
    x_br: jnp.ndarray, inverse: bool = False, interpret: bool = False
) -> jnp.ndarray:
    """DIT NTT of bit-reversed-input rows -> natural-order output.
    Pure pallas passes; composes under jit."""
    log_h = log2_strict(x_br.shape[0])
    x = x_br
    for s0, k in _plan_passes(log_h):
        x = _run_pass(x, s0, k, inverse, interpret)
    return x


def supports(h: int, w: int) -> bool:
    """Shapes the pallas path handles efficiently (lane-aligned widths,
    nontrivial heights); others take the XLA path (the fused-gate policy
    analog of backend_vulkan.rs:841-869)."""
    return h >= 1 << MAX_FUSED_STAGES and w % LANE_TILE == 0 and w > 0
