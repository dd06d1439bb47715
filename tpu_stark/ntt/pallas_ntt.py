"""Pallas fused-stage NTT kernel — the TPU analog of the reference's
shared-memory tiled shader (``/root/reference/native/shaders/
fft_stage_fused.wgsl``: up to 8 stages fused inside a 256-row workgroup tile;
policy ``backend_vulkan.rs:841-869``), scaled to TPU VMEM.

Algorithm (generalized 4-step over strided views):

After the DIT bit-reversal, stage ``s`` butterflies rows that differ by
``2^s``.  Viewing the (H, W) matrix as ``(H/2^s0, 2^s0, W)``, stages
``s0 .. s0+k-1`` act along axis 0 with local strides ``1 .. 2^(k-1)`` — a
contiguous axis-0 block of ``2^k`` rows contains every butterfly of ``k``
consecutive stages.  Twiddles factor as local_tw(l)[a mod 2^l] * twist(l)[b]
(b = stride-group index), so each tile's full twiddle tensor is precomputed
host-side in the exact physical layout the kernel consumes.

Kernel form: **roll-based butterflies** — for each fused stage, the partner
row is `roll(x, ±m)` on the outer axis and lo/hi rows are selected by a bit
of the row index.  No in-kernel reshapes → no Mosaic relayouts; each stage is
two sublane rotations plus Montgomery-limb VPU arithmetic
(``fields/babybear.py`` formulas run verbatim inside the kernel).

One pallas_call per pass; ceil(log_H / 9) passes replace log_H HBM round
trips of the XLA path.
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
B_TILE = 8  # stride-groups per tile (sublane alignment)


def _plan_passes(log_h: int) -> List[Tuple[int, int]]:
    """[(s0, k)] covering stages 0..log_h-1 with k <= MAX_FUSED_STAGES."""
    passes = []
    s0 = 0
    while s0 < log_h:
        k = min(MAX_FUSED_STAGES, log_h - s0)
        passes.append((s0, k))
        s0 += k
    return passes


@functools.lru_cache(maxsize=None)
def _pass_twiddles(s0: int, k: int, inverse: bool) -> np.ndarray:
    """(B/Bt, k, A, Bt, 1) Monty: combined twiddle for stage l at in-tile row
    a, stride-group b:  w(2^(l+1))^(a mod 2^l) * w(2^(s0+l+1))^b."""
    a_len = 1 << k
    b_len = 1 << s0
    bt = min(b_len, B_TILE)
    out = np.zeros((b_len // bt, k, a_len, bt), dtype=np.uint32)
    rows = np.arange(a_len)
    bs = np.arange(b_len)
    for l in range(k):
        root_l = bb.two_adic_generator(l + 1)
        root_t = bb.two_adic_generator(s0 + l + 1)
        if inverse:
            root_l = pow(root_l, bb.P - 2, bb.P)
            root_t = pow(root_t, bb.P - 2, bb.P)
        ltw = bb.np_powers(root_l, 1 << l)[rows % (1 << l)].astype(np.uint64)
        twist = bb.np_powers(root_t, b_len).astype(np.uint64)
        comb = (ltw[:, None] * twist[None, :]) % bb.P  # (A, B)
        comb = bb.np_to_monty(comb.astype(np.uint32))
        out[:, l] = comb.reshape(a_len, b_len // bt, bt).transpose(1, 0, 2)
    return out[..., None]


def _pass_kernel(x_ref, tw_ref, o_ref, *, k: int, a: int):
    x = x_ref[...]  # (A, Bt, TC)
    rowid = jax.lax.broadcasted_iota(jnp.uint32, (a, 1, 1), 0)
    for l in range(k):
        m = 1 << l
        hi = ((rowid >> np.uint32(l)) & np.uint32(1)) == np.uint32(1)
        tw = tw_ref[0, l]  # (A, Bt, 1) — broadcasts across lanes
        up = pltpu.roll(x, m, 0)  # x[r - m]
        down = pltpu.roll(x, a - m, 0)  # x[r + m] (non-negative shift)
        partner = jnp.where(hi, up, down)
        t = bb.mul(jnp.where(hi, x, partner), tw)
        x = jnp.where(hi, bb.sub(partner, t), bb.add(x, t))
    o_ref[...] = x


def _pass0_kernel(x_ref, tw_ref, o_ref, *, k: int, a: int):
    """First pass (s0 == 0) on 2D (A, TC) blocks: the general kernel's
    (A, bt=1, TC) view packs ONE row per (8, 128) tile — 8x sublane waste
    that capped the r1 kernel at 607 Melems/s.  Here the fused-stage window
    itself is the sublane axis: rolls by m >= 8 move whole tile rows, rolls
    by m < 8 are hardware sublane rotations."""
    x = x_ref[...]  # (A, TC)
    rowid = jax.lax.broadcasted_iota(jnp.uint32, (a, 1), 0)
    for l in range(k):
        m = 1 << l
        hi = ((rowid >> np.uint32(l)) & np.uint32(1)) == np.uint32(1)
        tw = tw_ref[l]  # (A, 1) — broadcasts across lanes
        up = pltpu.roll(x, m, 0)  # x[r - m]
        down = pltpu.roll(x, a - m, 0)  # x[r + m]
        partner = jnp.where(hi, up, down)
        t = bb.mul(jnp.where(hi, x, partner), tw)
        x = jnp.where(hi, bb.sub(partner, t), bb.add(x, t))
    o_ref[...] = x


@functools.lru_cache(maxsize=None)
def _pass0_twiddles(k: int, inverse: bool) -> np.ndarray:
    """(k, A, 1) Monty: stage l twiddle at in-tile row a = w(2^(l+1))^(a mod 2^l)."""
    a_len = 1 << k
    rows = np.arange(a_len)
    out = np.zeros((k, a_len), dtype=np.uint32)
    for l in range(k):
        root = bb.two_adic_generator(l + 1)
        if inverse:
            root = pow(root, bb.P - 2, bb.P)
        out[l] = bb.np_to_monty(bb.np_powers(root, 1 << l)[rows % (1 << l)])
    return out[:, :, None]


def _run_pass(
    x: jnp.ndarray, s0: int, k: int, inverse: bool, interpret: bool
) -> jnp.ndarray:
    h, w = x.shape
    a = 1 << k
    b = 1 << s0
    bt = min(b, B_TILE)
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
                    (k, a, 1), lambda ai, ci: (0, 0, 0),
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
    tw = jnp.asarray(_pass_twiddles(s0, k, inverse))
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
                (1, k, a, bt, 1),
                lambda ai, bi, ci: (bi, 0, 0, 0, 0),
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
