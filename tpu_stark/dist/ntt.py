"""Distributed batch NTT over a device mesh — the multi-chip compute core.

The reference's NTT parallelism is butterfly lanes x columns on one GPU
(``/root/reference/native/shaders/fft_stage.wgsl:75-136``); its docs prescribe
hierarchical decomposition once a transform exceeds on-chip memory
(``docs/mobile_gpu_zk_survey.md:345-360``).  Here the transform length itself
is partitioned over chips (BASELINE north star: "NTT butterflies partitioned
over chips with all-to-all stage exchanges over ICI").

Design (radix-2 over rows, contiguous row sharding, one jitted program):

* **Forward = decimation-in-frequency (Gentleman-Sande).**  Stage s pairs rows
  at stride H/2^(s+1), largest first, so exactly the first log2(n_dev) stages
  cross devices — each is one full-block pairwise exchange (``ppermute``,
  neighbor traffic on ICI).  Every remaining stage acts inside one device's
  contiguous block, and because block offsets are multiples of every later
  stride, the local remainder is a *standard* length-L DIF with standard
  twiddles.
* **Output order is commit order.**  In-place DIF emits X_hat[bitrev(j)] at
  position j; with contiguous sharding this is exactly the bit-reversed-rows
  layout the Merkle commit wants (``commit/pcs.py`` commits
  ``reverse_matrix_index_bits(codeword)``) — the sharded pipeline never
  materializes natural-order evaluations at all.
* **Inverse = decimation-in-time** consuming that bit-reversed layout (local
  stages first, then log2(n_dev) exchanges) and emitting natural-order
  coefficients.
* Twiddles for exchange stages factor as w^((d & (stride-1))*L + t) =
  (w^L)^(d & (stride-1)) * w^t: a per-device dynamic scalar (square-and-
  multiply over <= log2(n_dev) bits) times a replicated host-cached powers
  vector — the per-log_n twiddle-cache discipline of the reference
  (``backend_vulkan.rs:977-996``) carried to the mesh.
* Bit-reversal *resharding* (natural <-> bit-reversed frame, an involution) is
  one tiled ``all_to_all`` plus local permutations; it is only ever applied to
  the pre-blowup matrices (trace/coefficient heights), never the big codewords.

Collective cost per forward transform: log2(n_dev) block ppermutes
(vs. 2-3 full all-to-alls for a 4-step split); all traffic rides ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields import babybear as bb
from ..matrix import bit_reversal_perm, log2_strict
from ..ntt.radix2 import _stage_twiddles

ROW_AXIS = "rows"

shard_map = jax.shard_map


def make_row_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    return Mesh(np.array(devs[:n]), (ROW_AXIS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(ROW_AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# Local (per-device) stage kernels — plain jnp, fuse under the enclosing jit.
# ---------------------------------------------------------------------------
def _pow_dyn_scalar(base_monty: jnp.ndarray, e, nbits: int) -> jnp.ndarray:
    """base^e for a traced exponent e < 2^nbits (unrolled square-and-multiply;
    nbits <= log2(n_dev) so this is a handful of scalar ops)."""
    acc = jnp.asarray(np.uint32(bb.MONTY_R))
    b = base_monty
    for i in range(nbits):
        bit = (e >> i) & 1
        acc = jnp.where(bit == 1, bb.mul(acc, b), acc)
        if i + 1 < nbits:
            b = bb.mul(b, b)
    return acc


def _dif_local(x: jnp.ndarray, log_l: int, twiddles) -> jnp.ndarray:
    """Standard length-2^log_l DIF on a local block: natural in, bitrev out.
    twiddles = radix2._stage_twiddles tables (table[k] = (2, 2^k) canonical
    powers of the order-2^(k+1) generator + Shoup companions); DIF walks them
    largest-half first."""
    h, w = x.shape
    for s in range(log_l):
        half = h >> (s + 1)
        tw = twiddles[log2_strict(half)] if half > 1 else None
        y = x.reshape(-1, 2, half, w)
        a, c = y[:, 0], y[:, 1]
        lo = bb.add(a, c)
        hi = bb.sub(a, c)
        if half > 1:
            hi = bb.shoup_mul(hi, tw[0][None, :, None], tw[1][None, :, None])
        else:
            # order-2 generator is -1^0 = 1 on the single lane pair (tw = [1])
            pass
        x = jnp.stack([lo, hi], axis=1).reshape(h, w)
    return x


def _dit_local(x: jnp.ndarray, log_l: int, twiddles) -> jnp.ndarray:
    """Standard length-2^log_l DIT on a local block: bitrev in, natural out
    (the stage loop of ntt/radix2.py::_dit_core without the bit-reversal)."""
    h, w = x.shape
    for s in range(log_l):
        m = 1 << s
        y = x.reshape(h // (2 * m), 2, m, w)
        lo = y[:, 0]
        if s == 0:  # stage-0 twiddle is [1]
            hi = y[:, 1]
        else:
            tw = twiddles[s]
            hi = bb.shoup_mul(y[:, 1], tw[0][None, :, None], tw[1][None, :, None])
        x = jnp.stack([bb.add(lo, hi), bb.sub(lo, hi)], axis=1).reshape(h, w)
    return x


def _exchange_perm(n_dev: int, stride: int):
    return [(i, i ^ stride) for i in range(n_dev)]


def _dif_exchange_stage(
    local: jnp.ndarray, s: int, log_h: int, log_nd: int, inverse_root: bool
) -> jnp.ndarray:
    """Cross-device DIF stage s (s < log_nd): half = H >> (s+1) >= L.
    lo' = a + c ; hi' = (a - c) * w^(j mod half), w of order 2*half."""
    log_l = log_h - log_nd
    l = 1 << log_l
    n_dev = 1 << log_nd
    stride = 1 << (log_nd - s - 1)
    d = jax.lax.axis_index(ROW_AXIS)
    other = jax.lax.ppermute(local, ROW_AXIS, _exchange_perm(n_dev, stride))
    root = bb.two_adic_generator(log_h - s)  # order 2*half
    if inverse_root:
        root = pow(root, bb.P - 2, bb.P)
    tw_vec = bb.powers_monty(root, l)  # w^t, replicated constant
    base = bb.monty_scalar(pow(root, l, bb.P))  # w^L
    scal = _pow_dyn_scalar(base, d & (stride - 1), max(1, log_nd - s - 1))
    tw = bb.mul(tw_vec, scal)
    is_lo = (d & stride) == 0
    lo_out = bb.add(local, other)
    hi_out = bb.mul(bb.sub(other, local), tw[:, None])
    return jnp.where(is_lo, lo_out, hi_out)


def _dit_exchange_stage(
    local: jnp.ndarray, s: int, log_h: int, log_nd: int, inverse_root: bool
) -> jnp.ndarray:
    """Cross-device DIT stage (half = L << s, s = 0..log_nd-1):
    lo' = a + w^j * b ; hi' = a - w^j * b, w of order 2*half."""
    log_l = log_h - log_nd
    l = 1 << log_l
    n_dev = 1 << log_nd
    stride = 1 << s  # in device units: half = stride * L
    d = jax.lax.axis_index(ROW_AXIS)
    other = jax.lax.ppermute(local, ROW_AXIS, _exchange_perm(n_dev, stride))
    root = bb.two_adic_generator(log_l + s + 1)  # order 2*half
    if inverse_root:
        root = pow(root, bb.P - 2, bb.P)
    tw_vec = bb.powers_monty(root, l)
    base = bb.monty_scalar(pow(root, l, bb.P))
    scal = _pow_dyn_scalar(base, d & (stride - 1), max(1, s))
    tw = bb.mul(tw_vec, scal)[:, None]
    is_lo = (d & stride) == 0
    lo_out = bb.add(local, bb.mul(tw, other))
    hi_out = bb.sub(other, bb.mul(tw, local))
    return jnp.where(is_lo, lo_out, hi_out)


def _bitrev_local(x: jnp.ndarray, log_h: int, log_nd: int) -> jnp.ndarray:
    """Global bit-reversal resharding, per-device body (involution).

    Splitting the global index as i = d*L + t, bitrev_H(d*L + t) =
    bitrev_L(t)*n + rev_n(d): device d ends up with the stride-n subsequence
    at offset rev_n(d), ordered by bitrev_L.  One tiled all_to_all moves the
    residue classes; the class relabeling rev_n and the local bitrev_L are
    free layout permutations.
    """
    log_l = log_h - log_nd
    n_dev = 1 << log_nd
    l = 1 << log_l
    if log_nd == 0:
        return x[np.asarray(bit_reversal_perm(log_l))]
    assert log_l >= log_nd, (
        f"bitrev reshard needs H >= n_dev^2 (log_h={log_h}, n_dev={n_dev})"
    )
    w = x.shape[1]
    # y[r][q] = local row q*n + r  (residue class r of the local block)
    y = x.reshape(l // n_dev, n_dev, w).transpose(1, 0, 2)
    z = y[np.asarray(bit_reversal_perm(log_nd))]  # z[i] = y[rev(i)]
    recv = jax.lax.all_to_all(z, ROW_AXIS, split_axis=0, concat_axis=0, tiled=False)
    # recv[e] = z_e[d] -> flatten by (e, q): recv_flat[m] = X[m*n + rev(d)]
    recv = recv.reshape(l, w)
    return recv[np.asarray(bit_reversal_perm(log_l))]


# ---------------------------------------------------------------------------
# Jitted factories (cached per mesh/shape — the per-log_n plan cache).
# ---------------------------------------------------------------------------
def _mesh_log_nd(mesh: Mesh) -> int:
    return log2_strict(int(mesh.devices.size))


@functools.lru_cache(maxsize=None)
def dft_br_fn(mesh: Mesh, log_h: int, inverse_root: bool = False):
    """Jitted sharded forward NTT: natural-order rows (contiguous-sharded) in,
    **bit-reversed-order** evaluations (contiguous-sharded) out."""
    log_nd = _mesh_log_nd(mesh)
    assert log_h >= log_nd, f"need H >= n_dev (log_h={log_h}, log_nd={log_nd})"
    log_l = log_h - log_nd
    twiddles = _stage_twiddles(log_l, inverse_root) if log_l else ()

    def local_fn(x):
        for s in range(log_nd):
            x = _dif_exchange_stage(x, s, log_h, log_nd, inverse_root)
        return _dif_local(x, log_l, twiddles)

    f = shard_map(
        local_fn, mesh=mesh, in_specs=(P(ROW_AXIS, None),),
        out_specs=P(ROW_AXIS, None),
    )
    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def idft_from_br_fn(mesh: Mesh, log_h: int):
    """Jitted sharded inverse NTT: bit-reversed evaluations in, natural-order
    coefficients out (includes the 1/H scale)."""
    log_nd = _mesh_log_nd(mesh)
    assert log_h >= log_nd
    log_l = log_h - log_nd
    twiddles = _stage_twiddles(log_l, True) if log_l else ()
    h_inv = bb.host_to_monty(pow(1 << log_h, bb.P - 2, bb.P))

    def local_fn(x):
        x = _dit_local(x, log_l, twiddles)
        for s in range(log_nd):
            x = _dit_exchange_stage(x, s, log_h, log_nd, inverse_root=True)
        return bb.mul(x, jnp.asarray(np.uint32(h_inv)))

    f = shard_map(
        local_fn, mesh=mesh, in_specs=(P(ROW_AXIS, None),),
        out_specs=P(ROW_AXIS, None),
    )
    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def bitrev_reshard_fn(mesh: Mesh, log_h: int):
    """Jitted global row bit-reversal on a contiguously sharded matrix
    (involution: natural <-> bit-reversed frame)."""
    log_nd = _mesh_log_nd(mesh)

    def local_fn(x):
        return _bitrev_local(x, log_h, log_nd)

    f = shard_map(
        local_fn, mesh=mesh, in_specs=(P(ROW_AXIS, None),),
        out_specs=P(ROW_AXIS, None),
    )
    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def scale_rows_by_powers_fn(mesh: Mesh, log_h: int, base: int):
    """Jitted x[i] *= base^i on a contiguously (natural-order) sharded matrix:
    base^(d*L + t) = (base^L)^d * base^t, local powers vector x dynamic scalar."""
    log_nd = _mesh_log_nd(mesh)
    log_l = log_h - log_nd
    l = 1 << log_l

    def local_fn(x):
        d = jax.lax.axis_index(ROW_AXIS)
        pows = bb.powers_monty(base, l)
        scal = _pow_dyn_scalar(
            bb.monty_scalar(pow(base, l, bb.P)), d, max(1, log_nd)
        )
        return bb.mul(x, bb.mul(pows, scal)[:, None])

    f = shard_map(
        local_fn, mesh=mesh, in_specs=(P(ROW_AXIS, None),),
        out_specs=P(ROW_AXIS, None),
    )
    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _pad_rows_fn(mesh: Mesh, log_h: int, added_bits: int, w: int):
    """Zero-pad (H, w) -> (H << added_bits, w), both contiguously sharded
    (GSPMD resharding: the coefficient block spreads over the mesh)."""
    out_shard = row_sharding(mesh)

    def f(x):
        h = x.shape[0]
        padded = jnp.zeros((h << added_bits, w), dtype=bb.u32).at[:h].set(x)
        return jax.lax.with_sharding_constraint(padded, out_shard)

    return jax.jit(f)


def coset_lde_br(
    mesh: Mesh, evals_natural: jnp.ndarray, added_bits: int, shift: int
) -> jnp.ndarray:
    """Sharded coset LDE, committed order: natural-order evals on the plain
    subgroup (contiguous row-sharded) -> **bit-reversed** codeword on
    shift*<g'> of size H << added_bits (contiguous row-sharded).

    The sharded analog of ntt/radix2.py::coset_lde_batch composed with
    reverse_matrix_index_bits — iNTT, coset scale, zero-pad, DIF NTT; the DIF
    emits commit order directly.
    """
    h, w = int(evals_natural.shape[0]), int(evals_natural.shape[1])
    log_h = log2_strict(h)
    evals_br = bitrev_reshard_fn(mesh, log_h)(evals_natural)
    coeffs = idft_from_br_fn(mesh, log_h)(evals_br)
    scaled = scale_rows_by_powers_fn(mesh, log_h, shift % bb.P)(coeffs)
    padded = _pad_rows_fn(mesh, log_h, added_bits, w)(scaled)
    return dft_br_fn(mesh, log_h + added_bits)(padded)
