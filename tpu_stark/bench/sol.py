"""Per-kernel speed-of-light analysis (BASELINE.json: "every field kernel ...
is measured against per-chip speed-of-light").

Approach: measure the device's empirically-achievable roofs with micro-probes
built from the SAME primitive mix each kernel is bound by, then score every
hot kernel as achieved-rate / roof:

* ``montmul`` roof — a dependent chain of BabyBear Montgomery multiplies
  (the inner op of NTT butterflies, Poseidon2 S-boxes and quotient eval;
  SURVEY.md par7.2 "hard parts" #1).  All multiply-bound kernels are scored
  in montmuls/s against this.
* ``bitop`` roof — a dependent chain of u32 xor/shift/or/and (the Keccak
  primitive mix).  Keccak is scored in u32 bit-ops/s against this.
* ``hbm`` roof — a streaming read+write over a large array; bandwidth-bound
  kernels (bit-reversal gathers, transposes) are scored in bytes/s.

The probes chain R dependent steps inside ONE jitted ``fori_loop`` and force
a device_get at the end — the timing discipline of bench_hash.py (the axon
tunnel's ``block_until_ready`` can return early; a dependent chain + fetch
cannot).

Reference analog: the kernel-only benchmark tier + the "% of peak" analysis
the reference's docs call for (docs/mobile_gpu_zk_survey.md device-adaptive
policy discussion); here the roof is measured, not quoted from a datasheet,
so the report is valid on any chip this runs on.

Static op counts (per element / per permutation) are derived from the
implementations in fields/babybear.py, hash/keccak.py, hash/poseidon2.py —
see the constants below for the breakdown.
"""

from __future__ import annotations

import json
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import babybear as bb

# ---------------------------------------------------------------------------
# Static op counts (documented derivations)
# ---------------------------------------------------------------------------

# Keccak-f[1600] on (lo, hi) u32 pairs (hash/keccak.py::_round_static),
# per batch element per round:
#   theta C columns: 5 cols x 4 xors x 2 halves          = 40
#   theta D: 5 x (rotl1 = 3 ops x 2 halves, + 2 xors)    = 40
#   theta apply: 25 lanes x 2 halves                      = 50
#   rho/pi: 24 rotations x (2 shifts + 1 or) x 2 halves   = 144
#   chi: 25 lanes x (not, and, xor) x 2 halves            = 150
#   iota: 2
KECCAK_OPS_PER_ROUND = 426
KECCAK_OPS_PER_PERM = 24 * KECCAK_OPS_PER_ROUND

# Poseidon2 (hash/poseidon2.py), width-16 instance, raw montmuls (S-box
# x^7 = 4 montmuls): 8 external rounds x 16 S-boxes + 13 internal rounds x
# (1 S-box + 16 diag muls); MDS layers add-only.
POSEIDON2_16_MONTMULS = 8 * 16 * 4 + 13 * (4 + 16)  # = 772

# Radix-2 NTT: one twiddle montmul per butterfly, h/2 * log2(h) butterflies
# per column.


def _ntt_montmuls(h: int, w: int) -> int:
    return (h // 2) * int(np.log2(h)) * w


# ---------------------------------------------------------------------------
# Probes
# ---------------------------------------------------------------------------
def _timed(chain: Callable, arg, units_per_rep: float, reps: int) -> float:
    """Rate in units/s for a jitted chain of ``reps`` dependent steps
    (best of 3 timed runs — tunnel latency jitters individual timings)."""
    out = chain(arg)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(arg)
        _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return units_per_rep * reps / best


_INNER = 16  # dependent steps per loop body — amortizes per-iteration launch
# overhead (a body with a single op measured launch latency, not the unit)
_ILP = 16  # independent interleaved chains per body — measured: the
# variable-operand montmul rate rises 20 -> 54 G/s from ILP 4 to 16 (the VPU
# needs many independent op streams in flight); real kernels (16 Poseidon2
# lanes, 50 Keccak lanes, wide NTT batches) have at least this much
_N = 1 << 23  # elements per chain: real kernels expose >=16M elements of
# parallel work per vector op; smaller probe arrays under-amortize per-op
# overhead and under-report the roof


def montmul_roof(n: int = _N, reps: int = 4) -> float:
    """BabyBear montmuls/s (the multiply-bound roof): _ILP independent
    dependent-chains of _INNER montmuls per loop body.  The invariant operand
    is a VECTOR (like an NTT twiddle column) — multiplying by a scalar
    constant lets XLA fold its limb extracts and over-reports the roof."""

    @jax.jit
    def chain(args):
        xs, tw = args

        def body(_, vs):
            for _k in range(_INNER):
                vs = tuple(bb.mul(v, tw) for v in vs)
            return vs

        return jax.lax.fori_loop(0, reps, body, xs)

    base = bb.np_to_monty(np.arange(1, n + 1, dtype=np.uint32) % np.uint32(bb.P))
    xs = tuple(jnp.asarray(base) + np.uint32(i) for i in range(_ILP))
    tw = jnp.asarray(base[::-1].copy())
    return _timed(chain, (xs, tw), float(n) * _INNER * _ILP, reps)


def bitop_roof(n: int = _N, reps: int = 4) -> float:
    """u32 bit-ops/s (xor/shift/or/and mix, 9 ops per inner step — the Keccak
    primitive mix), _ILP interleaved chains."""

    @jax.jit
    def chain(x):
        def body(_, vs):
            out = []
            for v in vs:
                for _k in range(_INNER):
                    r = (v << np.uint32(13)) | (v >> np.uint32(19))  # 3 ops
                    s = (v << np.uint32(7)) | (v >> np.uint32(25))  # 3 ops
                    v = v ^ (~r & s)  # 3 ops
                out.append(v)
            return tuple(out)

        return jax.lax.fori_loop(0, reps, body, x)

    xs = tuple(jnp.arange(1 + i, n + 1 + i, dtype=jnp.uint32) for i in range(_ILP))
    return _timed(chain, xs, 9.0 * n * _INNER * _ILP, reps)


def hbm_roof(n: int = 1 << 27, reps: int = 64) -> float:
    """Streaming bytes/s: each fori_loop iteration reads + writes the full
    uint32 array (8 bytes per element per step)."""

    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(0, reps, lambda _, v: v + np.uint32(1), x)

    x = jnp.arange(n, dtype=jnp.uint32)
    return _timed(chain, x, 8.0 * n, reps)


# ---------------------------------------------------------------------------
# Kernel measurements
# ---------------------------------------------------------------------------
def _measure_ntt(h: int, w: int, reps: int = 8) -> Dict:
    from ..ntt import radix2

    rng = np.random.default_rng(0)
    mat = jnp.asarray(bb.np_to_monty(rng.integers(0, bb.P, size=(h, w), dtype=np.uint32)))

    @jax.jit
    def chain(m):
        # dependent chain: NTT output feeds the next NTT (same shape)
        return jax.lax.fori_loop(0, reps, lambda _, v: radix2.dft_batch(v), m)

    rate = _timed(chain, mat, float(h * w), reps)  # elems/s
    return {
        "kernel": f"ntt_radix2_{h}x{w}",
        "achieved": rate * _ntt_montmuls(h, w) / (h * w),
        "unit": "montmul/s",
        "roof_key": "montmul",
        "melems_s": rate / 1e6,
    }


def _measure_keccak(n: int = 1 << 20, reps: int = 32) -> Dict:
    from ..hash import sponge

    rng = np.random.default_rng(0)
    mat = jnp.asarray(rng.integers(0, 1 << 31, size=(n, 6), dtype=np.uint32))

    @jax.jit
    def chain(m):
        def body(_, mm):
            digs = sponge.hash_field_rows_batched(mm)
            return digs.reshape(mm.shape[0], 8)[:, :6]

        return jax.lax.fori_loop(0, reps, body, m)

    rate = _timed(chain, mat, float(n), reps)  # perms/s (1 perm per 6-col row)
    return {
        "kernel": f"keccak_leaf_sponge_N{n}",
        "achieved": rate * KECCAK_OPS_PER_PERM,
        "unit": "u32op/s",
        "roof_key": "bitop",
        "mperm_s": rate / 1e6,
    }


def _measure_poseidon2(n: int = 1 << 20, reps: int = 32) -> Dict:
    from ..hash import poseidon2

    rng = np.random.default_rng(0)
    st = jnp.asarray(bb.np_to_monty(rng.integers(0, bb.P, size=(n, 16), dtype=np.uint32)))

    @jax.jit
    def chain(s):
        return jax.lax.fori_loop(0, reps, lambda _, v: poseidon2.permute_batched(v), s)

    rate = _timed(chain, st, float(n), reps)
    return {
        "kernel": f"poseidon2_16_N{n}",
        "achieved": rate * POSEIDON2_16_MONTMULS,
        "unit": "montmul/s",
        "roof_key": "montmul",
        "mperm_s": rate / 1e6,
    }


def _measure_poseidon2_sponge(n: int = 1 << 20, reps: int = 32) -> Dict:
    """The Merkle leaf-hash entry point (Pallas kernel on TPU, XLA on CPU) —
    one rate-8 absorb + permutation per 6-column row."""
    from ..commit import poseidon2_mmcs

    rng = np.random.default_rng(0)
    mat = jnp.asarray(bb.np_to_monty(rng.integers(0, bb.P, size=(n, 6), dtype=np.uint32)))

    @jax.jit
    def chain(m):
        def body(_, mm):
            return poseidon2_mmcs.hash_rows_batched(mm)[:, :6]

        return jax.lax.fori_loop(0, reps, body, m)

    rate = _timed(chain, mat, float(n), reps)
    return {
        "kernel": f"poseidon2_leaf_sponge_N{n}",
        "achieved": rate * POSEIDON2_16_MONTMULS,
        "unit": "montmul/s",
        "roof_key": "montmul",
        "mperm_s": rate / 1e6,
    }


def _measure_bitrev(h: int = 1 << 22, w: int = 8, reps: int = 16) -> Dict:
    from ..matrix import reverse_matrix_index_bits

    rng = np.random.default_rng(0)
    mat = jnp.asarray(rng.integers(0, bb.P, size=(h, w), dtype=np.uint32))

    @jax.jit
    def chain(m):
        return jax.lax.fori_loop(
            0, reps, lambda _, v: reverse_matrix_index_bits(v) + np.uint32(1), m
        )

    rate = _timed(chain, mat, 8.0 * h * w, reps)  # bytes/s (read + write)
    return {
        "kernel": f"bit_reversal_{h}x{w}",
        "achieved": rate,
        "unit": "B/s",
        "roof_key": "hbm",
    }


def run(small: bool = False) -> Dict:
    """Measure roofs + kernels; returns the full report dict (also printed)."""
    kw = {"n": 1 << 12, "reps": 4} if small else {}
    roofs = {
        "montmul": montmul_roof(**kw),
        "bitop": bitop_roof(**kw),
        "hbm": hbm_roof(**({"n": 1 << 14, "reps": 4} if small else {})),
    }
    if small:
        kernels = [
            _measure_ntt(256, 8, reps=2),
            _measure_keccak(n=256, reps=2),
            _measure_poseidon2(n=256, reps=2),
            _measure_poseidon2_sponge(n=256, reps=2),
            _measure_bitrev(h=1 << 10, w=8, reps=2),
        ]
    else:
        kernels = [
            _measure_ntt(16384, 128),
            _measure_ntt(65536, 128),
            _measure_ntt(1 << 20, 8),
            _measure_keccak(),
            _measure_poseidon2(),
            _measure_poseidon2_sponge(),
            _measure_bitrev(),
        ]
    for k in kernels:
        k["sol_pct"] = 100.0 * k["achieved"] / roofs[k["roof_key"]]
    report = {"roofs": roofs, "kernels": kernels}
    print(f"device roofs: montmul {roofs['montmul']/1e9:.2f} G/s, "
          f"bitop {roofs['bitop']/1e9:.2f} G/s, hbm {roofs['hbm']/1e9:.1f} GB/s")
    for k in kernels:
        extra = "".join(
            f"  {key.split('_')[0]}={k[key]:.1f}"
            for key in ("melems_s", "mperm_s")
            if key in k
        )
        print(f"{k['kernel']:28s} {k['achieved']/1e9:10.2f} G{k['unit'][:-2]}/s "
              f"vs {k['roof_key']:7s} roof -> {k['sol_pct']:5.1f}% SoL{extra}")
    return report


if __name__ == "__main__":
    import sys

    rep = run(small="--small" in sys.argv)
    print(json.dumps({"sol_report": {
        "roofs": rep["roofs"],
        "kernels": [{kk: vv for kk, vv in k.items()} for k in rep["kernels"]],
    }}))
