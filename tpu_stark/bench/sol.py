"""Per-kernel speed-of-light analysis (BASELINE.json: "every field kernel ...
is measured against per-chip speed-of-light").

Methodology (recalibrated in round 3 — the round-2 report scored two kernels
ABOVE their roofs, which meant the probes under-measured achievable rates
and the hand-derived op counts over-counted what XLA actually executes):

1. **Audited op counts.**  Every XLA kernel's work is counted mechanically
   from its StableHLO lowering (``audit_ops``): integer ``multiply`` ops and
   integer ALU ops (add/sub/logic/shift/select/compare), weighted by result
   element count.  No hand-derived per-op constants — fusion-level
   simplifications the compiler applies to the real kernel are the same ones
   it applies to the probe, so the ratio is meaningful.  (Pallas kernels are
   custom-calls with no visible HLO; they are audited via their forced-XLA
   twin, which computes the same math.)
2. **Measured roofs.**  ``mul`` and ``alu`` roofs come from dependent-chain
   probes (ILP x chained steps inside one jitted fori_loop, device_get
   forced — the tunnel's block_until_ready returns early); ``hbm`` from a
   streaming read+write sweep.  Probe work is audited with the SAME counter.
2b. **Latency-floor-proof timing (round 5, OPT-0031).**  Every chain is
   re-jitted with enough reps that its total wall time clears
   ``max(20 x dispatch_floor, 0.25 s)``, where ``dispatch_floor`` is the
   measured fixed cost of one dispatch + device_get round trip (~24 ms on
   the axon tunnel).  The round-1..4 harness used fixed small reps, so each
   kernel measurement reported ``max(work, floor)`` — the floor, for every
   sub-ms kernel.  That artifact produced the r4 report's 2.7%-16% kernel
   scores, the "four-round NTT plateau" at ~1.5 Gelems/s (actual XLA rate
   once unfloored: ~5.6 Gelems/s), and the BENCH_LOCAL-vs-driver 92%/58%
   contradiction the r4 verdict flagged.  The roofs themselves were always
   measured with >= 100 ms of work and stand.
3. **Roof lifting.**  If any kernel sustains a higher audited op rate than
   its probe, the roof is LIFTED to that kernel's rate (and the source
   recorded): a roof is "the best rate observed on this chip", so no kernel
   can exceed 100% by construction, and every kernel's headroom is stated
   against the best evidence available.  A kernel at 100% *defines* the
   empirical roof.
4. Each kernel is scored on its BINDING resource:
   sol = max(mul_rate/mul_roof, alu_rate/alu_roof[, bytes/hbm_roof]).

Reference analog: the kernel-only benchmark tier + the "% of peak" analysis
the reference's docs call for (docs/mobile_gpu_zk_survey.md device-adaptive
policy discussion); here the roof is measured, not quoted from a datasheet,
so the report is valid on any chip this runs on.
"""

from __future__ import annotations

import contextlib
import json
import os
import re
import time
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import babybear as bb

# ---------------------------------------------------------------------------
# StableHLO op auditing
# ---------------------------------------------------------------------------
_MUL_OPS = {"multiply"}
_ALU_OPS = {
    "add", "subtract", "and", "or", "xor", "not",
    "shift_left", "shift_right_logical", "shift_right_arithmetic",
    "select", "compare", "maximum", "minimum",
}
_INT_DTYPES = {"ui64", "i64", "ui32", "i32", "ui16", "i16", "ui8", "i8", "i1"}
_LINE_RE = re.compile(r"=\s+stablehlo\.(\w+)\b")
_TENSOR_RE = re.compile(r"tensor<([^>]*)>")


_FUNC_RE = re.compile(r"func\.func\b.*?@([\w.$-]+)\(")
_CALL_RE = re.compile(r"\bcall @([\w.$-]+)")


def audit_ops(fn: Callable, *args) -> Dict[str, int]:
    """Count integer multiply / ALU ops in ``fn``'s StableHLO lowering,
    weighted by result element counts, CALL-GRAPH-WEIGHTED: an outlined
    function's body counts once per call site reached from ``main``.
    (``lax.scan`` with unroll == length emits its body as one private
    function called N times — the r1-r4 flat line count saw it ONCE, a 24x
    undercount for the Keccak permutation, which is where the r4 report's
    "keccak_leaf_sponge 2.7% SoL" came from.)  ``while_loops`` reports loop
    bodies counted only once (keep audited fns loop-free for exact counts)."""
    txt = jax.jit(fn).lower(*args).as_text()
    funcs: Dict[str, Dict] = {}
    cur: Dict = {"mul": 0, "alu": 0, "while": 0, "calls": {}}
    funcs["__toplevel__"] = cur
    for line in txt.splitlines():
        fm = _FUNC_RE.search(line)
        if fm:
            cur = {"mul": 0, "alu": 0, "while": 0, "calls": {}}
            funcs[fm.group(1)] = cur
            continue
        cm = _CALL_RE.search(line)
        if cm:
            callee = cm.group(1)
            cur["calls"][callee] = cur["calls"].get(callee, 0) + 1
            continue
        cur["while"] += line.count("stablehlo.while")
        m = _LINE_RE.search(line)
        if not m:
            continue
        op = m.group(1)
        cat = "mul" if op in _MUL_OPS else ("alu" if op in _ALU_OPS else None)
        if cat is None:
            continue
        tensors = _TENSOR_RE.findall(line)
        if not tensors:
            continue
        parts = tensors[-1].split("x")
        if parts[-1] not in _INT_DTYPES:
            continue
        elems = 1
        for p in parts[:-1]:
            elems *= int(p)
        cur[cat] += elems

    memo: Dict[str, Dict[str, int]] = {}

    def total(name: str, seen=()) -> Dict[str, int]:
        if name in memo:
            return memo[name]
        f = funcs.get(name)
        if f is None or name in seen:  # unknown callee / recursion guard
            return {"mul": 0, "alu": 0, "while": 0}
        t = {"mul": f["mul"], "alu": f["alu"], "while": f["while"]}
        for callee, times in f["calls"].items():
            sub = total(callee, seen + (name,))
            for k in t:
                t[k] += times * sub[k]
        memo[name] = t
        return t

    root = "main" if "main" in funcs else "__toplevel__"
    t = total(root)
    return {"mul": t["mul"], "alu": t["alu"], "while_loops": t["while"]}


@contextlib.contextmanager
def _forced_impl(**env):
    """Temporarily force kernel impl knobs (audit the XLA twin of a Pallas
    kernel)."""
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


# ---------------------------------------------------------------------------
# Timing discipline
# ---------------------------------------------------------------------------
_FLOOR_MULT = 20.0  # require total >= 20x floor => floor bias <= 5%
_MIN_TOTAL_S = 0.25
_MAX_REPS = 1 << 17
_floor_cache: List[float] = []
_fast_mode = False  # run(small=True): structural smoke, not a measurement


def dispatch_floor() -> float:
    """Fixed per-call latency of one dispatch + 4-byte device_get, measured
    live (OPT-0031: ~24 ms on the axon tunnel in the round-5 session; a
    local chip is ~100x lower).  Every timed chain whose total runtime does
    not clear this floor measures max(work, floor), not work — the round
    1..4 fixed-reps harness did exactly that and floored every sub-ms
    kernel, which is where the r4 report's 2.7%-16% kernel scores and the
    four-round 1.5 Gelems/s NTT 'plateau' came from."""
    if not _floor_cache:
        x = jnp.zeros((8, 128), jnp.uint32)
        f = jax.jit(lambda v: v + np.uint32(1))
        _ = jax.device_get(f(x).ravel()[0])
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            _ = jax.device_get(f(x).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        _floor_cache.append(best)
    return _floor_cache[0]


def _best_of(chain: Callable, arg, trials: int = 3) -> float:
    out = chain(arg)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = chain(arg)
        _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def _timed(make_chain: Callable, arg, reps: int) -> float:
    """Calls/s for a jitted chain of dependent steps, latency-floor-proofed:
    ``make_chain(reps)`` builds the chain, and ``reps`` is scaled until the
    total wall time clears ``max(20 x dispatch_floor, 0.25 s)`` so the fixed
    tunnel round-trip biases the rate by <= 5%.  Best of 3; device_get
    forced because the tunnel's block_until_ready can return early."""
    floor = dispatch_floor()
    target = max(_FLOOR_MULT * floor, _MIN_TOTAL_S)
    if _fast_mode:  # smoke tier: exercise the scaling path, skip the wait
        target = 2 * floor
    for _ in range(4):
        best = _best_of(make_chain(reps), arg)
        if best >= target or reps >= _MAX_REPS:
            break
        scale = target / max(best, 1e-9) * 1.25
        reps = min(_MAX_REPS, max(reps + 1, int(reps * scale) + 1))
    return reps / best


_INNER = 16  # dependent steps per loop body — amortizes per-iteration launch
# overhead (a body with a single op measured launch latency, not the unit)
_ILP = 16  # independent interleaved chains per body — measured: the
# variable-operand montmul rate rises 20 -> 54 G/s from ILP 4 to 16 (the VPU
# needs many independent op streams in flight); real kernels (16 Poseidon2
# lanes, 50 Keccak lanes, wide NTT batches) have at least this much
_N = 1 << 23  # elements per chain: real kernels expose >=16M elements of
# parallel work per vector op; smaller probe arrays under-amortize per-op
# overhead and under-report the roof


# ---------------------------------------------------------------------------
# Probes (roof candidates)
# ---------------------------------------------------------------------------
def mul_roof(n: int = _N, reps: int = 4) -> Dict:
    """Raw integer-multiply ops/s from a BabyBear montmul dependent chain
    (_ILP independent chains of _INNER montmuls per loop body).  The
    invariant operand is a VECTOR (like an NTT twiddle column) — multiplying
    by a scalar constant lets XLA fold its limb extracts and over-report."""

    def mk(reps):
        @jax.jit
        def chain(args):
            xs, tw = args

            def body(_, vs):
                for _k in range(_INNER):
                    vs = tuple(bb.mul(v, tw) for v in vs)
                return vs

            return jax.lax.fori_loop(0, reps, body, xs)

        return chain

    base = bb.np_to_monty(np.arange(1, n + 1, dtype=np.uint32) % np.uint32(bb.P))
    xs = tuple(jnp.asarray(base) + np.uint32(i) for i in range(_ILP))
    tw = jnp.asarray(base[::-1].copy())
    per_step = audit_ops(lambda a, t: bb.mul(a, t), xs[0], tw)
    calls_s = _timed(mk, (xs, tw), reps)
    return {
        "mul": calls_s * _INNER * _ILP * per_step["mul"],
        "alu": calls_s * _INNER * _ILP * per_step["alu"],
        "montmuls_per_mul_op": _INNER * _ILP * n / (_INNER * _ILP * per_step["mul"]),
        "ops_per_montmul": {k: per_step[k] / n for k in ("mul", "alu")},
    }


def alu_roof(n: int = _N, reps: int = 4) -> Dict:
    """Raw integer ALU ops/s from a Keccak-mix dependent chain
    (rotations + xor + andnot), _ILP interleaved chains."""

    def step(v):
        r = (v << np.uint32(13)) | (v >> np.uint32(19))
        s = (v << np.uint32(7)) | (v >> np.uint32(25))
        return v ^ (~r & s)

    def mk(reps):
        @jax.jit
        def chain(x):
            def body(_, vs):
                out = []
                for v in vs:
                    for _k in range(_INNER):
                        v = step(v)
                    out.append(v)
                return tuple(out)

            return jax.lax.fori_loop(0, reps, body, x)

        return chain

    xs = tuple(jnp.arange(1 + i, n + 1 + i, dtype=jnp.uint32) for i in range(_ILP))
    per_step = audit_ops(step, xs[0])
    calls_s = _timed(mk, xs, reps)
    return {
        "mul": calls_s * _INNER * _ILP * per_step["mul"],
        "alu": calls_s * _INNER * _ILP * per_step["alu"],
    }


def hbm_roof(n: int = 1 << 27, reps: int = 64) -> float:
    """Streaming bytes/s: each fori_loop iteration reads + writes the full
    uint32 array (8 bytes per element per step)."""

    def mk(reps):
        @jax.jit
        def chain(x):
            return jax.lax.fori_loop(0, reps, lambda _, v: v + np.uint32(1), x)

        return chain

    x = jnp.arange(n, dtype=jnp.uint32)
    return 8.0 * n * _timed(mk, x, reps)


# ---------------------------------------------------------------------------
# Kernel measurements: each returns
#   {kernel, ops: {mul, alu}, rate: calls/s, extra info}
# ---------------------------------------------------------------------------
def _measure_ntt(h: int, w: int, reps: int = 8) -> Dict:
    from ..ntt import radix2

    rng = np.random.default_rng(0)
    mat = jnp.asarray(bb.np_to_monty(rng.integers(0, bb.P, size=(h, w), dtype=np.uint32)))

    def mk(reps):
        @jax.jit
        def chain(m):
            # dependent chain: NTT output feeds the next NTT (same shape)
            return jax.lax.fori_loop(0, reps, lambda _, v: radix2.dft_batch(v), m)

        return chain

    ops = audit_ops(radix2.dft_batch, mat)
    calls_s = _timed(mk, mat, reps)
    # HBM model (IMPLEMENTATION-BOUND, not physics — VERDICT r4 #6): XLA
    # pair-fuses adjacent radix-2 stages (measured: the un-floored 65536x128
    # time is BELOW the 1-pass-per-stage model's HBM minimum, so log_h+2
    # passes overstates traffic and would corrupt roof lifting), giving
    # ~ceil(log_h/2) stage passes + ~2 bit-reversal passes, each reading +
    # writing the (h, w) u32 array.  ``passes`` describes THIS
    # implementation's traffic; deeper fusion (VMEM-resident Pallas passes,
    # the reference's fft_stage_fused.wgsl move) shrinks it toward ~2-3,
    # raising the true ceiling several-fold.  A kernel scoring high against
    # this model is NOT done — it has only exhausted the pair-fused
    # formulation.
    log_h = max(1, h.bit_length() - 1)
    passes = (log_h + 1) // 2 + 2
    return {
        "kernel": f"ntt_radix2_{h}x{w}",
        "ops": ops,
        "rate": calls_s,
        "melems_s": calls_s * h * w / 1e6,
        "bytes_per_call": float(passes * 8 * h * w),
        "hbm_model": f"{passes} passes x rw",
    }


def _measure_keccak(n: int = 1 << 20, reps: int = 32) -> Dict:
    from ..hash import sponge

    rng = np.random.default_rng(0)
    mat = jnp.asarray(rng.integers(0, 1 << 31, size=(n, 6), dtype=np.uint32))

    def hash_fn(m):
        return sponge.hash_field_rows_batched(m)

    # Audit the fully-unrolled twin (TPU_STARK_KECCAK_UNROLL=24): the
    # lowering is then provably while-free, so counts are exact — closing
    # the r3 "(while: audit undercounts)" caveat.  (Verified: the rolled
    # scan's counts match the unrolled twin's — trace-time folding of the
    # 22 zero lanes in the single-block absorb dominates either way.
    # ``hash_fn`` is a fresh function identity, so the forced-env trace is
    # never shared with the measured kernel's — no global cache clearing,
    # which would recompile every cached jit in the process.)
    with _forced_impl(TPU_STARK_KECCAK_IMPL="xla", TPU_STARK_KECCAK_UNROLL="24",
                      TPU_STARK_KECCAK_LAYOUT="lanes"):
        ops = audit_ops(hash_fn, mat)
    # loop-free twin => exact counts; a residual while would re-surface the
    # "(while: audit undercounts)" caveat in the report rather than abort it
    if ops.get("while_loops", 0):
        import sys

        print("warning: keccak audit twin not loop-free", file=sys.stderr)

    def mk(reps):
        @jax.jit
        def chain(m):
            def body(_, mm):
                digs = sponge.hash_field_rows_batched(mm)
                return digs.reshape(mm.shape[0], 8)[:, :6]

            return jax.lax.fori_loop(0, reps, body, m)

        return chain

    calls_s = _timed(mk, mat, reps)
    return {
        "kernel": f"keccak_leaf_sponge_N{n}",
        "ops": ops,
        "rate": calls_s,
        "mperm_s": calls_s * n / 1e6,
    }


def _measure_poseidon2(n: int = 1 << 20, reps: int = 32) -> Dict:
    from ..hash import poseidon2

    rng = np.random.default_rng(0)
    st = jnp.asarray(bb.np_to_monty(rng.integers(0, bb.P, size=(n, 16), dtype=np.uint32)))

    def mk(reps):
        @jax.jit
        def chain(s):
            return jax.lax.fori_loop(
                0, reps, lambda _, v: poseidon2.permute_batched(v), s
            )

        return chain

    ops = audit_ops(poseidon2.permute_batched, st)
    calls_s = _timed(mk, st, reps)
    return {
        "kernel": f"poseidon2_16_N{n}",
        "ops": ops,
        "rate": calls_s,
        "mperm_s": calls_s * n / 1e6,
    }


def _measure_poseidon2_sponge(n: int = 1 << 20, reps: int = 32) -> Dict:
    """The Merkle leaf-hash entry point (Pallas kernel on TPU, XLA on CPU) —
    one rate-8 absorb + permutation per 6-column row.  Audited via the XLA
    twin; measured on whatever impl the policy dispatches."""
    from ..commit import poseidon2_mmcs

    rng = np.random.default_rng(0)
    mat = jnp.asarray(bb.np_to_monty(rng.integers(0, bb.P, size=(n, 6), dtype=np.uint32)))

    def mk(reps):
        @jax.jit
        def chain(m):
            def body(_, mm):
                return poseidon2_mmcs.hash_rows_batched(mm)[:, :6]

            return jax.lax.fori_loop(0, reps, body, m)

        return chain

    with _forced_impl(TPU_STARK_POSEIDON2_IMPL="xla"):
        ops = audit_ops(poseidon2_mmcs.hash_rows_batched, mat)
    calls_s = _timed(mk, mat, reps)
    return {
        "kernel": f"poseidon2_leaf_sponge_N{n}",
        "ops": ops,
        "rate": calls_s,
        "mperm_s": calls_s * n / 1e6,
    }


def _measure_quotient(log_n: int = 18, reps: int = 8) -> Dict:
    """The AIR quotient-eval kernel (prove.py::_quotient_fn) on the fib AIR
    at quotient-domain size 2^(log_n+1) — selectors, constraint eval, alpha
    folding, zeroifier division in one jitted program."""
    from ..air.fibonacci import FibonacciAir
    from ..prover.prove import _quotient_fn, _register_air, get_symbolic_info

    air = FibonacciAir()
    key = _register_air(air)
    log_m = log_n + 1
    qfn = _quotient_fn(key, log_n, log_m, 3)
    h = 1 << log_m
    rng = np.random.default_rng(0)
    trace_on_q = jnp.asarray(
        bb.np_to_monty(rng.integers(0, bb.P, size=(h, 2), dtype=np.uint32))
    )
    pis = jnp.asarray(bb.np_to_monty(np.array([0, 1, 21], dtype=np.uint32)))
    nc, _ = get_symbolic_info(air, 3)
    apows = jnp.asarray(
        bb.np_to_monty(rng.integers(0, bb.P, size=(nc, 4), dtype=np.uint32))
    )

    def mk(reps):
        @jax.jit
        def chain(t):
            def body(_, v):
                q = qfn(v, pis, apows)  # (h, 4) ext
                return bb.add(v, q[:, :2])  # mix back: dependent chain

            return jax.lax.fori_loop(0, reps, body, t)

        return chain

    ops = audit_ops(lambda t: qfn(t, pis, apows), trace_on_q)
    calls_s = _timed(mk, trace_on_q, reps)
    return {
        "kernel": f"quotient_fib_2^{log_m}",
        "ops": ops,
        "rate": calls_s,
        "melems_s": calls_s * h / 1e6,
    }


def _measure_fri_fold(log_h: int = 22, reps: int = 16) -> Dict:
    """One arity-2 FRI fold level at 2^log_h ext rows, with the per-level
    1/(2y) table passed in as the production fold loop does (device-cached
    per level, OPT-0032 — rebuilding it in-graph per fold was the r1-r4
    shape of this kernel AND of this measurement)."""
    from ..commit.pcs import _fold_eo_jit, _fold_inv2y
    from ..fields import extension as ext4

    h = 1 << log_h
    rng = np.random.default_rng(0)
    cw = jnp.asarray(
        bb.np_to_monty(rng.integers(0, bb.P, size=(h, 4), dtype=np.uint32))
    )
    beta = ext4.scalar((3, 1, 4, 1))
    inv2y = _fold_inv2y(log_h)

    def fold(v, t):
        p = v.reshape(h // 2, 2, 4)
        return _fold_eo_jit(p[:, 0], p[:, 1], beta, t)

    def mk(reps):
        @jax.jit
        def chain(args):
            v, t = args

            def body(_, vv):
                folded = fold(vv, t)  # (h/2, 4)
                return jnp.concatenate([folded, folded], axis=0)  # keep shape

            return jax.lax.fori_loop(0, reps, body, v)

        return chain

    ops = audit_ops(fold, cw, inv2y)
    calls_s = _timed(mk, (cw, inv2y), reps)
    return {
        "kernel": f"fri_fold_2^{log_h}",
        "ops": ops,
        "rate": calls_s,
        "melems_s": calls_s * h / 1e6,
    }


def _measure_bitrev(h: int = 1 << 22, w: int = 8, reps: int = 16) -> Dict:
    from ..matrix import reverse_matrix_index_bits

    rng = np.random.default_rng(0)
    mat = jnp.asarray(rng.integers(0, bb.P, size=(h, w), dtype=np.uint32))

    def mk(reps):
        @jax.jit
        def chain(m):
            return jax.lax.fori_loop(
                0, reps, lambda _, v: reverse_matrix_index_bits(v) + np.uint32(1), m
            )

        return chain

    calls_s = _timed(mk, mat, reps)
    return {
        "kernel": f"bit_reversal_{h}x{w}",
        "ops": {"mul": 0, "alu": 0},
        "rate": calls_s,
        "bytes_per_call": 8.0 * h * w,  # read + write
    }


# ---------------------------------------------------------------------------
# Report
# ---------------------------------------------------------------------------
def run(small: bool = False) -> Dict:
    """Measure roofs + kernels, lift roofs by observed kernel rates, score
    each kernel on its binding resource; returns the report dict (printed)."""
    global _fast_mode
    _fast_mode = bool(small)
    kw = {"n": 1 << 12, "reps": 4} if small else {}
    mroof = mul_roof(**kw)
    aroof = alu_roof(**kw)
    roofs = {
        "mul": mroof["mul"],
        "alu": aroof["alu"],
        "hbm": hbm_roof(**({"n": 1 << 14, "reps": 4} if small else {})),
    }
    roof_sources = {"mul": "probe:montmul_chain", "alu": "probe:keccak_mix_chain",
                    "hbm": "probe:stream"}
    if small:
        kernels = [
            _measure_ntt(256, 8, reps=2),
            _measure_keccak(n=256, reps=2),
            _measure_poseidon2(n=256, reps=2),
            _measure_poseidon2_sponge(n=256, reps=2),
            _measure_quotient(log_n=6, reps=2),
            _measure_fri_fold(log_h=8, reps=2),
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
            _measure_quotient(),
            _measure_fri_fold(),
            _measure_bitrev(),
        ]
    # achieved raw-op rates
    for k in kernels:
        k["achieved"] = {
            "mul": k["rate"] * k["ops"]["mul"],
            "alu": k["rate"] * k["ops"]["alu"],
        }
        if "bytes_per_call" in k:
            k["achieved"]["hbm"] = k["rate"] * k["bytes_per_call"]
    # roof lifting: a kernel beating the probe becomes the roof (see module
    # docstring #3) — guarantees sol <= 100% and records the evidence.
    # ONLY audited resources (mul/alu, counted from StableHLO) may lift:
    # hbm bytes are a per-kernel traffic MODEL, and a model that exceeds
    # the measured stream roof means the kernel ran (partly) VMEM-resident
    # and the model overstates its true HBM traffic — the kernel's hbm
    # score is dropped (flagged) instead of corrupting everyone's roof
    # (r5: the un-floored 16384x128 NTT "lifted" hbm to 1.24 TB/s this way).
    for res in ("mul", "alu"):
        for k in kernels:
            ach = k["achieved"].get(res, 0.0)
            if ach > roofs[res]:
                roofs[res] = ach
                roof_sources[res] = f"kernel:{k['kernel']}"
    for k in kernels:
        ach = k["achieved"].get("hbm", 0.0)
        if ach > roofs["hbm"]:
            del k["achieved"]["hbm"]
            k["hbm_model_exceeds_roof"] = (
                "modeled traffic > stream roof: execution is (partly) "
                "VMEM-resident, hbm model inapplicable at this shape"
            )
    for k in kernels:
        utils = {
            res: 100.0 * k["achieved"].get(res, 0.0) / roofs[res]
            for res in ("mul", "alu", "hbm")
            if k["achieved"].get(res, 0.0) > 0
        }
        if utils:
            k["binding"] = max(utils, key=utils.get)
            k["sol_pct"] = utils[k["binding"]]
        else:  # only resource was a dropped hbm model (VMEM-resident run)
            k["binding"] = "none"
            k["sol_pct"] = None
        k["utils"] = utils
        # de-circularize (VERDICT r3 weak #2): a kernel that ITSELF defines
        # a roof is reported as the roof's source, not as "100% SoL" — its
        # true headroom is unknown, only that nothing measured beats it
        k["roof_source_for"] = [
            res for res in ("mul", "alu", "hbm")
            if roof_sources[res] == f"kernel:{k['kernel']}"
        ]

    report = {
        "roofs": roofs,
        "roof_sources": roof_sources,
        "kernels": kernels,
        "dispatch_floor_ms": dispatch_floor() * 1e3,
    }
    print(
        f"device roofs: mul {roofs['mul']/1e9:.2f} Gop/s ({roof_sources['mul']}), "
        f"alu {roofs['alu']/1e9:.2f} Gop/s ({roof_sources['alu']}), "
        f"hbm {roofs['hbm']/1e9:.1f} GB/s ({roof_sources['hbm']}); "
        f"dispatch floor {dispatch_floor()*1e3:.1f} ms amortized below 5%"
    )
    for k in kernels:
        extra = "".join(
            f"  {key.split('_')[0]}={k[key]:.1f}"
            for key in ("melems_s", "mperm_s")
            if key in k
        )
        wl = " (while: audit undercounts)" if k["ops"].get("while_loops") else ""
        if k.get("hbm_model_exceeds_roof"):
            wl += " (hbm model>roof: VMEM-resident)"
        if k["roof_source_for"]:
            label = f"ROOF-SOURCE ({'/'.join(k['roof_source_for'])})"
            print(f"{k['kernel']:28s} {label}{extra}{wl}")
        elif k["sol_pct"] is None:
            print(f"{k['kernel']:28s}   n/a SoL{extra}{wl}")
        else:
            print(
                f"{k['kernel']:28s} {k['sol_pct']:5.1f}% SoL (binding "
                f"{k['binding']}){extra}{wl}"
            )
    return report


if __name__ == "__main__":
    import sys

    rep = run(small="--small" in sys.argv)
    print(json.dumps({"sol_report": {
        "roofs": rep["roofs"],
        "roof_sources": rep["roof_sources"],
        "kernels": [
            {kk: vv for kk, vv in k.items() if kk != "achieved"}
            for k in rep["kernels"]
        ],
    }}))
