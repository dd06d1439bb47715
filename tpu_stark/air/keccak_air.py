"""Keccak-f[1600] permutation AIR (BASELINE config 4: 2^20 trace,
extension-field challenges).

One trace row per Keccak round; 24 consecutive rows prove one permutation
(the p3 keccak-air shape, rebuilt lean).  Bits are field elements in {0, 1};
xor algebra:  a xor b  =  a + b - 2ab.

Columns (24 + 1600 + 320 + 1600 + 64 = 3608):

  f[24]               round step flags (one-hot, rotating)
  a[5][5][64]         state bits at round input (x, y, z), flat x*320+y*64+z? —
                      layout: index (y, x, z) flattened as (x + 5y)*64 + z
  c[5][64]            theta parity witness per column x
  ap[5][5][64]        A' = a xor d  (post-theta state, pre-rho/pi)
  chi00[64]           chi output of lane (0,0) (pre-iota witness)

Constraints (all degree <= 4):
  * flags: boolean, one-hot init on first row, rotation on transitions
  * a, c, ap, chi00 boolean
  * theta parity:  (sum_y a[x][y][z] - c) * (sum - c - 2) * (sum - c - 4) = 0
  * ap def:        ap = a + d - 2 a d,   d[x][z] = c[x-1][z] xor c[x+1][z-1]
  * chi00 def:     chi00[z] = B[0,0,z] xor (~B[1,0,z] & B[2,0,z]) where B is
                   the rho/pi relabeling of ap (a pure index map)
  * round transition (rows 0..22 -> next): next.a = chi(B) for lanes != (0,0);
                   next.a[0,0] = chi00 xor rc_bit (rc linear in flags)

The first row of each permutation (flag_0 = 1 after a flag_23 row) carries an
unconstrained fresh input — the AIR proves every 24-row window is a valid
Keccak-f computation.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..hash.keccak import ROUND_CONSTANTS, _ROT
from .air import AirBuilder, BaseAir

NUM_ROUNDS = 24
LANES = 25
Z = 64

F_OFF = 0
A_OFF = NUM_ROUNDS
C_OFF = A_OFF + LANES * Z
AP_OFF = C_OFF + 5 * Z
CHI00_OFF = AP_OFF + LANES * Z
COLS = CHI00_OFF + Z

# rho/pi: B[dst] = rot(ap[src]); dst lane (x2 + 5*y2) with x2 = y, y2 = (2x+3y)%5
_PI_SRC = np.zeros(LANES, dtype=np.int64)
_PI_ROT = np.zeros(LANES, dtype=np.int64)
for _x in range(5):
    for _y in range(5):
        _dst = _y + 5 * ((2 * _x + 3 * _y) % 5)
        _PI_SRC[_dst] = _x + 5 * _y
        _PI_ROT[_dst] = _ROT[_x + 5 * _y]


def _a_col(lane: int, z: int) -> int:
    return A_OFF + lane * Z + z


def _c_col(x: int, z: int) -> int:
    return C_OFF + x * Z + z


def _ap_col(lane: int, z: int) -> int:
    return AP_OFF + lane * Z + z


# Precomputed column-index vectors for the vectorized constraint pass.
_A_IDX = np.array([_a_col(l, z) for l in range(LANES) for z in range(Z)])
_AP_IDX = np.array([_ap_col(l, z) for l in range(LANES) for z in range(Z)])
_C_IDX = np.array([_c_col(x, z) for x in range(5) for z in range(Z)])
_CHI00_IDX = np.array([CHI00_OFF + z for z in range(Z)])
# theta: flat (x, z) order
_THETA_A = [
    np.array([_a_col(x + 5 * y, z) for x in range(5) for z in range(Z)])
    for y in range(5)
]
_D_LEFT = np.array(
    [_c_col((x - 1) % 5, z) for x in range(5) for z in range(Z)]
)
_D_RIGHT = np.array(
    [_c_col((x + 1) % 5, (z - 1) % Z) for x in range(5) for z in range(Z)]
)
# expand (x, z) -> lane-major (lane, z)
_D_EXPAND = np.array([(l % 5) * Z + z for l in range(LANES) for z in range(Z)])


def _chi_operand_idx(k: int):
    """ap column index feeding chi operand B[x+k] at each dst (lane, z)."""
    out = []
    for dst in range(LANES):
        y5 = (dst // 5) * 5
        x = dst % 5
        src_dst = y5 + (x + k) % 5
        src = int(_PI_SRC[src_dst])
        rot = int(_PI_ROT[src_dst])
        for z in range(Z):
            out.append(_ap_col(src, (z - rot) % Z))
    return np.array(out)


_CHI_B0 = _chi_operand_idx(0)
_CHI_B1 = _chi_operand_idx(1)
_CHI_B2 = _chi_operand_idx(2)


def _xor2(u, v):
    return u + v - 2 * u * v


class Partition:
    """One column-partitioned slice of the AIR's constraint sequence.

    The canonical ``eval`` is the ordered concatenation of every partition's
    ``eval`` — prover (vectorized, possibly streamed per partition) and
    verifier (at zeta) replay the identical constraint order.  ``local_cols``
    / ``next_cols`` are the exact global column footprint, so a streaming
    prover (prover/wide.py) can low-degree-extend ONLY those columns per
    partition instead of materializing the full (quotient-domain x width)
    trace — the wide-AIR analog of SURVEY.md par7.2's streaming note.

    ``key`` groups partitions whose ``eval`` bodies are structurally
    identical once columns are addressed by POSITION in ``local_cols`` /
    ``next_cols`` (which therefore use a class-canonical order, not
    sorted-unique): the streamed quotient compiles ONE program per key and
    reuses it across instances — on a tunneled TPU every extra compile is
    a multi-second remote round trip, so 47 per-partition programs vs ~10
    per-class programs is minutes of cold-start."""

    def __init__(self, name, local_cols, next_cols, eval_fn, key=None):
        self.name = name
        self.local_cols = np.asarray(local_cols, dtype=np.int64)
        self.next_cols = np.asarray(next_cols, dtype=np.int64)
        assert len(set(self.local_cols.tolist())) == len(self.local_cols)
        assert len(set(self.next_cols.tolist())) == len(self.next_cols)
        self.eval = eval_fn
        self.key = key if key is not None else name


def _p_flags(b: AirBuilder) -> None:
    local = b.main_row(0)
    nxt = b.main_row(1)
    f = local[F_OFF : F_OFF + NUM_ROUNDS]
    first = b.when_first_row()
    first.assert_eq(f[0], 1)
    for r in range(1, NUM_ROUNDS):
        first.assert_zero(f[r])
    for r in range(NUM_ROUNDS):
        b.assert_zero(f[r] * (f[r] - 1))
    tot = f[0]
    for r in range(1, NUM_ROUNDS):
        tot = tot + f[r]
    b.assert_eq(tot, 1)
    trans = b.when_transition()
    nf = nxt[F_OFF : F_OFF + NUM_ROUNDS]
    for r in range(NUM_ROUNDS):
        trans.assert_eq(nf[r], f[(r - 1) % NUM_ROUNDS])


def _p_bool(idx):
    def fn(b: AirBuilder) -> None:
        v = b.main_cols(0, idx)
        b.assert_zero(v * (v - 1))

    return fn


def _p_theta(x: int):
    a_rows = [
        np.array([_a_col(x + 5 * y, z) for z in range(Z)]) for y in range(5)
    ]
    c_row = np.array([_c_col(x, z) for z in range(Z)])

    def fn(b: AirBuilder) -> None:
        s = b.main_cols(0, a_rows[0])
        for y in range(1, 5):
            s = s + b.main_cols(0, a_rows[y])
        diff = s - b.main_cols(0, c_row)
        b.assert_zero(diff * (diff - 2) * (diff - 4))

    return fn, np.concatenate(a_rows + [c_row])


def _p_apdef(x: int):
    lanes = [x + 5 * y for y in range(5)]
    a_idx = np.array([_a_col(l, z) for l in lanes for z in range(Z)])
    ap_idx = np.array([_ap_col(l, z) for l in lanes for z in range(Z)])
    d_left = np.array([_c_col((x - 1) % 5, z) for z in range(Z)])
    d_right = np.array([_c_col((x + 1) % 5, (z - 1) % Z) for z in range(Z)])
    tile = np.tile(np.arange(Z), 5)

    def fn(b: AirBuilder) -> None:
        d = _xor2(b.main_cols(0, d_left), b.main_cols(0, d_right))  # (64,)
        d_full = d.take(tile)  # (320,) lane-major over this x's 5 lanes
        a_vec = b.main_cols(0, a_idx)
        b.assert_eq(b.main_cols(0, ap_idx), _xor2(a_vec, d_full))

    cols = np.concatenate([a_idx, ap_idx, d_left, d_right])
    return fn, cols


def _chi_at(b: AirBuilder, dst: int):
    """chi output vector (64,) for destination lane ``dst`` from A'."""
    sl = slice(dst * Z, (dst + 1) * Z)
    b0 = b.main_cols(0, _CHI_B0[sl])
    b1 = b.main_cols(0, _CHI_B1[sl])
    b2 = b.main_cols(0, _CHI_B2[sl])
    t = (1 - b1) * b2
    return b0 + t - 2 * b0 * t


def _p_chi00def(b: AirBuilder) -> None:
    b.assert_eq(b.main_cols(0, _CHI00_IDX), _chi_at(b, 0))


def _p_iota(b: AirBuilder) -> None:
    local = b.main_row(0)
    nxt = b.main_row(1)
    f = local[F_OFF : F_OFF + NUM_ROUNDS]
    gate = b.when_transition().when(1 - f[NUM_ROUNDS - 1])
    for z in range(Z):
        rc = None
        for r in range(NUM_ROUNDS):
            if (ROUND_CONSTANTS[r] >> z) & 1:
                rc = f[r] if rc is None else rc + f[r]
        out00 = local[CHI00_OFF + z]
        if rc is None:
            gate.assert_eq(nxt[_a_col(0, z)], out00)
        else:
            gate.assert_eq(nxt[_a_col(0, z)], _xor2(out00, rc))


def _p_trans(dst: int):
    next_idx = np.array([_a_col(dst, z) for z in range(Z)])

    def fn(b: AirBuilder) -> None:
        f_last = b.main_row(0)[F_OFF + NUM_ROUNDS - 1]
        gate = b.when_transition().when(1 - f_last)
        gate.assert_eq(b.main_cols(1, next_idx), _chi_at(b, dst))

    sl = slice(dst * Z, (dst + 1) * Z)
    local = np.concatenate(
        [[F_OFF + NUM_ROUNDS - 1], _CHI_B0[sl], _CHI_B1[sl], _CHI_B2[sl]]
    )
    return fn, local, next_idx


def _build_partitions() -> List[Partition]:
    # Column orders are CLASS-CANONICAL (group concatenation, no
    # sorted-unique): every instance of a class maps each eval access to the
    # same positions in its panel, so the streamed quotient's per-class
    # program (keyed on ``Partition.key``) is reused across instances.
    f_idx = np.arange(F_OFF, F_OFF + NUM_ROUNDS)
    parts = [Partition("flags", f_idx, f_idx, _p_flags)]
    for g in range(5):  # booleanity of a, 5 consecutive lanes per partition
        idx = _A_IDX[g * 5 * Z : (g + 1) * 5 * Z]
        parts.append(Partition(f"bool_a{g}", idx, [], _p_bool(idx), "bool320"))
    for g in range(5):
        idx = _AP_IDX[g * 5 * Z : (g + 1) * 5 * Z]
        parts.append(Partition(f"bool_ap{g}", idx, [], _p_bool(idx), "bool320"))
    idx = np.concatenate([_C_IDX, _CHI00_IDX])
    parts.append(Partition("bool_c_chi", idx, [], _p_bool(idx)))
    for x in range(5):
        fn, cols = _p_theta(x)
        parts.append(Partition(f"theta{x}", cols, [], fn, "theta"))
    for x in range(5):
        fn, cols = _p_apdef(x)
        parts.append(Partition(f"apdef{x}", cols, [], fn, "apdef"))
    chi_cols = np.concatenate(
        [_CHI_B0[:Z], _CHI_B1[:Z], _CHI_B2[:Z], _CHI00_IDX]
    )
    parts.append(Partition("chi00def", chi_cols, [], _p_chi00def))
    parts.append(
        Partition(
            "iota",
            np.concatenate([f_idx, _CHI00_IDX]),
            np.array([_a_col(0, z) for z in range(Z)]),
            _p_iota,
        )
    )
    for dst in range(1, LANES):
        fn, local, nxt = _p_trans(dst)
        parts.append(Partition(f"trans{dst}", local, nxt, fn, "trans"))
    return parts


_PARTITIONS: List[Partition] = _build_partitions()


class KeccakAir(BaseAir):
    width = COLS

    def partitions(self) -> List[Partition]:
        return _PARTITIONS

    def eval(self, b: AirBuilder) -> None:
        for part in _PARTITIONS:
            part.eval(b)


# ---------------------------------------------------------------------------
# Trace generation (vectorized bit expansion over permutations)
# ---------------------------------------------------------------------------
def generate_trace(num_perms: int, seed: int = 0, dtype=np.uint32) -> np.ndarray:
    """(next_pow2(num_perms * 24), COLS) canonical trace of random
    permutations.  24 ∤ 2^k, so the final partial permutation window is
    truncated — rows after the last flag_23 row restart mid-chain, which the
    AIR permits (fresh-input rows).

    All values are bits; pass ``dtype=np.uint8`` for the streaming prover's
    compact host/device trace (prover/wide.py) — 1/4 the bytes at 2^20 rows
    (0.9 GB vs 15 GB makes the difference between fitting in HBM and not).

    Vectorized over permutations: one u64 numpy Keccak round for every window
    at once, then a broadcast bit-unpack straight into the trace buffer.
    """
    rng = np.random.default_rng(seed)
    n_rows = 1 << (int(np.ceil(np.log2(max(num_perms * NUM_ROUNDS, 2)))))
    n_perms = (n_rows + NUM_ROUNDS - 1) // NUM_ROUNDS
    trace = np.zeros((n_perms * NUM_ROUNDS, COLS), dtype=dtype)
    states = rng.integers(0, 1 << 64, size=(n_perms, LANES), dtype=np.uint64)
    zbits = np.arange(Z, dtype=np.uint64)

    def unpack(vals: np.ndarray) -> np.ndarray:
        # (P, k) u64 -> (P, k*Z) bits, z minor
        return ((vals[:, :, None] >> zbits) & 1).reshape(n_perms, -1)

    rows = np.arange(n_perms) * NUM_ROUNDS
    for r in range(NUM_ROUNDS):
        trace[rows + r, F_OFF + r] = 1
        trace[rows + r, A_OFF : A_OFF + LANES * Z] = unpack(states)
        c = (
            states[:, 0:5]
            ^ states[:, 5:10]
            ^ states[:, 10:15]
            ^ states[:, 15:20]
            ^ states[:, 20:25]
        )
        trace[rows + r, C_OFF : C_OFF + 5 * Z] = unpack(c)
        c1 = c[:, [(x + 1) % 5 for x in range(5)]]
        d = c[:, [(x - 1) % 5 for x in range(5)]] ^ ((c1 << np.uint64(1)) | (c1 >> np.uint64(63)))
        ap = states ^ d[:, [l % 5 for l in range(LANES)]]
        trace[rows + r, AP_OFF : AP_OFF + LANES * Z] = unpack(ap)
        src = ap[:, _PI_SRC]
        rot = _PI_ROT.astype(np.uint64)
        bmat = (src << rot) | (src >> ((Z - rot) % Z))
        chi00 = bmat[:, 0] ^ (~bmat[:, 1] & bmat[:, 2])
        trace[rows + r, CHI00_OFF : CHI00_OFF + Z] = unpack(chi00[:, None])
        # advance every window one round (chi + iota on all lanes)
        out = np.empty_like(bmat)
        for i in range(LANES):
            out[:, i] = bmat[:, i] ^ (
                ~bmat[:, (i // 5) * 5 + (i + 1) % 5]
                & bmat[:, (i // 5) * 5 + (i + 2) % 5]
            )
        out[:, 0] ^= np.uint64(ROUND_CONSTANTS[r])
        states = out
    return trace[:n_rows]


def _one_round(state: List[int], r: int) -> List[int]:
    U64 = (1 << 64) - 1
    a = list(state)
    c = [a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20] for x in range(5)]
    d = [
        c[(x - 1) % 5] ^ (((c[(x + 1) % 5] << 1) | (c[(x + 1) % 5] >> 63)) & U64)
        for x in range(5)
    ]
    a = [a[i] ^ d[i % 5] for i in range(LANES)]
    bb_ = [0] * LANES
    for dst in range(LANES):
        src = int(_PI_SRC[dst])
        rot = int(_PI_ROT[dst])
        v = a[src]
        bb_[dst] = ((v << rot) | (v >> (64 - rot))) & U64
    out = [
        bb_[i] ^ ((~bb_[(i // 5) * 5 + (i + 1) % 5]) & U64 & bb_[(i // 5) * 5 + (i + 2) % 5])
        for i in range(LANES)
    ]
    out[0] ^= ROUND_CONSTANTS[r]
    return out


def _fill_row(row: np.ndarray, r: int, state: List[int]) -> None:
    row[F_OFF + r] = 1
    bits = np.zeros(LANES * Z, dtype=np.uint32)
    for lane in range(LANES):
        v = state[lane]
        for z in range(Z):
            bits[lane * Z + z] = (v >> z) & 1
    row[A_OFF : A_OFF + LANES * Z] = bits
    # theta parity
    for x in range(5):
        cx = state[x] ^ state[x + 5] ^ state[x + 10] ^ state[x + 15] ^ state[x + 20]
        for z in range(Z):
            row[_c_col(x, z)] = (cx >> z) & 1
    # post-theta
    U64 = (1 << 64) - 1
    c = [state[x] ^ state[x + 5] ^ state[x + 10] ^ state[x + 15] ^ state[x + 20] for x in range(5)]
    d = [
        c[(x - 1) % 5] ^ (((c[(x + 1) % 5] << 1) | (c[(x + 1) % 5] >> 63)) & U64)
        for x in range(5)
    ]
    ap = [state[i] ^ d[i % 5] for i in range(LANES)]
    for lane in range(LANES):
        for z in range(Z):
            row[_ap_col(lane, z)] = (ap[lane] >> z) & 1
    # chi on lane (0,0) pre-iota
    bb_ = [0] * LANES
    for dst in range(LANES):
        src = int(_PI_SRC[dst])
        rot = int(_PI_ROT[dst])
        v = ap[src]
        bb_[dst] = ((v << rot) | (v >> (64 - rot))) & U64
    chi00 = bb_[0] ^ ((~bb_[1]) & U64 & bb_[2])
    for z in range(Z):
        row[CHI00_OFF + z] = (chi00 >> z) & 1
