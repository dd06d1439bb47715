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


class KeccakAir(BaseAir):
    width = COLS

    def eval(self, b: AirBuilder) -> None:
        local = b.main_row(0)
        nxt = b.main_row(1)
        f = local[F_OFF : F_OFF + NUM_ROUNDS]

        def xor2(u, v):
            return u + v - 2 * u * v

        # -- flags (scalar: only 24 columns) -------------------------------
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

        # -- booleanity (vectorized) ---------------------------------------
        for idx in (_A_IDX, _AP_IDX, _C_IDX, _CHI00_IDX):
            v = b.main_cols(0, idx)
            b.assert_zero(v * (v - 1))

        # -- theta parity: (sum_y a - c)(sum - c - 2)(sum - c - 4) ---------
        s = b.main_cols(0, _THETA_A[0])
        for y in range(1, 5):
            s = s + b.main_cols(0, _THETA_A[y])
        diff = s - b.main_cols(0, _C_IDX)
        b.assert_zero(diff * (diff - 2) * (diff - 4))

        # -- A' = a xor d ---------------------------------------------------
        d = xor2(b.main_cols(0, _D_LEFT), b.main_cols(0, _D_RIGHT))  # (320,)
        d_full = d.take(_D_EXPAND)  # lane-major (1600,)
        a_vec = b.main_cols(0, _A_IDX)
        b.assert_eq(b.main_cols(0, _AP_IDX), xor2(a_vec, d_full))

        # -- chi over the rho/pi relabeling of A' (vectorized) -------------
        b0 = b.main_cols(0, _CHI_B0)
        b1 = b.main_cols(0, _CHI_B1)
        b2 = b.main_cols(0, _CHI_B2)
        t = (1 - b1) * b2
        chi_vec = b0 + t - 2 * b0 * t  # (1600,) dst lane-major

        b.assert_eq(b.main_cols(0, _CHI00_IDX), chi_vec.take(np.arange(Z)))

        # -- round transition ----------------------------------------------
        not_last_round = 1 - f[NUM_ROUNDS - 1]
        gate = b.when_transition().when(not_last_round)
        # lane (0,0): iota — rc bit linear in flags (scalar loop over z)
        for z in range(Z):
            rc = None
            for r in range(NUM_ROUNDS):
                if (ROUND_CONSTANTS[r] >> z) & 1:
                    rc = f[r] if rc is None else rc + f[r]
            out00 = local[CHI00_OFF + z]
            if rc is None:
                gate.assert_eq(nxt[_a_col(0, z)], out00)
            else:
                gate.assert_eq(nxt[_a_col(0, z)], xor2(out00, rc))
        # remaining lanes in one vector constraint
        gate.assert_eq(
            b.main_cols(1, _A_IDX[Z:]), chi_vec.take(np.arange(Z, LANES * Z))
        )


# ---------------------------------------------------------------------------
# Trace generation (vectorized bit expansion over permutations)
# ---------------------------------------------------------------------------
def generate_trace(num_perms: int, seed: int = 0) -> np.ndarray:
    """(num_perms * 24, COLS) canonical uint32 trace of random permutations.
    num_perms * 24 is padded... the caller must make the height a power of two
    by choosing num_perms accordingly is NOT possible (24 ∤ 2^k): the last
    partial permutation window is simply truncated — rows after the final
    flag_23 row restart mid-chain, which the AIR permits (fresh input rows).
    """
    rng = np.random.default_rng(seed)
    n_rows_pow2 = 1 << (int(np.ceil(np.log2(max(num_perms * NUM_ROUNDS, 2)))))
    total_perms = (n_rows_pow2 + NUM_ROUNDS - 1) // NUM_ROUNDS
    trace = np.zeros((n_rows_pow2, COLS), dtype=np.uint32)

    row = 0
    for p in range(total_perms):
        state = [int(x) for x in rng.integers(0, 1 << 64, size=LANES, dtype=np.uint64)]
        for r in range(NUM_ROUNDS):
            if row >= n_rows_pow2:
                break
            _fill_row(trace[row], r, state)
            state = _one_round(state, r)
            row += 1
    return trace


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
