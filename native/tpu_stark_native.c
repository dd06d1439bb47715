/* tpu_stark native runtime helpers (C99, no dependencies).
 *
 * The TPU compute path is JAX/XLA/Pallas; these are the *host tails* that are
 * sequential and bit-exactness-critical (SURVEY.md par2.2: "C++ where bit-exact
 * sequential native code is the right tool (Keccak-f, Fiat-Shamir transcript,
 * SmallRng...)"):
 *
 *  - Xoshiro256++ (rand 0.9 SmallRng, 64-bit) with SplitMix64 seeding —
 *    bulk BabyBear rejection sampling for hiding salts / randomizers
 *    (the python loop is the hiding-commit bottleneck at 2^20 rows).
 *  - Keccak-f[1600] + Keccak-256 (original 0x01 padding) — the Fiat-Shamir
 *    transcript hash and per-query Merkle path verification.
 *
 * Exposed with plain C ABI for ctypes (no pybind11 in this environment).
 */

#include <stdint.h>
#include <stddef.h>
#include <string.h>

#define EXPORT __attribute__((visibility("default")))

/* ------------------------------------------------------------------ */
/* Xoshiro256++                                                        */
/* ------------------------------------------------------------------ */
static inline uint64_t rotl64(uint64_t x, int k) {
    return (x << k) | (x >> (64 - k));
}

EXPORT void ts_xoshiro_seed(uint64_t seed, uint64_t state[4]) {
    uint64_t x = seed;
    for (int i = 0; i < 4; i++) {
        x += 0x9E3779B97F4A7C15ULL;
        uint64_t z = x;
        z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
        z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
        state[i] = z ^ (z >> 31);
    }
}

static inline uint64_t xo_next(uint64_t s[4]) {
    uint64_t result = rotl64(s[0] + s[3], 23) + s[0];
    uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl64(s[3], 45);
    return result;
}

#define BABYBEAR_P 0x78000001u

/* rand's Xoshiro256PlusPlus::next_u32 takes the HIGH word; p3's BabyBear
 * StandardUniform draws next_u32() >> 1 with rejection, value = Monty form. */
EXPORT void ts_xoshiro_fill_babybear(uint64_t state[4], uint32_t *out,
                                     size_t n) {
    for (size_t i = 0; i < n; i++) {
        for (;;) {
            uint32_t v = (uint32_t)(xo_next(state) >> 32) >> 1;
            if (v < BABYBEAR_P) {
                out[i] = v;
                break;
            }
        }
    }
}

EXPORT uint64_t ts_xoshiro_next_u64(uint64_t state[4]) { return xo_next(state); }

/* ------------------------------------------------------------------ */
/* Keccak                                                              */
/* ------------------------------------------------------------------ */
static const uint64_t RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808AULL,
    0x8000000080008000ULL, 0x000000000000808BULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008AULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000AULL,
    0x000000008000808BULL, 0x800000000000008BULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800AULL, 0x800000008000000AULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

static const int ROT[25] = {0,  1,  62, 28, 27, 36, 44, 6,  55, 20, 3,  10, 43,
                            25, 39, 41, 45, 15, 21, 8,  18, 2,  61, 56, 14};

EXPORT void ts_keccakf(uint64_t a[25]) {
    uint64_t b[25], c[5], d[5];
    for (int round = 0; round < 24; round++) {
        for (int x = 0; x < 5; x++)
            c[x] = a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20];
        for (int x = 0; x < 5; x++)
            d[x] = c[(x + 4) % 5] ^ rotl64(c[(x + 1) % 5], 1);
        for (int i = 0; i < 25; i++) a[i] ^= d[i % 5];
        for (int x = 0; x < 5; x++)
            for (int y = 0; y < 5; y++) {
                int src = x + 5 * y;
                b[y + 5 * ((2 * x + 3 * y) % 5)] =
                    ROT[src] ? rotl64(a[src], ROT[src]) : a[src];
            }
        for (int i = 0; i < 25; i++) {
            int y5 = (i / 5) * 5;
            a[i] = b[i] ^ ((~b[y5 + (i + 1) % 5]) & b[y5 + (i + 2) % 5]);
        }
        a[0] ^= RC[round];
    }
}

EXPORT void ts_keccak256(const uint8_t *data, size_t len, uint8_t out[32]) {
    uint64_t state[25];
    memset(state, 0, sizeof(state));
    const size_t rate = 136;
    size_t off = 0;
    while (len - off >= rate) {
        for (size_t i = 0; i < rate / 8; i++) {
            uint64_t w;
            memcpy(&w, data + off + 8 * i, 8);
            state[i] ^= w; /* little-endian host assumed (x86/arm64) */
        }
        ts_keccakf(state);
        off += rate;
    }
    uint8_t block[136];
    memset(block, 0, sizeof(block));
    memcpy(block, data + off, len - off);
    block[len - off] ^= 0x01;
    block[rate - 1] ^= 0x80;
    for (size_t i = 0; i < rate / 8; i++) {
        uint64_t w;
        memcpy(&w, block + 8 * i, 8);
        state[i] ^= w;
    }
    ts_keccakf(state);
    memcpy(out, state, 32);
}

/* Batched u64-item padding-free sponge (rate 17, out 4) for host-side
 * Merkle verification of many openings. */
EXPORT void ts_sponge_u64(const uint64_t *items, size_t n, uint64_t out[4]) {
    uint64_t state[25];
    memset(state, 0, sizeof(state));
    size_t off = 0;
    while (off < n) {
        size_t chunk = n - off < 17 ? n - off : 17;
        for (size_t i = 0; i < chunk; i++) state[i] = items[off + i];
        ts_keccakf(state);
        off += chunk;
    }
    memcpy(out, state, 32);
}
