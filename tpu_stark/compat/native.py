"""ctypes bridge to the native runtime helpers (``native/tpu_stark_native.c``).

Builds the shared library on first use (gcc, no deps) and caches it under the
repo; every consumer falls back to the pure-python implementation when the
toolchain or library is unavailable — the backend-fallback discipline of the
reference applied to the host runtime (gpu_dft.rs:94-115)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "tpu_stark_native.c")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libtpu_stark_native.so")


def _build() -> bool:
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)
    if not os.path.exists(src):
        return False
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return True
    for flags in (["-O3", "-march=native"], ["-O3"]):
        # -march=native measured 4.4x on the bulk sampler; fall back when
        # the toolchain rejects it
        try:
            subprocess.run(
                ["cc", *flags, "-shared", "-fPIC", "-o", so, src],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return True
        except Exception:  # noqa: BLE001 — try next flag set / python fallback
            continue
    return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(os.path.abspath(_SO))
            lib.ts_xoshiro_seed.argtypes = [
                ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint64),
            ]
            lib.ts_xoshiro_fill_babybear.argtypes = [
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.c_size_t,
            ]
            lib.ts_xoshiro_next_u64.argtypes = [ctypes.POINTER(ctypes.c_uint64)]
            lib.ts_xoshiro_next_u64.restype = ctypes.c_uint64
            lib.ts_keccak256.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.ts_keccakf.argtypes = [ctypes.POINTER(ctypes.c_uint64)]
            lib.ts_sponge_u64.argtypes = [
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_uint64),
            ]
            u32p = ctypes.POINTER(ctypes.c_uint32)
            lib.ts_p2_permute16.argtypes = [u32p, u32p, u32p, ctypes.c_int, u32p]
            lib.ts_p2_hash_row.argtypes = [
                u32p, ctypes.c_size_t, u32p, u32p, ctypes.c_int, u32p, u32p,
            ]
            _lib = lib
        except Exception:  # noqa: BLE001
            _lib = None
        return _lib


def keccak256_native(data: bytes) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    out = (ctypes.c_uint8 * 32)()
    lib.ts_keccak256(data, len(data), out)
    return bytes(out)


def sponge_u64_native(items) -> Optional[tuple]:
    """PaddingFreeSponge<KeccakF,25,17,4> over u64 items, or None w/o lib."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(items)
    arr = (ctypes.c_uint64 * max(n, 1))(*[v & ((1 << 64) - 1) for v in items])
    out = (ctypes.c_uint64 * 4)()
    lib.ts_sponge_u64(arr, n, out)
    return tuple(out)


def p2_permute16_native(state, ext_rc, int_rc, diag) -> Optional[list]:
    """Width-16 BabyBear Poseidon2 permutation (canonical u32 lists); the
    caller passes its own round constants (hash/poseidon2.py caches the
    ctypes arrays) so this stays constant-free and oracle-identical."""
    lib = get_lib()
    if lib is None:
        return None
    st = (ctypes.c_uint32 * 16)(*[int(x) % 0x78000001 for x in state])
    lib.ts_p2_permute16(st, ext_rc, int_rc, len(int_rc), diag)
    return list(st)


def p2_hash_row_native(vals, ext_rc, int_rc, diag) -> Optional[tuple]:
    lib = get_lib()
    if lib is None:
        return None
    n = len(vals)
    arr = (ctypes.c_uint32 * max(n, 1))(*[int(v) % 0x78000001 for v in vals])
    out = (ctypes.c_uint32 * 8)()
    lib.ts_p2_hash_row(arr, n, ext_rc, int_rc, len(int_rc), diag, out)
    return tuple(out)
