"""Fiat-Shamir transcript: HashChallenger + SerializingChallenger32.

Host-side, byte-exact rebuild of the reference's challenger stack
(``/root/reference/native/src/fib_air.rs:6,53,66``):
``SerializingChallenger32<BabyBear, HashChallenger<u8, Keccak256Hash, 32>>``.

Semantics follow p3-challenger:

* ``HashChallenger`` keeps an input buffer and an output buffer.  ``observe``
  invalidates buffered output and appends to the input.  ``sample`` refills by
  hashing the input buffer when the output is empty; the digest becomes both
  the new output buffer and the new input buffer (chaining).  Bytes are popped
  from the **end** of the output buffer.
* ``SerializingChallenger32`` observes field elements as canonical-u32
  little-endian bytes, observes [u64; 4] commitments as little-endian bytes,
  and samples field elements by rejection: draw 4 bytes -> LE u32, mask to
  log2_ceil(p) = 31 bits, retry until < p.
* ``sample_bits(b)`` = low b bits of a sampled element's canonical value.
* ``grind(bits)`` searches the proof-of-work witness (FRI PoW,
  SURVEY.md par3.1); ``check_witness`` is the verifier side.

This is intentionally sequential scalar code — the transcript is a latency
tail, not a throughput kernel (SURVEY.md par7.2).  The one exception is
``grind``: at production proof_of_work_bits the witness search is a
throughput problem, so it dispatches to the device-batched vectorized search
in ``grind.py`` (chunked Keccak over candidate witnesses) and keeps the
scalar loop only as the low-bits fast path and differential oracle.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

from ..fields import babybear as bb
from ..hash.keccak import keccak256

_MASK31 = (1 << 31) - 1


class HashChallenger:
    """Byte challenger over Keccak-256 (p3 HashChallenger<u8, Keccak256Hash, 32>)."""

    def __init__(self, initial: bytes = b""):
        self._input = bytearray(initial)
        self._output = bytearray()

    def observe_byte(self, b: int) -> None:
        self._output.clear()
        self._input.append(b & 0xFF)

    def observe_bytes(self, bs: bytes | Iterable[int]) -> None:
        self._output.clear()
        self._input.extend(bytes(bs))

    def _flush(self) -> None:
        digest = keccak256(bytes(self._input))
        self._input = bytearray(digest)  # chaining value
        self._output = bytearray(digest)

    def sample_byte(self) -> int:
        if not self._output:
            self._flush()
        return self._output.pop()  # pops from the END

    def clone(self) -> "HashChallenger":
        c = HashChallenger()
        c._input = bytearray(self._input)
        c._output = bytearray(self._output)
        return c


class Challenger:
    """SerializingChallenger32 over BabyBear (values in canonical u32 form)."""

    def __init__(self, inner: HashChallenger | None = None):
        self.inner = inner if inner is not None else HashChallenger()

    def clone(self) -> "Challenger":
        return Challenger(self.inner.clone())

    # -- observe -----------------------------------------------------------
    def observe_u32(self, value: int) -> None:
        """Observe a field element by canonical u32 (LE bytes)."""
        self.inner.observe_bytes(int(value).to_bytes(4, "little"))

    def observe_u32s(self, values: Sequence[int]) -> None:
        for v in values:
            self.observe_u32(int(v))

    def observe_commitment(self, digest: Tuple[int, int, int, int]) -> None:
        """Observe a [u64; 4] hash as little-endian bytes."""
        for w in digest:
            self.inner.observe_bytes(int(w).to_bytes(8, "little"))

    # -- sample ------------------------------------------------------------
    def sample_u32(self) -> int:
        """Rejection-sample a canonical BabyBear value (31-bit mask)."""
        while True:
            bs = bytes(self.inner.sample_byte() for _ in range(4))
            v = int.from_bytes(bs, "little") & _MASK31
            if v < bb.P:
                return v

    def sample_ext(self) -> Tuple[int, int, int, int]:
        """Sample a BabyBear^4 element: 4 base coefficients in order."""
        return tuple(self.sample_u32() for _ in range(4))  # type: ignore[return-value]

    def sample_bits(self, bits: int) -> int:
        return self.sample_u32() & ((1 << bits) - 1)

    # -- proof of work (FRI grinding) --------------------------------------
    def check_witness(self, bits: int, witness: int) -> bool:
        self.observe_u32(witness)
        return self.sample_bits(bits) == 0

    def grind(self, bits: int) -> int:
        """Find the smallest canonical witness passing check_witness.  The
        verifier only re-checks the shipped witness, so the search order is
        free; smallest-first makes proofs deterministic (the reference's rayon
        ``find_any`` is not).

        Dispatch: bits >= _GRIND_DEVICE_MIN_BITS runs the device-batched
        vectorized search (grind.py) — one jitted Keccak over a whole chunk of
        candidates; below that (or TPU_STARK_GRIND=host) the expected scalar
        work (~2^bits hashes) is cheaper than a device dispatch."""
        import os

        mode = os.environ.get("TPU_STARK_GRIND", "")
        use_device = mode != "host" and (bits >= _GRIND_DEVICE_MIN_BITS or mode == "device")
        if use_device:
            from .grind import device_grind

            w = device_grind(
                bytes(self.inner._input),
                bits,
                host_check=lambda cand: self.clone().check_witness(bits, cand),
            )
            if w is not None:
                self.observe_u32(w)
                assert self.sample_bits(bits) == 0
                return w
        for w in range(bb.P):
            if self.clone().check_witness(bits, w):
                self.observe_u32(w)
                assert self.sample_bits(bits) == 0
                return w
        raise RuntimeError("grinding failed (unreachable)")


# Below this, a chunked device search costs more in dispatch than ~2^bits
# scalar hashes; measured crossover is a few bits on CPU-jax, higher on the
# tunneled TPU — 6 keeps the test config (1 bit) scalar on every backend.
_GRIND_DEVICE_MIN_BITS = 6
