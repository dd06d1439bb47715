"""Golden-transcript lock for the reference workload shape.

Locks the FULL Fiat-Shamir byte sequence (every challenger observation and
sample, in order) and the serialized proof bytes of the ``test_zk``-shaped
prove — fib_air n=8, zk, Keccak stack, SmallRng(seed=1) hiding randomness
(``/root/reference/native/src/fib_air.rs:27-75``).  Any change to field
serialization, commitment layout, observation order, sampling, FRI fold
schedule, or proof serde breaks this test — the keystone regression guard
SURVEY.md par7.1 step 7 calls for.

See PARITY.md for the statement of which of these bytes are pinned to the
Rust stack by public vectors and which are locked only against this repo
(the p3 v0.4.2 crates are not retrievable in this environment).
"""

import json
import pathlib

from tpu_stark.air.fibonacci import FibonacciAir, generate_trace_rows
from tpu_stark.challenger.challenger import Challenger
from tpu_stark.prover.config import create_config
from tpu_stark.prover.proof import deserialize_proof, serialize_proof
from tpu_stark.prover.prove import prove
from tpu_stark.prover.verify import verify

GOLDEN = pathlib.Path(__file__).parent / "golden" / "fib_air_zk_n8_smallrng.json"


def _recording_factory(events):
    class RecordingChallenger(Challenger):
        def observe_u32(self, value):
            events.append(["obs_u32", int(value)])
            super().observe_u32(value)

        def observe_commitment(self, digest):
            events.append(["obs_commit", [int(w) for w in digest]])
            super().observe_commitment(digest)

        def sample_u32(self):
            v = super().sample_u32()
            events.append(["sample_u32", int(v)])
            return v

        def clone(self):
            # clones (grind probes) must not record
            return Challenger(self.inner.clone())

    return RecordingChallenger


def test_full_transcript_matches_golden():
    fixture = json.loads(GOLDEN.read_text())
    events = []
    cfg = create_config(zk=True, backend="cpu", zk_rng="smallrng")
    cfg.challenger_factory = _recording_factory(events)
    trace = generate_trace_rows(0, 1, 8)
    proof = prove(cfg, FibonacciAir(), trace, [0, 1, 21])
    blob = serialize_proof(proof)

    want_events = fixture["events"]
    assert len(events) == len(want_events), (
        f"transcript length drift: {len(events)} events vs golden {len(want_events)}"
    )
    for i, (got, want) in enumerate(zip(events, want_events)):
        assert got == want, f"transcript event {i} drifted: {got} != {want}"
    assert blob.hex() == fixture["proof_hex"], "proof bytes drifted from golden"


def test_golden_proof_still_verifies():
    """The checked-in bytes themselves verify (guards fixture rot)."""
    fixture = json.loads(GOLDEN.read_text())
    proof = deserialize_proof(bytes.fromhex(fixture["proof_hex"]))
    cfg = create_config(zk=True, backend="cpu", zk_rng="smallrng")
    assert verify(cfg, FibonacciAir(), proof, [0, 1, 21])
