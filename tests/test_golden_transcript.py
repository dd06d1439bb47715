"""Golden-transcript lock for the reference workload shape.

Locks the FULL Fiat-Shamir byte sequence (every challenger observation and
sample, in order) and the serialized proof bytes of the ``test_zk``-shaped
prove — fib_air n=8, zk, Keccak stack, SmallRng(seed=1) hiding randomness
(``/root/reference/native/src/fib_air.rs:27-75``) — for BOTH hiding layouts:

* ``zk_layout="tpu"`` — the round-1/2 layout (separate random-codeword round
  only);
* ``zk_layout="p3"`` — random columns appended to every hiding commit, per
  the shipped binary's ``add_random_cols`` evidence (docs/so_evidence.md §3).

Any change to field serialization, commitment layout, observation order,
sampling, FRI fold schedule, or proof serde breaks this test — the keystone
regression guard SURVEY.md par7.1 step 7 calls for.

Regenerate after an INTENTIONAL transcript change with:
    python tests/test_golden_transcript.py regen

See PARITY.md for the statement of which of these bytes are pinned to the
Rust stack by public vectors and which are locked only against this repo
(the p3 v0.4.2 crates are not retrievable in this environment).
"""

import json
import pathlib

import pytest

from tpu_stark.air.fibonacci import FibonacciAir, generate_trace_rows
from tpu_stark.challenger.challenger import Challenger
from tpu_stark.prover.config import create_config
from tpu_stark.prover.proof import deserialize_proof, serialize_proof
from tpu_stark.prover.prove import prove
from tpu_stark.prover.verify import verify

_DIR = pathlib.Path(__file__).parent / "golden"
GOLDEN = {
    "tpu": _DIR / "fib_air_zk_n8_smallrng.json",
    "p3": _DIR / "fib_air_zk_n8_smallrng_p3.json",
}


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


def _run_prove(layout):
    events = []
    cfg = create_config(
        zk=True, backend="cpu", zk_rng="smallrng", zk_layout=layout
    )
    cfg.challenger_factory = _recording_factory(events)
    trace = generate_trace_rows(0, 1, 8)
    proof = prove(cfg, FibonacciAir(), trace, [0, 1, 21])
    return events, serialize_proof(proof)


@pytest.mark.parametrize("layout", ["tpu", "p3"])
def test_full_transcript_matches_golden(layout):
    fixture = json.loads(GOLDEN[layout].read_text())
    events, blob = _run_prove(layout)

    want_events = fixture["events"]
    assert len(events) == len(want_events), (
        f"transcript length drift: {len(events)} events vs golden {len(want_events)}"
    )
    for i, (got, want) in enumerate(zip(events, want_events)):
        assert got == want, f"transcript event {i} drifted: {got} != {want}"
    assert blob.hex() == fixture["proof_hex"], "proof bytes drifted from golden"


@pytest.mark.parametrize("layout", ["tpu", "p3"])
def test_golden_proof_still_verifies(layout):
    """The checked-in bytes themselves verify (guards fixture rot)."""
    fixture = json.loads(GOLDEN[layout].read_text())
    proof = deserialize_proof(bytes.fromhex(fixture["proof_hex"]))
    cfg = create_config(
        zk=True, backend="cpu", zk_rng="smallrng", zk_layout=layout
    )
    assert verify(cfg, FibonacciAir(), proof, [0, 1, 21])


def test_layouts_diverge():
    """The two layouts must actually produce different commitments (the p3
    trace commitment covers 4 extra random columns)."""
    tpu_fix = json.loads(GOLDEN["tpu"].read_text())
    p3_fix = json.loads(GOLDEN["p3"].read_text())
    assert tpu_fix["proof_hex"] != p3_fix["proof_hex"]


def _regen():
    for layout, path in GOLDEN.items():
        events, blob = _run_prove(layout)
        path.write_text(
            json.dumps({"events": events, "proof_hex": blob.hex()})
        )
        print(f"wrote {path} ({len(events)} events, {len(blob)} proof bytes)")


if __name__ == "__main__":
    import sys

    assert sys.argv[1:] == ["regen"], "usage: python test_golden_transcript.py regen"
    _regen()
