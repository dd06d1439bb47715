"""App API contract tests (the reference's JNI surface semantics,
lib.rs:37-179): success strings, panic containment, backend knob."""

from tpu_stark.app import api
from tpu_stark.backend import registry
import pytest


def setup_module():
    registry.set_backend("cpu")


def teardown_module():
    registry.set_backend("tpu")


def test_run_fib_air_zk_contract_string():
    out = api.run_fib_air_zk(n=8)
    assert out == "fib_air zk ok (n=8, x=21)"  # fib_air.rs:74 contract


@pytest.mark.slow  # second-stack CLI prove; stack smoke lives in test_uni_stark_poseidon2
def test_run_fib_air_zk_poseidon2():
    out = api.run_fib_air_zk(n=8, hash="poseidon2")
    assert out == "fib_air zk ok (n=8, x=21)"


def test_panic_containment():
    # invalid n (not a power of two) must not raise — panic containment
    out = api.run_fib_air_zk(n=7)
    assert out.startswith("fib_air zk panicked:")


def test_backend_knob_roundtrip():
    api.set_backend("interpret")
    assert registry.backend_kind().value == "interpret"
    api.set_backend("cpu")
    assert registry.backend_kind().value == "cpu"


def test_probe_never_raises():
    assert api.is_tpu_available() in (True, False)


def test_typo_alias_exports():
    """The reference ships misspelled forwarding exports (setBAckend /
    com_plonk3 path, lib.rs:148-164); the API mirrors them."""
    assert api.set_bAckend is api.set_backend
    assert api.setBAckend is api.set_backend


def test_profiler_trace_smoke(tmp_path):
    """bench/profiling.maybe_trace captures a device trace (SURVEY.md par5.1:
    the jax.profiler tier replacing the reference's VK timestamp pools)."""
    import os

    from tpu_stark.bench.profiling import env_trace_dir, maybe_trace

    trace_dir = str(tmp_path / "trace")
    with maybe_trace(trace_dir):
        api.run_fib_air_zk(n=8)
    found = []
    for root, _dirs, files in os.walk(trace_dir):
        found += [f for f in files if f.endswith(".xplane.pb")]
    assert found, "profiler produced no xplane trace"
    # no-op path adds nothing
    with maybe_trace(None):
        pass
    assert env_trace_dir() in (None, os.environ.get("TPU_STARK_PROFILE"))


def test_device_policy():
    """backend/policy.py: the device-adaptive policy point (SURVEY.md par5.6)
    resolves on any platform and its knobs are sane."""
    from tpu_stark.backend.policy import current_policy, describe

    p = current_policy()
    assert p.num_devices >= 1
    assert p.vmem_bytes >= 1 << 20
    assert 0 < p.sponge_vmem_in_budget <= p.vmem_bytes
    assert p.ntt_narrow_max_w >= 1
    assert p.fri_host_tail_log >= 0
    assert p.device_kind in describe() or p.platform in describe()
