"""Differential tests for the MXU 4-step NTT (tpu_stark/ntt/mxu_ntt.py).

The MXU path is on the prove critical path for tall-narrow matrices
(radix2._use_mxu_narrow dispatches to it on accelerators), so it must be
bit-identical to the radix-2 XLA kernel on every shape class: direct
(n <= MAX_DIRECT), one recursion level, and deep recursion; forward and
inverse; the Pallas matmul variant via interpreter mode.
"""

import numpy as np
import jax.numpy as jnp

from tpu_stark.fields import babybear as bb
from tpu_stark.ntt import mxu_ntt, radix2

RNG = np.random.default_rng(7)


def _rand(h, w):
    return jnp.asarray(bb.np_to_monty(RNG.integers(0, bb.P, size=(h, w), dtype=np.uint32)))


class TestMxuMatchesRadix2:
    def test_forward_shapes(self):
        for h, w in [(64, 2), (512, 8), (1024, 2), (4096, 2)]:
            mat = _rand(h, w)
            got = np.asarray(mxu_ntt.dft_batch(mat))
            want = np.asarray(radix2.dft_batch(mat))
            np.testing.assert_array_equal(got, want, err_msg=f"{h}x{w}")

    def test_inverse_shapes(self):
        for h, w in [(512, 2), (2048, 4)]:
            mat = _rand(h, w)
            got = np.asarray(mxu_ntt.idft_batch(mat))
            want = np.asarray(radix2.idft_batch(mat))
            np.testing.assert_array_equal(got, want, err_msg=f"{h}x{w}")

    def test_pallas_variant_interpret(self):
        mat = _rand(1024, 2)
        got = np.asarray(mxu_ntt.dft_batch(mat, use_pallas=True, interpret=True))
        want = np.asarray(radix2.dft_batch(mat))
        np.testing.assert_array_equal(got, want)

    def test_roundtrip(self):
        mat = _rand(2048, 2)
        back = np.asarray(mxu_ntt.idft_batch(mxu_ntt.dft_batch(mat)))
        np.testing.assert_array_equal(back, np.asarray(mat))


class TestNarrowDispatchPolicy:
    """Dispatch policy after OPT-0016: _narrow_mode returns None (plain stage
    loop), "vpu4" (default four-step reroute), or "mxu" (opt-in study path)."""

    def test_off_modes(self, monkeypatch):
        for off in ("0", "false", "off"):
            monkeypatch.setenv("TPU_STARK_NTT_NARROW", off)
            assert radix2._narrow_mode(1 << 22, 2) is None

    def test_shape_gates(self, monkeypatch):
        monkeypatch.setenv("TPU_STARK_NTT_NARROW", "vpu4")
        max_w, min_logh = radix2._narrow_gates()
        assert radix2._narrow_mode(1 << min_logh, max_w + 1) is None  # too wide
        assert radix2._narrow_mode(1 << (min_logh - 1), 2) is None  # too short

    def test_default_route_is_vpu4_on_accelerators(self, monkeypatch):
        # never on the CPU backend (the suite runs on CPU so the accelerator
        # branch itself is exercised on TPU runs)
        import jax

        on_accel = jax.default_backend() != "cpu"
        monkeypatch.delenv("TPU_STARK_NTT_NARROW", raising=False)
        want = "vpu4" if on_accel else None
        assert radix2._narrow_mode(1 << 22, 2) == want
        # mxu only via explicit opt-in
        monkeypatch.setenv("TPU_STARK_NTT_NARROW", "mxu")
        want = "mxu" if on_accel else None
        assert radix2._narrow_mode(1 << 22, 2) == want

    def test_forced_vpu4_path_matches(self, monkeypatch):
        """Force the vpu4 dispatch (CPU-safe) and check the public dft_batch /
        idft_batch outputs are unchanged vs the plain stage loop."""
        mat = _rand(1 << 12, 2)
        want = np.asarray(radix2._dit_core(12, mat, *radix2._stage_twiddles(12, False)))
        monkeypatch.setattr(radix2, "_narrow_mode", lambda h, w: "vpu4")
        got = np.asarray(radix2.dft_batch(mat))
        np.testing.assert_array_equal(got, want)
        # inverse roundtrips through the four-step too
        back = np.asarray(radix2.idft_batch(jnp.asarray(got)))
        np.testing.assert_array_equal(back, np.asarray(mat))

    def test_forced_mxu_path_matches(self, monkeypatch):
        """Force the mxu dispatch (CPU-safe: XLA matmul variant) and check the
        public dft_batch output is unchanged."""
        mat = _rand(1024, 2)
        want = np.asarray(radix2._dit_core(10, mat, *radix2._stage_twiddles(10, False)))
        monkeypatch.setattr(radix2, "_narrow_mode", lambda h, w: "mxu")
        # on CPU use_pallas would fail; patch mxu entry to the XLA variant
        import tpu_stark.ntt.mxu_ntt as m

        monkeypatch.setattr(
            m, "dft_batch", lambda x, use_pallas=False: m._dft_axis0(x, False)
        )
        got = np.asarray(radix2.dft_batch(mat))
        np.testing.assert_array_equal(got, want)
