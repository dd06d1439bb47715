"""Smoke test for the speed-of-light report (tpu_stark/bench/sol.py).

On CPU this validates plumbing only (roof probes, op-count accounting, %SoL
arithmetic); the numbers themselves are meaningful on real TPU runs
(`python -m tpu_stark.bench.sol`).
"""

from tpu_stark.bench import sol


def test_small_report_structure():
    rep = sol.run(small=True)
    assert set(rep["roofs"]) == {"montmul", "bitop", "hbm"}
    assert all(v > 0 for v in rep["roofs"].values())
    kernels = {k["kernel"].rsplit("_", 1)[0] for k in rep["kernels"]}
    assert any(k.startswith("ntt_radix2") for k in kernels)
    for k in rep["kernels"]:
        assert k["sol_pct"] > 0
        assert k["roof_key"] in rep["roofs"]


def test_op_counts_documented():
    # derivations pinned: a silent change to the kernels should force the
    # analyst to re-derive these
    assert sol.KECCAK_OPS_PER_PERM == 24 * 426
    assert sol.POSEIDON2_16_MONTMULS == 772
    assert sol._ntt_montmuls(16384, 128) == (16384 // 2) * 14 * 128
