"""OPT-0016 probe: plain radix-2 stage loop vs pure-VPU four-step on the
tall-narrow shapes the 2^20 zk prove actually dispatches (single-call latency
WITH sync — the protocol the OPT-0011 addendum mandates — plus chained reps).

Run manually on TPU:  python bench_narrow_ntt.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_stark.fields import babybear as bb
from tpu_stark.ntt import radix2

SHAPES = [  # (log_h, w): the prove's commit-path transforms at 2^20
    (21, 2),  # trace idft
    (23, 2),  # trace LDE dft
    (20, 8),  # quotient idft (grouped chunks)
    (22, 8),  # quotient LDE dft
    (21, 4),  # random-codeword dft/idft
    (23, 4),  # random-codeword LDE dft
    (22, 32),  # upper edge of the dispatch window
]


def run(fn, x, label, reps=5):
    out = fn(x)
    jax.device_get(out.ravel()[0])  # compile + settle
    # single-call latency (incl. one tunnel sync) — what prove() pays
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(x)
        jax.device_get(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    n = x.shape[0] * x.shape[1]
    print(
        f"  {label:6s} single-call {best * 1e3:9.2f} ms"
        f"  ({n / best / 1e6:8.1f} Melems/s)",
        flush=True,
    )
    return best


import functools


@functools.partial(jax.jit, static_argnums=0)
def _dev_input(shape):
    # generate on device — NEVER ship bulk data over the tunnel (OPT-0014)
    import jax.random as jr

    bits = jr.bits(jr.PRNGKey(0), shape=shape, dtype=jnp.uint32)
    return bits % np.uint32(bb.P)


def main() -> None:
    print(f"backend: {jax.default_backend()}", flush=True)
    for log_h, w in SHAPES:
        h = 1 << log_h
        x = _dev_input((h, w))
        print(f"(2^{log_h}, {w}):", flush=True)
        t_plain = run(
            lambda m: radix2._dit_core(
                log_h, m, *radix2._stage_twiddles(log_h, False)
            ),
            x,
            "plain",
        )
        t_four = run(
            lambda m: radix2._four_step_core(log_h, False, m), x, "vpu4"
        )
        print(f"  speedup {t_plain / t_four:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
