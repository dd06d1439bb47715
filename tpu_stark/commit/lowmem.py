"""Low-memory commitment policy — the 2^24 single-chip levers.

The north-star prove (fib_air zk at 2^24 rows, BASELINE.json) exhausts a
16 GB chip if every hiding tree retains its salt matrices (~1 GB each at
2^26 LDE rows) and all of its digest layers (leaf layer alone is
``H * 32 B`` — 2 GB for the trace tree).  The reference never faces this
(its proving is one-shot in host RAM at n=2^3, SURVEY.md par5.4); these are
TPU-native levers with no reference counterpart:

* **lazy salts** — when the hiding rng is the counter-based ``DeviceRng``
  (compat/device_rng.py), a salt matrix is a pure function of
  (seed, call index): commit materializes it transiently for the leaf hash
  and stores only the descriptor; the query phase regenerates it once and
  gathers the few opened rows.  Bit-identical to the eager path (same
  ``_sample_monty`` call).
* **dropped digest layers** — after the root is computed, the K leaf-most
  layers (7/8 of tree memory at K=3) are released.  Query openings
  reconstruct the missing sibling digests by re-hashing the 2^K-aligned
  leaf-row block around each query from the (lazily recomputed) committed
  matrix — one batched device hash over all queries, pooled into the same
  single transfer as the rest of the opening.

Both levers activate only at/above ``lowmem_rows()`` tree heights, so
small proves keep the exact round-2 behavior and proofs stay byte-identical
everywhere (tested at overlapping heights, tests/test_lowmem.py).
"""

from __future__ import annotations

import os


def lowmem_rows() -> int:
    """Committed-codeword height at/above which low-memory mode engages
    (release dense codewords after commit, lazy salts, dropped leaf layers;
    0 disables).  Env ``TPU_STARK_LOWMEM_LOG`` (log2) overrides; default
    2^24 — the height where retained state starts crowding a 16 GB chip."""
    env = os.environ.get("TPU_STARK_LOWMEM_LOG")
    if env is not None:
        try:
            v = int(env)
            return 0 if v <= 0 else 1 << v
        except ValueError:
            pass
    return 1 << 24


def drop_layers() -> int:
    """How many leaf-most digest layers to release once a tree is above the
    ``lowmem_rows()`` threshold (K=3 keeps 1/8 of layer bytes; 0 disables).
    Env ``TPU_STARK_LOWMEM_LAYERS`` overrides."""
    env = os.environ.get("TPU_STARK_LOWMEM_LAYERS")
    if env is not None:
        try:
            return max(0, int(env))
        except ValueError:
            pass
    return 3
