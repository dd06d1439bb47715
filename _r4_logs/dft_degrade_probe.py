"""Probe the 2^24 warm-rep anomaly: (2^26, 2) dfts ran 114 s cold but
~1,076 s an hour into the process. Re-run the same shape repeatedly in a
fresh process and watch the rate (degradation = allocator/tunnel state?)."""
import time
import jax, jax.numpy as jnp, numpy as np
from tpu_stark.fields import babybear as bb
from tpu_stark.ntt import radix2

rng = np.random.default_rng(0)
m = jnp.asarray(bb.np_to_monty(rng.integers(0, bb.P, size=(1 << 26, 2), dtype=np.uint32)))
for i in range(6):
    t0 = time.perf_counter()
    out = radix2.dft_batch(m)
    jax.device_get(out.ravel()[0])
    print(f"rep {i}: {time.perf_counter()-t0:.1f}s", flush=True)
    del out
