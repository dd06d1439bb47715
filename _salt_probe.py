import time, numpy as np, jax, jax.numpy as jnp
from tpu_stark.fields import babybear as bb
from tpu_stark.compat.smallrng import SmallRng
from tpu_stark.commit import merkle as M

rng = np.random.default_rng(0)
h = 1 << 22
lde = jnp.asarray(bb.np_to_monty(rng.integers(0, bb.P, size=(h, 2), dtype=np.uint32)))
jax.block_until_ready(lde)

sr = SmallRng.seed_from_u64(1)
t0 = time.perf_counter(); salts_np = sr.sample_babybear_matrix_monty(h, 4); t1 = time.perf_counter()
salts = jnp.asarray(salts_np); jax.block_until_ready(salts); t2 = time.perf_counter()
print(f"salt gen (host): {t1-t0:.3f}s  transfer 64MB: {t2-t1:.3f}s")

# layer build warm timing (compile first)
layers = M._build_layers([lde], [salts]); jax.block_until_ready(layers[-1])
t0 = time.perf_counter()
layers = M._build_layers([lde], [salts])
jax.block_until_ready(layers[-1])
root = M._digest_at(layers[-1], 0)
t3 = time.perf_counter()
print(f"layer build warm (incl root fetch): {t3-t0:.3f}s")
# repeat to confirm
t0 = time.perf_counter()
layers = M._build_layers([lde], [salts])
root = M._digest_at(layers[-1], 0)
print(f"layer build warm 2: {time.perf_counter()-t0:.3f}s")
