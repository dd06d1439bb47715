import time, numpy as np, jax, jax.numpy as jnp
from tpu_stark.fields import babybear as bb
from tpu_stark.ntt import radix2
from tpu_stark.commit.merkle import MerkleTreeMmcs
from tpu_stark.compat.smallrng import SmallRng

rng = np.random.default_rng(0)
def t(label, fn, *a):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = fn(*a); jax.block_until_ready(out)
    # force full sync
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"{label}: {time.perf_counter()-t0:.3f}s")
    return out

h = 1 << 20
tr = jnp.asarray(bb.np_to_monty(rng.integers(0, bb.P, size=(h, 2), dtype=np.uint32)))
co = t("idft 2^20x2", jax.jit(radix2.idft_batch), tr)
pad = jnp.zeros((h*4, 2), dtype=jnp.uint32).at[:h].set(co)
lde = t("dft 2^22x2", jax.jit(radix2.dft_batch), pad)

mmcs = MerkleTreeMmcs(hiding=True, rng=SmallRng.seed_from_u64(1))
t0 = time.perf_counter()
root, data = mmcs.commit([lde])
print(f"merkle commit (2^22, 2)+salt cold: {time.perf_counter()-t0:.3f}s")
mmcs2 = MerkleTreeMmcs(hiding=True, rng=SmallRng.seed_from_u64(1))
t0 = time.perf_counter()
root2, _ = mmcs2.commit([lde])
print(f"merkle commit (2^22, 2)+salt warm: {time.perf_counter()-t0:.3f}s")
