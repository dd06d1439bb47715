import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_stark_jit_cache")
import numpy as np
from tpu_stark.air.keccak_air import KeccakAir, generate_trace
from tpu_stark.prover.config import create_config
from tpu_stark.prover.wide import prove_wide
from tpu_stark.prover.verify import verify
import jax
print("backend:", jax.default_backend(), jax.devices(), flush=True)
air = KeccakAir()
trace = generate_trace(num_perms=6, seed=2, dtype=np.uint8)  # 256 rows
t0 = time.time()
proof = prove_wide(create_config(zk=False, hash="poseidon2"), air, trace, [])
print("wide prove (256 rows) on TPU:", round(time.time()-t0, 1), "s", flush=True)
print("verify:", verify(create_config(zk=False, hash="poseidon2"), air, proof, []), flush=True)
