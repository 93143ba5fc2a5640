import time
import numpy as np
import jax
import jax.numpy as jnp
from tod_tpu.ops.pallas.hamming import hamming_topk_fused, pack_db_bits

Q, N = 5120, 262144
rng = np.random.default_rng(0)
q8 = jnp.asarray(rng.integers(0, 256, (Q, 32), dtype=np.uint8))
db_np = rng.integers(0, 256, (N, 32), dtype=np.uint8)
db_np[:Q // 2] = (np.asarray(q8)[:Q // 2]
                  ^ rng.integers(0, 2, (Q // 2, 32), dtype=np.uint8))
db8 = jnp.asarray(db_np)
bits_t, pop = pack_db_bits(db8, jnp.int8)
jax.block_until_ready(bits_t)

def bench(tag, radius):
    fused = jax.jit(lambda q: hamming_topk_fused(
        q, bits_t, pop, N, k=5, radius=radius))
    d, i = fused(q8)
    np.asarray(d)
    t0 = time.time()
    n = 30
    for _ in range(n):
        d, i = fused(q8)
    s = float(d.sum())
    dt = (time.time() - t0) / n
    print(f"{tag}: {dt*1e3:.2f} ms  {Q*N/dt/1e9:.1f} Gpairs/s", flush=True)

bench("radius=35 ", 35)
bench("radius=None", None)
