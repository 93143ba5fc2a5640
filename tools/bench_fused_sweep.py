import time, numpy as np, jax, jax.numpy as jnp
from tod_tpu.ops.pallas.hamming import hamming_topk_fused, pack_db_bits
from tod_tpu.ops.matching import hamming_topk

Q, N = 5120, 262144
rng = np.random.default_rng(0)
q8 = jnp.asarray(rng.integers(0, 256, (Q, 32), dtype=np.uint8))
db8 = jnp.asarray(rng.integers(0, 256, (N, 32), dtype=np.uint8))

ref = None
for dtype in (jnp.bfloat16, jnp.int8):
    bits_t, pop = pack_db_bits(db8, dtype)
    jax.block_until_ready(bits_t)
    for qt in (256, 512):
        for ck in (2048, 4096):
            try:
                fused = jax.jit(lambda q: hamming_topk_fused(q, bits_t, pop, N, k=5, q_tile=qt, db_chunk=ck))
                d, i = fused(q8); np.asarray(d)
                t0 = time.time(); n = 20
                for _ in range(n):
                    d, i = fused(q8)
                s = float(d.sum())
                dt = (time.time() - t0) / n
                tag = "bf16" if dtype == jnp.bfloat16 else "int8"
                ok = "?" if ref is None else str(bool((np.asarray(d)==ref).all()))
                if ref is None: ref = np.asarray(d)
                print(f"{tag} qt={qt} ck={ck}: {dt*1e3:7.2f} ms  {Q*N/dt/1e9:7.1f} Gpairs/s exact={ok}", flush=True)
            except Exception as e:
                print(f"{dtype} qt={qt} ck={ck}: FAIL {str(e)[:120]}", flush=True)
