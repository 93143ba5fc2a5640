"""Benchmark exact-top-k matcher variants on the TPU (tools, not library)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from tod_tpu.ops.matching import unpack_bits, popcount_rows

Q, N, CHUNK, K = 5000, 262144, 16384, 5
rng = np.random.default_rng(0)
q8 = jnp.asarray(rng.integers(0, 256, (Q, 32), dtype=np.uint8))
db8 = jnp.asarray(rng.integers(0, 256, (N, 32), dtype=np.uint8))


def bench(name, fn, *args, n=10):
    out = fn(*args)
    np.asarray(jax.device_get(out[0]))  # hard sync through the tunnel
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        s = float(out[0].sum())  # forces completion each iteration
    dt = (time.time() - t0) / n
    print(f"{name:28s} {dt*1e3:8.2f} ms   {Q*N/dt/1e9:8.1f} Gpairs/s",
          flush=True)
    return out


def dists_chunk(q_bits, q_pop, db_c, dtype):
    db_bits = unpack_bits(db_c, dtype)
    db_pop = popcount_rows(db_c)[None, :]
    acc = jnp.int32 if dtype == jnp.int8 else jnp.float32
    dot = jnp.dot(q_bits, db_bits.T, preferred_element_type=acc)
    return (q_pop + db_pop - 2.0 * dot.astype(jnp.float32))


def make_scan(body_fn, dtype):
    q_bits = None

    @jax.jit
    def run(q8, db8):
        q_bits = unpack_bits(q8, dtype)
        q_pop = popcount_rows(q8)[:, None]
        chunks = db8.reshape(N // CHUNK, CHUNK, 32)
        init = (jnp.full((Q, K), 1e9), jnp.full((Q, K), -1, jnp.int32))

        def body(carry, inp):
            cidx, db_c = inp
            dist = dists_chunk(q_bits, q_pop, db_c, dtype)
            gidx = cidx * CHUNK + jnp.arange(CHUNK, dtype=jnp.int32)[None, :]
            nd, ni = body_fn(dist, gidx)
            bd, bi = carry
            d = jnp.concatenate([bd, nd], 1)
            i = jnp.concatenate([bi, ni], 1)
            td, pos = jax.lax.top_k(-d, K)
            return (-td, jnp.take_along_axis(i, pos, 1)), None

        (bd, bi), _ = jax.lax.scan(
            body, init, (jnp.arange(N // CHUNK, dtype=jnp.int32), chunks))
        return bd, bi

    return run


def topk_plain(dist, gidx):
    nd, pos = jax.lax.top_k(-dist, K)
    return -nd, jnp.take_along_axis(jnp.broadcast_to(gidx, dist.shape), pos, 1)


def topk_blockmin(dist, gidx, block=32, nblocks_keep=8):
    nb = CHUNK // block
    d3 = dist.reshape(Q, nb, block)
    bmin = d3.min(2)
    barg = d3.argmin(2).astype(jnp.int32)
    nbm, bidx = jax.lax.top_k(-bmin, nblocks_keep)        # (Q, 8)
    # gather the full blocks
    entry = bidx[:, :, None] * block + jnp.arange(block, dtype=jnp.int32)
    entry = entry.reshape(Q, nblocks_keep * block)         # (Q, 256)
    dsub = jnp.take_along_axis(dist, entry, 1)
    nd, pos = jax.lax.top_k(-dsub, K)
    ni = jnp.take_along_axis(entry, pos, 1) + gidx[:, :1]
    return -nd, ni


def topk_approx(dist, gidx):
    nd, pos = jax.lax.approx_min_k(dist, K, recall_target=0.99)
    return nd, pos + gidx[:, :1]


def topk_iter5(dist, gidx):
    iota = jnp.arange(CHUNK, dtype=jnp.int32)[None, :]
    ds, idxs = [], []
    d = dist
    for _ in range(K):
        m = d.min(1, keepdims=True)
        a = d.argmin(1)
        ds.append(m[:, 0])
        idxs.append(a)
        d = jnp.where(iota == a[:, None], 1e9, d)
    return jnp.stack(ds, 1), jnp.stack(idxs, 1) + gidx[:, :1]


print(f"Q={Q} N={N} chunk={CHUNK}")
r_ref = bench("bf16 + lax.top_k (current)", make_scan(topk_plain, jnp.bfloat16), q8, db8)
r_i8 = bench("int8 + lax.top_k", make_scan(topk_plain, jnp.int8), q8, db8)
r_blk = bench("int8 + blockmin top8", make_scan(topk_blockmin, jnp.int8), q8, db8)
r_apx = bench("int8 + approx_min_k", make_scan(topk_approx, jnp.int8), q8, db8)
r_it5 = bench("int8 + 5x min-extract", make_scan(topk_iter5, jnp.int8), q8, db8)

ref_d = np.asarray(r_ref[0])
for name, r in [("int8", r_i8), ("blockmin", r_blk), ("approx", r_apx),
                ("iter5", r_it5)]:
    d = np.asarray(r[0])
    print(f"{name}: exact-dist match = {(d == ref_d).mean():.4f}")
