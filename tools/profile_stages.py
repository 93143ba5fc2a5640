import os
import time, numpy as np, jax, jax.numpy as jnp
from tod_tpu.db.models import TodModel
from tod_tpu.geometry.detection import GuessConfig, detect_frame_from_matches
from tod_tpu.geometry.ransac import RansacConfig
from tod_tpu.models.fused import FusedDetectorConfig, pack_models
from tod_tpu.ops.orb import orb_detect_and_compute
from tod_tpu.ops.matching import hamming_topk
from tod_tpu.ops.depth import to_metric_depth, depth_to_3d_sparse
rng = np.random.default_rng(0)
models = [TodModel(f"o{i}", rng.integers(0,256,(12800,32),dtype=np.uint8),
                   rng.uniform(-0.1,0.1,(12800,3)).astype(np.float32)) for i in range(20)]
cfg = FusedDetectorConfig(n_features=5000)
db, _ = pack_models(models, cfg.db_chunk)
gray = jnp.asarray(rng.uniform(0,255,(480,640)), jnp.float32)
depth = jnp.full((480,640), 800, jnp.uint16)
K = jnp.asarray([[525.,0,319.5],[0,525.,239.5],[0,0,1]], jnp.float32)

def bench(name, fn, args, n=20):
    out = fn(*args); jax.block_until_ready(out)
    t0=time.time()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(name, round((time.time()-t0)/n*1e3, 2), 'ms', flush=True)
    return out

orb = jax.jit(lambda g: orb_detect_and_compute(g, n_features=5000, n_levels=3, scale_factor=1.2))
kps, desc = bench('ORB', orb, (gray,))
match = jax.jit(lambda d: hamming_topk(d, db.descriptors, db.n_valid, k=5, chunk=cfg.db_chunk))
dist, rows = bench('match(256k db)', match, (desc,))

def geom(key, kxy, kvalid, dist, rows, depth, K):
    m_valid = (rows>=0)&(dist<=35.0)&kvalid[:,None]
    safe = jnp.maximum(rows,0)
    obj_idx = jnp.where(m_valid, db.obj_of_row[safe], -1)
    tp = db.points[safe]
    depth_m = to_metric_depth(depth)
    qp = depth_to_3d_sparse(depth_m, K, kxy)
    qp = jnp.where(kvalid[:,None], qp, jnp.nan)
    return detect_frame_from_matches(key, obj_idx, dist, m_valid, tp, qp, kxy, db.spans, cfg.guess)[1].accepted
jg = jax.jit(geom)
key = jax.random.PRNGKey(0)
bench('geometry(20 obj)', jg, (key, kps.xy, kps.valid, dist, rows, depth, K), n=10)
