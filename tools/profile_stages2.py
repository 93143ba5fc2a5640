"""Stage profile with HARD syncs (np.asarray downloads) — block_until_ready
does not actually block through the axon tunnel."""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

from tod_tpu.db.models import TodModel
from tod_tpu.geometry.detection import GuessConfig, detect_frame_from_matches
from tod_tpu.geometry.ransac import RansacConfig
from tod_tpu.models.fused import FusedDetectorConfig, match_against_db, pack_models
from tod_tpu.ops.depth import depth_to_3d_sparse, to_metric_depth
from tod_tpu.ops.orb import orb_detect_and_compute
from tod_tpu.ops.image import rgb_to_gray

rng = np.random.default_rng(0)
models = [TodModel(f"o{i}", rng.integers(0, 256, (12288, 32), dtype=np.uint8),
                   rng.uniform(-0.1, 0.1, (12288, 3)).astype(np.float32))
          for i in range(100)]
cfg = FusedDetectorConfig(
    n_features=5000,
    guess=GuessConfig(ransac=RansacConfig(n_hypotheses=1024, max_instances=3),
                      max_matches_per_object=512, max_active_objects=16))
db, _ = pack_models(models, cfg.db_chunk)
gray = jnp.asarray(rng.uniform(0, 255, (480, 640)), jnp.float32)
depth = jnp.full((480, 640), 800, jnp.uint16)
K = jnp.asarray([[525., 0, 319.5], [0, 525., 239.5], [0, 0, 1]], jnp.float32)
key = jax.random.PRNGKey(0)


def bench(name, fn, args, probe, n=15):
    out = fn(*args)
    np.asarray(probe(out))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        np.asarray(probe(out))
    print(f"{name:24s} {(time.time()-t0)/n*1e3:8.2f} ms", flush=True)
    return out


noop = jax.jit(lambda x: x + 1.0)
bench("rtt (tiny noop)", noop, (jnp.zeros(8),), lambda o: o)

orb = jax.jit(lambda g: orb_detect_and_compute(g, n_features=5000, n_levels=3,
                                               scale_factor=1.2))
kps, desc = bench("ORB", orb, (gray,), lambda o: o[1][:4])

match = jax.jit(lambda d: match_against_db(d, db, cfg))
dist, rows = bench("match (pallas, 1.23M)", match, (desc,),
                   lambda o: o[0][:4])


def geom(key, kxy, kvalid, dist, rows, depth, K):
    m_valid = (rows >= 0) & (dist <= cfg.radius) & kvalid[:, None]
    safe = jnp.maximum(rows, 0)
    obj_idx = jnp.where(m_valid, db.obj_of_row[safe], -1)
    tp = db.points[safe]
    depth_m = to_metric_depth(depth)
    qp = depth_to_3d_sparse(depth_m, K, kxy)
    qp = jnp.where(kvalid[:, None], qp, jnp.nan)
    return detect_frame_from_matches(key, obj_idx, dist, m_valid, tp, qp,
                                     kxy, db.spans, cfg.guess)[1].accepted


jg = jax.jit(geom)
bench("geometry (16 active)", jg, (key, kps.xy, kps.valid, dist, rows,
                                   depth, K), lambda o: o)
