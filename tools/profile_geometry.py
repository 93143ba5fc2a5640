"""Split the tier1+tier2 geometry stage cost and sweep lax.map batch sizes
(hard syncs; informs the next optimization round)."""
import os
import sys
import time

sys.path.insert(0, ".")
import numpy as np

os.environ.setdefault("BENCH_DB_CACHE", "/tmp/bench_cache")

import jax
import jax.numpy as jnp

from bench import build_db
from tod_tpu.geometry.adjacency import fill_adjacency
from tod_tpu.geometry.detection import (ActivationConfig, GuessConfig,
                                        build_object_stores, detect_objects,
                                        detect_frame_segmented)
from tod_tpu.geometry.ransac import RansacConfig, presence_score
from tod_tpu.models import FusedDetector, FusedDetectorConfig
from tod_tpu.utils.synthetic import DEFAULT_K, compose_scene, facing_pose

objects, models = build_db(100)
cfg = FusedDetectorConfig(
    n_features=5000, pipeline="segmented", q_cap=2048, radius=50.0,
    activation=ActivationConfig(m_cap=192, n_hypotheses=192, object_batch=20),
    guess=GuessConfig(ransac=RansacConfig(n_hypotheses=768, min_inliers=8,
                                          max_instances=3,
                                          tight_final_fit=True),
                      max_matches_per_object=384, object_batch=8,
                      max_active_objects=16))
det = FusedDetector(models, cfg)
s1, s2, _ = det._stages
rng = np.random.default_rng(7)
trio = objects[:3]
poses = [facing_pose(rng, z=0.75), facing_pose(rng, z=0.9),
         facing_pose(rng, z=1.05)]
image, depth = compose_scene(trio, poses)
gray, depth_j, K_j = det.prepare_frame(image, depth, DEFAULT_K)
xy, qp, dsc, ok = s1(gray, depth_j, K_j)
dist, rows = s2(dsc, det.sdb)
key = jax.random.PRNGKey(0)


def timeit(fn, args, tag, n=20):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])[:1]
    t0 = time.time()
    for _ in range(n - 1):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0]))
    print(f"{tag:40s} {(time.time()-t0)/n*1e3:8.2f} ms", flush=True)


def tier1_only(key, dist, rows, ok, qp, xy, points, obj_start, spans,
               obj_batch):
    level = jnp.median(dist, axis=1)
    keys1 = jax.random.split(key, 100)

    def one(args):
        key_o, o = args
        m = build_object_stores(dist, rows, ok, qp, xy, points, obj_start,
                                o[None], cfg.activation.m_cap, cfg.radius,
                                level)
        m = jax.tree.map(lambda x: x[0], m)
        graphs = fill_adjacency(m, spans[o], 0.01)
        return presence_score(key_o, m, graphs,
                              cfg.activation.n_hypotheses, 0.01)

    return jax.lax.map(one, (keys1, jnp.arange(100, dtype=jnp.int32)),
                       batch_size=obj_batch)


for ob in (10, 20, 25, 50):
    fn = jax.jit(lambda k, d, r, o, q, x: tier1_only(
        k, d, r, o, q, x, det.sdb.points, det.sdb.obj_start, det.sdb.spans,
        ob))
    timeit(fn, (key, dist, rows, ok, qp, xy), f"tier-1 (obj_batch={ob})")


def tier2_only(key, dist, rows, ok, qp, xy, points, obj_start, spans,
               obj_batch):
    level = jnp.median(dist, axis=1)
    active = jnp.arange(16, dtype=jnp.int32)  # fixed set: isolates cost
    stores = build_object_stores(dist, rows, ok, qp, xy, points, obj_start,
                                 active, cfg.guess.max_matches_per_object,
                                 cfg.radius, level)
    g2 = GuessConfig(ransac=cfg.guess.ransac,
                     max_matches_per_object=cfg.guess.max_matches_per_object,
                     object_batch=obj_batch,
                     max_active_objects=cfg.guess.max_active_objects)
    return detect_objects(key, stores, spans[active], g2).accepted


for ob in (4, 8, 16):
    fn = jax.jit(lambda k, d, r, o, q, x: tier2_only(
        k, d, r, o, q, x, det.sdb.points, det.sdb.obj_start, det.sdb.spans,
        ob))
    timeit(fn, (key, dist, rows, ok, qp, xy), f"tier-2 (obj_batch={ob})")
