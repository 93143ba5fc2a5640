"""Diagnose segmented-pipeline misses: for each GT placement, tier-1 score +
activation rank, and tier-2 instance outcomes. Plus stage timings."""
import os
import sys
import time

sys.path.insert(0, ".")
import numpy as np

os.environ.setdefault("BENCH_DB_CACHE", "/tmp/bench_cache")

import jax
import jax.numpy as jnp

from bench import build_db
from tod_tpu.geometry.detection import (ActivationConfig, GuessConfig,
                                        detect_frame_segmented)
from tod_tpu.geometry.ransac import RansacConfig
from tod_tpu.models import FusedDetector, FusedDetectorConfig
from tod_tpu.utils.synthetic import DEFAULT_K, compose_scene, facing_pose

N = int(os.environ.get("BENCH_OBJECTS", "100"))
objects, models = build_db(N)
cfg = FusedDetectorConfig(
    n_features=5000, pipeline="segmented", q_cap=2048, radius=50.0,
    activation=ActivationConfig(m_cap=256, n_hypotheses=256, object_batch=20),
    guess=GuessConfig(ransac=RansacConfig(n_hypotheses=1024, min_inliers=8,
                                          max_instances=3),
                      max_matches_per_object=512, object_batch=8,
                      max_active_objects=16))
det = FusedDetector(models, cfg)
oid_to_idx = {m.object_id: i for i, m in enumerate(models)}
s1, s2, _ = det._stages

# scores-returning geometry stage
from tod_tpu.models.fused import _stage_geometry_segmented  # noqa: E402


def geom_with_scores(key, xy, qp, ok, dist, rows, points, obj_start, spans):
    return detect_frame_segmented(key, dist, rows, ok, qp, xy, points,
                                  obj_start, spans, cfg.guess,
                                  cfg.activation, cfg.radius)


jg = jax.jit(geom_with_scores)

rng = np.random.default_rng(7)
n_scenes = 8
for s in range(n_scenes):
    trio = [objects[(3 * s + j) % len(objects)] for j in range(3)]
    poses = [facing_pose(rng, z=0.75), facing_pose(rng, z=0.9),
             facing_pose(rng, z=1.05)]
    poses[0][1][0] = -0.22
    poses[1][1][0] = 0.02
    poses[2][1][0] = 0.24
    image, depth = compose_scene(trio, poses)
    gray, depth_j, K_j = det.prepare_frame(image, depth, DEFAULT_K)
    xy, qp, dsc, ok = s1(gray, depth_j, K_j)
    dist, rows = s2(dsc, det.sdb)
    det._key, sub = jax.random.split(det._key)
    scores, d_out = jg(sub, xy, qp, ok, dist, rows, det.sdb.points,
                       det.sdb.obj_start, det.sdb.spans)
    scores = np.asarray(scores)
    rank = {o: r for r, o in enumerate(np.argsort(-scores))}
    acc = np.asarray(d_out.accepted)
    nin = np.asarray(d_out.n_inliers)
    Ts = np.asarray(d_out.T)
    for oid, (gt_R, gt_T) in zip([o.object_id for o in trio], poses):
        o = oid_to_idx[oid]
        best = None
        for i in range(acc.shape[1]):
            if acc[o, i]:
                dt = float(np.linalg.norm(Ts[o, i] - gt_T))
                if best is None or dt < best[0]:
                    best = (dt, int(nin[o, i]))
        tag = "HIT " if best and best[0] <= 0.02 else "MISS"
        print(f"{tag} {oid}: z={gt_T[2]:.2f} t1score={scores[o]} "
              f"(rank {rank[o]}) "
              f"best={'none' if best is None else f'dt={best[0]*100:.1f}cm inl={best[1]}'} "
              f"inst={[(int(nin[o,i]), bool(acc[o,i])) for i in range(acc.shape[1])]}",
              flush=True)

# ---- stage timings ---------------------------------------------------------
print("\nstage timings (avg asymptotic, pipelined):", flush=True)


def timeit(fn, args, n=30, tag=""):
    out = fn(*args)
    jax.tree.flatten(out)
    np.asarray(jax.tree.leaves(out)[0])[:2]
    t0 = time.time()
    for _ in range(n - 1):
        out = fn(*args)
    x = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(x))
    dt = (time.time() - t0) / n
    print(f"  {tag:22s} {dt*1e3:8.2f} ms", flush=True)


timeit(jax.jit(lambda x: x + 1.0), (jnp.zeros(8),), tag="rtt floor")
timeit(s1, (gray, depth_j, K_j), tag="features+compact")
timeit(s2, (dsc, det.sdb), tag="segmented match")
timeit(jg, (sub, xy, qp, ok, dist, rows, det.sdb.points,
            det.sdb.obj_start, det.sdb.spans), tag="tier1+tier2 geometry")
