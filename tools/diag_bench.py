"""Diagnose the headline bench: per-placement failure attribution + stage
timings at the real operating point. Uses the cached bench DB
(BENCH_DB_CACHE) so no retraining happens.

For each ground-truth placement, attribute the outcome to one of:
  - matched:   within-radius matches pointing at the GT object
  - active:    GT object survived the top-16 active-object cut
  - clustered: matches that made it into the object's 512-cap store
  - ransac:    best instance inlier count / accepted
  - pose:      translation error of the best accepted instance
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")
import numpy as np

os.environ.setdefault("BENCH_DB_CACHE", "/tmp/bench_cache")

import jax
import jax.numpy as jnp

from bench import build_db
from tod_tpu.geometry.detection import GuessConfig, cluster_matches
from tod_tpu.geometry.ransac import RansacConfig
from tod_tpu.models import FusedDetector, FusedDetectorConfig
from tod_tpu.models.fused import geom_db, match_against_db
from tod_tpu.utils.synthetic import DEFAULT_K, compose_scene, facing_pose

N_OBJECTS = int(os.environ.get("BENCH_OBJECTS", "100"))
print(f"devices: {jax.devices()}", flush=True)
objects, models = build_db(N_OBJECTS)

cfg = FusedDetectorConfig(
    n_features=5000,
    radius=float(os.environ.get("BENCH_RADIUS", "50")),
    k_matches=int(os.environ.get("BENCH_K", "8")),
    guess=GuessConfig(
        ransac=RansacConfig(n_hypotheses=1024, min_inliers=8,
                            max_instances=3),
        max_matches_per_object=512, object_batch=8,
        max_active_objects=16))
det = FusedDetector(models, cfg)

rng = np.random.default_rng(7)
n_scenes = int(os.environ.get("BENCH_SCENES", "8"))
scenes = []
for s in range(n_scenes):
    trio = [objects[(3 * s + j) % len(objects)] for j in range(3)]
    poses = [facing_pose(rng, z=0.75), facing_pose(rng, z=0.9),
             facing_pose(rng, z=1.05)]
    poses[0][1][0] = -0.22
    poses[1][1][0] = 0.02
    poses[2][1][0] = 0.24
    image, depth = compose_scene(trio, poses)
    gt = [(o.object_id, R, T) for o, (R, T) in zip(trio, poses)]
    scenes.append((image, depth, gt))

oid_to_idx = {m.object_id: i for i, m in enumerate(models)}

s1, s2, s3 = det._stages
for image, depth, gt in scenes:
    gray, depth_j, K_j = det.prepare_frame(image, depth, DEFAULT_K)
    kps, desc, query_pts = s1(gray, depth_j, K_j)
    dist, rows = s2(desc, det.db)
    det._key, sub = jax.random.split(det._key)
    d_out = s3(sub, kps.xy, kps.valid, dist, rows, query_pts,
               geom_db(det.db))

    dist_h = np.asarray(dist)
    rows_h = np.asarray(rows)
    valid_h = np.asarray(kps.valid)
    obj_of_row = np.asarray(det.db.obj_of_row)
    qpts = np.asarray(query_pts)
    q_finite = np.isfinite(qpts).all(-1)
    m_valid = (rows_h >= 0) & (dist_h <= cfg.radius) & valid_h[:, None] \
        & q_finite[:, None]
    obj_idx = np.where(m_valid, obj_of_row[np.maximum(rows_h, 0)], -1)
    counts = np.bincount(obj_idx[obj_idx >= 0], minlength=len(models))
    order = np.argsort(-counts)
    active = set(order[:cfg.guess.max_active_objects][
        counts[order[:cfg.guess.max_active_objects]] > 0])

    acc = np.asarray(d_out.accepted)
    nin = np.asarray(d_out.n_inliers)
    Rs = np.asarray(d_out.R)
    Ts = np.asarray(d_out.T)

    for oid, gt_R, gt_T in gt:
        o = oid_to_idx[oid]
        n_match = int(counts[o])
        # unique keypoints among this object's matches
        kp_any = (obj_idx == o).any(axis=1)
        n_kp = int(kp_any.sum())
        best = None
        for i in range(acc.shape[1]):
            if acc[o, i]:
                dt = float(np.linalg.norm(Ts[o, i] - gt_T))
                if best is None or dt < best[0]:
                    best = (dt, int(nin[o, i]))
        tag = "HIT " if best and best[0] <= 0.02 else "MISS"
        print(f"{tag} {oid}: z={gt_T[2]:.2f} matches={n_match} "
              f"kps={n_kp} active={o in active} "
              f"best={'none' if best is None else f'dt={best[0]*100:.1f}cm inl={best[1]}'} "
              f"all_inst={[(int(nin[o,i]), bool(acc[o,i])) for i in range(acc.shape[1])]}",
              flush=True)

# ---- stage timings (hard syncs) -------------------------------------------
print("\nstage timings:", flush=True)


def bench_stage(name, fn, args, probe, n=15):
    out = fn(*args)
    np.asarray(probe(out))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        np.asarray(probe(out))
    print(f"  {name:24s} {(time.time()-t0)/n*1e3:8.2f} ms", flush=True)
    return out


image, depth, _ = scenes[0]
gray, depth_j, K_j = det.prepare_frame(image, depth, DEFAULT_K)
noop = jax.jit(lambda x: x + 1.0)
bench_stage("rtt (tiny noop)", noop, (jnp.zeros(8),), lambda o: o)
kps, desc, query_pts = bench_stage(
    "features", s1, (gray, depth_j, K_j), lambda o: o[1][:4])
dist, rows = bench_stage(
    f"match ({det.db.descriptors.shape[0]} rows)", s2, (desc, det.db),
    lambda o: o[0][:4])
key = jax.random.PRNGKey(0)
bench_stage("geometry", s3,
            (key, kps.xy, kps.valid, dist, rows, query_pts, geom_db(det.db)),
            lambda o: o.accepted)
