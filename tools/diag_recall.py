"""Diagnose recall collapse on the honest 100-object bench DB: where do the
ground-truth objects rank by within-radius match count, and does raising
max_active_objects recover them?"""
import json, os, sys, time
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_DEDUP", "8")

import bench
import jax, jax.numpy as jnp

bench.log(f"devices: {bench.wait_for_devices()}")
n_objects = int(os.environ.get("DIAG_OBJECTS", "100"))
objects, models = bench.build_db(n_objects)

from tod_tpu.geometry.detection import GuessConfig
from tod_tpu.geometry.ransac import RansacConfig
from tod_tpu.models import FusedDetector, FusedDetectorConfig
from tod_tpu.utils.synthetic import DEFAULT_K, compose_scene, facing_pose

def run(max_active, scene_idx=2):
    cfg = FusedDetectorConfig(
        n_features=5000,
        guess=GuessConfig(
            ransac=RansacConfig(n_hypotheses=1024, min_inliers=8,
                                max_instances=3),
            max_matches_per_object=512, object_batch=8,
            max_active_objects=max_active))
    det = FusedDetector(models, cfg)
    rng = np.random.default_rng(7)
    # replicate bench scene construction
    scenes = []
    for s in range(scene_idx + 1):
        trio = [objects[(3 * s + j) % len(objects)] for j in range(3)]
        poses = [facing_pose(rng, z=0.75), facing_pose(rng, z=0.9),
                 facing_pose(rng, z=1.05)]
        poses[0][1][0] = -0.22; poses[1][1][0] = 0.02; poses[2][1][0] = 0.24
        image, depth = compose_scene(trio, poses)
        scenes.append((trio, poses, image, depth))
    trio, poses, image, depth = scenes[scene_idx]
    gt_ids = [o.object_id for o in trio]

    # per-object within-radius match counts (what active-set selection sees)
    kps, desc, query_pts = None, None, None
    g, d, K = det.prepare_frame(image, depth, DEFAULT_K)
    s1, s2, s3 = det._stages
    kps, desc, query_pts = s1(g, d, K)
    dist, rows = s2(desc, det.db)
    m_valid = np.asarray((rows >= 0) & (dist <= cfg.radius)
                         & kps.valid[:, None])
    obj_of_row = np.asarray(det.db.obj_of_row)
    rows_np = np.asarray(rows); safe = np.maximum(rows_np, 0)
    obj_idx = np.where(m_valid, obj_of_row[safe], -1)
    qp = np.asarray(query_pts)
    q_fin = np.isfinite(qp).all(-1)
    v = m_valid & q_fin[:, None]
    counts = np.bincount(obj_idx[v & (obj_idx >= 0)].ravel(),
                         minlength=len(models))
    order = np.argsort(-counts)
    bench.log(f"scene {scene_idx} gt={gt_ids}")
    bench.log("top-20 objects by match count: " +
              ", ".join(f"{det.object_ids[o]}:{counts[o]}"
                        for o in order[:20]))
    for gid in gt_ids:
        o = det.object_ids.index(gid)
        rank = int(np.where(order == o)[0][0])
        bench.log(f"  {gid}: rank {rank}, count {counts[o]}")

    results = det.detect(image, depth, DEFAULT_K)
    found = {}
    for r in results:
        found.setdefault(r.object_id, []).append(r)
    for gid, (gt_R, gt_T) in zip(gt_ids, poses):
        best = min((float(np.linalg.norm(r.T - gt_T))
                    for r in found.get(gid, [])), default=None)
        bench.log(f"  detect {gid} (max_active={max_active}): best dt={best}")
    return counts

counts16 = run(16)
bench.log("=== now with max_active_objects=100 ===")
run(100)
