#!/usr/bin/env python
"""Reference-semantics CPU baseline over the EXACT bench workload.

Runs the cv_oracle pipeline — cv2.ORB -> brute-force Hamming knn(k)+radius
(DescriptorMatcher.cpp:211-220) -> ClusterPerObject -> FillAdjacency ->
sequential graph-RANSAC with the EXACT max-clique certificate and the
reference's adaptive termination (ransac.h:124-135) -> multi-instance
invalidation loop — over the SAME trained DB and the SAME scenes bench.py
scores, and reports oracle recall@2cm + oracle CPU seconds/frame next to
the TPU numbers (VERDICT r2 item 1: the "matching-or-beating" baseline).

Usage (reuses the bench DB cache; trains live if absent):
  JAX_PLATFORMS=cpu python tools/bench_oracle.py
Env: BENCH_OBJECTS/SCENES/FEATURES/RADIUS/K/ITERS as bench.py; writes
ORACLE_BENCH.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tests.cv_oracle import (backproject, detect_object, match_radius,  # noqa: E402
                             orb, train_object)


def build_oracle_db(objects, cache_dir, shapes="plane"):
    """Train every bench object through the ORACLE trainer (cv2.ORB on the
    eroded mask + depth validation + camera->world stacking — the reference
    semantics end to end). The oracle CANNOT reuse the tod_tpu-trained
    descriptors: its detection side computes cv2.ORB descriptors, and the
    two BRIEF implementations are deliberately different bit layouts —
    each engine must be self-consistent."""
    from tod_tpu.utils.synthetic import turntable_observations

    cache = None
    if cache_dir:
        cache = os.path.join(cache_dir,
                             f"oracle_db_n{len(objects)}_{shapes}.npz")
        if os.path.exists(cache):
            data = np.load(cache)
            out = [(data[f"d{i}"], data[f"p{i}"])
                   for i in range(len(objects))]
            print(f"loaded oracle DB from {cache}", file=sys.stderr)
            return out
    out = []
    t0 = time.time()
    for i, obj in enumerate(objects):
        obs = turntable_observations(obj, n_views=12,
                                     elevations_deg=(85.0, 60.0, 35.0))
        desc, pts = train_object(obs, n_features=600)
        out.append((desc, pts))
        if (i + 1) % 20 == 0 or i == len(objects) - 1:
            print(f"  oracle-trained {i + 1}/{len(objects)} "
                  f"({time.time() - t0:.1f}s)", file=sys.stderr, flush=True)
    if cache:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez(cache, **{f"d{i}": d for i, (d, _) in enumerate(out)},
                 **{f"p{i}": p for i, (_, p) in enumerate(out)})
    return out


def main():
    n_objects = int(os.environ.get("BENCH_OBJECTS", "100"))
    n_scenes = int(os.environ.get("BENCH_SCENES", "8"))
    n_features = int(os.environ.get("BENCH_FEATURES", "5000"))
    radius = float(os.environ.get("BENCH_RADIUS", "50"))
    k = int(os.environ.get("BENCH_K", "8"))
    n_iters = int(os.environ.get("BENCH_ITERS", "2500"))  # detection.ork:40

    import bench

    shapes = os.environ.get("BENCH_SHAPES", "mixed")
    cache_dir = os.environ.get(
        "BENCH_DB_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".bench_cache"))
    # same objects + scenes as bench.py, by construction: bench.make_obj is
    # the single source of the catalog's object definitions
    objects = [bench.make_obj(i) for i in range(n_objects)]
    scenes = bench.build_scenes(objects, n_scenes)

    trained = build_oracle_db(objects, cache_dir, shapes=shapes)
    db = np.concatenate([d for d, _ in trained])
    pts = np.concatenate([p for _, p in trained]).astype(np.float32)
    obj_of_row = np.concatenate([np.full(len(d), i, np.int32)
                                 for i, (d, _) in enumerate(trained)])
    # span = AABB diagonal of the model cloud (DescriptorMatcher.cpp:104-121)
    spans = np.asarray([np.linalg.norm(p.max(0) - p.min(0)) if len(p) else 0.0
                        for _, p in trained], np.float32)
    ids = [o.object_id for o in objects]
    print(f"oracle DB: {len(objects)} objects, {len(db)} descriptors",
          file=sys.stderr, flush=True)

    K = np.array([[525.0, 0.0, 319.5], [0.0, 525.0, 239.5], [0.0, 0.0, 1.0]])
    rng = np.random.default_rng(0)
    hits, misses = 0, []
    frame_times = []
    for si, (image, depth, gt) in enumerate(scenes):
        t0 = time.time()
        gray = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)
        xy, desc = orb(gray, n_features=n_features)
        dist, idx, valid = match_radius(desc, db, k=k, radius=radius)
        depth_m = depth.astype(np.float32) / 1000.0
        qpts_all = backproject(depth_m, K, xy)

        # ClusterPerObject (adjacency_ransac.cpp:177-205): group flat matches
        # by model, drop NaN query points
        found = {}
        obj_flat = np.where(valid, obj_of_row[np.maximum(idx, 0)], -1)
        for o in np.unique(obj_flat[obj_flat >= 0]):
            qi, ki = np.nonzero(obj_flat == o)
            qpts = qpts_all[qi]
            keep = np.isfinite(qpts).all(-1)
            if keep.sum() < 3:
                continue
            qi, ki, qpts = qi[keep], ki[keep], qpts[keep]
            tpts = pts[idx[qi, ki]]
            poses = detect_object(
                rng, qpts, tpts, xy[qi], qi, spans[o],
                sigma=0.01, n_iterations=n_iters, min_inliers=8,
                max_instances=3, adaptive=True)
            if poses:
                found[ids[o]] = poses
        dt_frame = time.time() - t0
        frame_times.append(dt_frame)

        for oid, gt_R, gt_T in gt:
            best_dt = None
            for p in found.get(oid, []):
                d = float(np.linalg.norm(p.T - gt_T))
                if best_dt is None or d < best_dt:
                    best_dt = d
            if best_dt is not None and best_dt <= 0.02:
                hits += 1
            else:
                misses.append((oid, round(best_dt, 4)
                               if best_dt is not None else None))
        print(f"scene {si}: {len(found)} objects found, {dt_frame:.1f}s",
              file=sys.stderr, flush=True)

    n_placed = 3 * n_scenes
    recall = hits / n_placed
    sec = float(np.mean(frame_times))
    out = {
        "metric": "oracle_recall_at_2cm",
        "recall_at_2cm": round(recall, 4),
        "hits": hits,
        "placed": n_placed,
        "missed": misses,
        "cpu_seconds_per_frame": round(sec, 2),
        "cpu_fps": round(1.0 / sec, 4),
        "n_objects": n_objects,
        "n_features": n_features,
        "radius": radius,
        "k": k,
        "shapes": shapes,
        "noise": os.environ.get("BENCH_NOISE", ""),
    }
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    with open(os.path.join(root, "ORACLE_BENCH.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
