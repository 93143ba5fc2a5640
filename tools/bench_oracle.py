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
    each engine must be self-consistent.

    Honors the same BENCH_TRAIN_DIST / BENCH_TRAIN_ELEV capture-plan knobs
    as bench.build_db, so envelope comparisons (stress bins) hold the
    training plan fixed across engines."""
    from tod_tpu.utils.synthetic import turntable_observations

    train_dists = [float(v) for v in
                   os.environ.get("BENCH_TRAIN_DIST", "0.8").split(",")]
    train_elevs = tuple(
        float(v) for v in
        os.environ.get("BENCH_TRAIN_ELEV", "85,60,35").split(","))
    ft = ""
    if train_dists != [0.8]:
        ft += "_td" + "-".join(f"{d:g}" for d in train_dists)
    if train_elevs != (85.0, 60.0, 35.0):
        ft += "_te" + "-".join(f"{e:g}" for e in train_elevs)
    cache = None
    if cache_dir:
        cache = os.path.join(cache_dir,
                             f"oracle_db_n{len(objects)}_{shapes}{ft}.npz")
        if os.path.exists(cache):
            data = np.load(cache)
            out = [(data[f"d{i}"], data[f"p{i}"])
                   for i in range(len(objects))]
            print(f"loaded oracle DB from {cache}", file=sys.stderr)
            return out
    out = []
    t0 = time.time()
    for i, obj in enumerate(objects):
        obs = list(turntable_observations(obj, n_views=12,
                                          elevations_deg=train_elevs,
                                          distance=train_dists[0]))
        for extra_d in train_dists[1:]:
            obs += list(turntable_observations(obj, n_views=12,
                                               elevations_deg=(60.0,),
                                               distance=extra_d))
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


class OracleEngine:
    """The oracle detection side over a packed DB: cv2.ORB -> brute-force
    Hamming knn+radius -> ClusterPerObject -> graph-RANSAC multi-instance
    loop. One place so the scene workload and the stress bins score through
    the identical pipeline."""

    def __init__(self, trained, ids, n_features, radius, k, n_iters):
        self.db = np.concatenate([d for d, _ in trained])
        self.pts = np.concatenate([p for _, p in trained]).astype(np.float32)
        self.obj_of_row = np.concatenate(
            [np.full(len(d), i, np.int32) for i, (d, _) in enumerate(trained)])
        # span = AABB diagonal of the model cloud
        # (DescriptorMatcher.cpp:104-121)
        self.spans = np.asarray(
            [np.linalg.norm(p.max(0) - p.min(0)) if len(p) else 0.0
             for _, p in trained], np.float32)
        self.ids = ids
        self.n_features = n_features
        self.radius = radius
        self.k = k
        self.n_iters = n_iters
        self.rng = np.random.default_rng(0)

    def detect_frame(self, image, depth, K):
        """Returns {object_id: [OraclePose, ...]} for one RGB-D frame."""
        gray = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)
        xy, desc = orb(gray, n_features=self.n_features)
        dist, idx, valid = match_radius(desc, self.db, k=self.k,
                                        radius=self.radius)
        depth_m = depth.astype(np.float32) / 1000.0
        qpts_all = backproject(depth_m, K, xy)

        # ClusterPerObject (adjacency_ransac.cpp:177-205): group flat
        # matches by model, drop NaN query points
        found = {}
        obj_flat = np.where(valid, self.obj_of_row[np.maximum(idx, 0)], -1)
        for o in np.unique(obj_flat[obj_flat >= 0]):
            qi, ki = np.nonzero(obj_flat == o)
            qpts = qpts_all[qi]
            keep = np.isfinite(qpts).all(-1)
            if keep.sum() < 3:
                continue
            qi, ki, qpts = qi[keep], ki[keep], qpts[keep]
            tpts = self.pts[idx[qi, ki]]
            poses = detect_object(
                self.rng, qpts, tpts, xy[qi], qi, self.spans[o],
                sigma=0.01, n_iterations=self.n_iters, min_inliers=8,
                max_instances=3, adaptive=True)
            if poses:
                found[self.ids[o]] = poses
        return found


# the canonical stress-bin grids (tools/stress_pose.py:120-129) — bin
# object picks are derived from the bin's index in these tuples, so an
# oracle bin scores the SAME object/pose placements the TPU stress run did
TILT_BINS = (0, 15, 30, 45, 60, 75)
DIST_BINS = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75, 2.0)


def run_stress(engine, objects, spec: str, per_bin: int):
    """Oracle recall over stress bins. ``spec`` = comma list of
    ``tilt<deg>`` / ``z<m>`` entries (e.g. ``tilt75,z2.0`` — the envelope
    edges; VERDICT r3 item 8)."""
    from tod_tpu.utils.synthetic import DEFAULT_K, compose_scene

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from stress_pose import stress_pose  # noqa: E402

    n = len(objects)
    out = {}
    for entry in spec.split(","):
        entry = entry.strip()
        if entry.startswith("tilt"):
            tilt, z = float(entry[4:]), 0.9
            bi = TILT_BINS.index(int(entry[4:]))
        elif entry.startswith("z"):
            tilt, z = 15.0, float(entry[1:])
            bi = 6 + DIST_BINS.index(float(entry[1:]))
        else:
            raise SystemExit(f"bad ORACLE_STRESS entry {entry!r}")
        picks = [(bi * per_bin + j) % n for j in range(per_bin)]
        hits = 0
        t0 = time.time()
        for j, oi in enumerate(picks):
            obj = objects[oi]
            az = 2 * np.pi * j / max(len(picks), 1)
            R, T = stress_pose(obj, tilt, z, az)
            image, depth = compose_scene([obj], [(R, T)])
            found = engine.detect_frame(image, depth, DEFAULT_K)
            best = min((float(np.linalg.norm(p.T - T))
                        for p in found.get(obj.object_id, [])), default=None)
            if best is not None and best <= 0.02:
                hits += 1
        rec = hits / max(len(picks), 1)
        out[entry] = {"recall": round(rec, 4), "n": len(picks),
                      "elapsed_s": round(time.time() - t0, 1)}
        print(f"  oracle {entry}: recall {hits}/{len(picks)} = {rec:.3f} "
              f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
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
    ids = [o.object_id for o in objects]
    engine = OracleEngine(trained, ids, n_features, radius, k, n_iters)
    print(f"oracle DB: {len(objects)} objects, {len(engine.db)} descriptors",
          file=sys.stderr, flush=True)
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

    stress_spec = os.environ.get("ORACLE_STRESS", "")
    if stress_spec:
        per_bin = int(os.environ.get("STRESS_PER_BIN", "12"))
        bins = run_stress(engine, objects, stress_spec, per_bin)
        out = {"metric": "oracle_stress_recall", "bins": bins,
               "n_objects": n_objects, "per_bin": per_bin, "shapes": shapes,
               "train_distances": os.environ.get("BENCH_TRAIN_DIST", "0.8"),
               "train_elevations": os.environ.get("BENCH_TRAIN_ELEV",
                                                  "85,60,35")}
        with open(os.path.join(root, "ORACLE_STRESS.json"), "w") as f:
            json.dump(out, f, indent=1)
        # merge into the TPU stress record so docs/SERVING.md's envelope
        # table can carry the reference column (VERDICT r3 item 8)
        sp_path = os.path.join(root, "STRESS_POSE.json")
        if os.path.exists(sp_path):
            with open(sp_path) as f:
                sp = json.load(f)
            for entry, rec in bins.items():
                if entry.startswith("tilt") and entry[4:] in sp.get("tilt",
                                                                    {}):
                    sp["tilt"][entry[4:]]["oracle_recall"] = rec["recall"]
                elif entry.startswith("z"):
                    key = f"{float(entry[1:]):.2f}"
                    if key in sp.get("distance", {}):
                        sp["distance"][key]["oracle_recall"] = rec["recall"]
            with open(sp_path, "w") as f:
                json.dump(sp, f, indent=1)
            print(f"merged oracle bins into {sp_path}", file=sys.stderr)
        print(json.dumps(out), flush=True)
        return

    K = np.array([[525.0, 0.0, 319.5], [0.0, 525.0, 239.5], [0.0, 0.0, 1.0]])
    hits, misses = 0, []
    frame_times = []
    scene_results = []   # [({oid: [OraclePose]}, gt)] for precision scoring
    for si, (image, depth, gt) in enumerate(scenes):
        t0 = time.time()
        found = engine.detect_frame(image, depth, K)
        dt_frame = time.time() - t0
        frame_times.append(dt_frame)
        scene_results.append((found, gt))

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

    # precision@2cm + confidence-gate curve, scored EXACTLY like bench.py
    # (an accepted pose is TRUE iff within 2cm of a same-id placement;
    # confidence = distinct inlier keypoints, the reference's acceptance
    # statistic min_inliers compares against, GuessGenerator.cpp:224-230)
    n_accepted = n_true_pos = 0
    for found, gt in scene_results:
        for oid, poses in found.items():
            n_accepted += len(poses)
            for p in poses:
                if any(g_oid == oid
                       and float(np.linalg.norm(p.T - gt_T)) <= 0.02
                       for g_oid, _, gt_T in gt):
                    n_true_pos += 1
    precision = n_true_pos / n_accepted if n_accepted else 0.0
    curve = {}
    for th in (8, 12, 16, 20, 24, 32):
        tp = acc = h = 0
        for found, gt in scene_results:
            kept = [(oid, p) for oid, poses in found.items()
                    for p in poses if p.n_unique >= th]
            acc += len(kept)
            for oid, p in kept:
                if any(g_oid == oid
                       and float(np.linalg.norm(p.T - gt_T)) <= 0.02
                       for g_oid, _, gt_T in gt):
                    tp += 1
            for g_oid, _, gt_T in gt:
                if any(oid == g_oid
                       and float(np.linalg.norm(p.T - gt_T)) <= 0.02
                       for oid, p in kept):
                    h += 1
        curve[str(th)] = [round(h / n_placed, 4),
                          round(tp / acc, 4) if acc else 1.0]
    print(f"oracle precision: {n_true_pos}/{n_accepted} = {precision:.3f}; "
          "curve: " + ", ".join(f"{t}: {r:.3f}/{p:.3f}"
                                for t, (r, p) in curve.items()),
          file=sys.stderr, flush=True)

    out = {
        "metric": "oracle_recall_at_2cm",
        "recall_at_2cm": round(recall, 4),
        "precision_at_2cm": round(precision, 4),
        "accepted": n_accepted,
        "true_pos": n_true_pos,
        "confidence_curve": curve,
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
    with open(os.path.join(root, "ORACLE_BENCH.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
