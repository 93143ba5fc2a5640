"""Match-correctness attribution: for each GT placement, how much TRUE signal
survives each stage (raw k-NN -> clustered 512-cap -> degree prune), and how
correct/junk distances are distributed. Decides whether recall losses are a
matching, clustering, pruning, or RANSAC problem."""
import os
import sys

sys.path.insert(0, ".")
import numpy as np

os.environ.setdefault("BENCH_DB_CACHE", "/tmp/bench_cache")

import jax
import jax.numpy as jnp

from bench import build_db
from tod_tpu.geometry.adjacency import fill_adjacency
from tod_tpu.geometry.detection import GuessConfig, cluster_matches
from tod_tpu.geometry.ransac import RansacConfig
from tod_tpu.models import FusedDetector, FusedDetectorConfig
from tod_tpu.models.fused import geom_db
from tod_tpu.utils.synthetic import DEFAULT_K, compose_scene, facing_pose

N_OBJECTS = int(os.environ.get("BENCH_OBJECTS", "100"))
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
oid_to_idx = {m.object_id: i for i, m in enumerate(models)}

rng = np.random.default_rng(7)
n_scenes = int(os.environ.get("BENCH_SCENES", "8"))
s1, s2, _ = det._stages

jfill = jax.jit(lambda m, span: fill_adjacency(m, span, 0.01))

for s in range(n_scenes):
    trio = [objects[(3 * s + j) % len(objects)] for j in range(3)]
    poses = [facing_pose(rng, z=0.75), facing_pose(rng, z=0.9),
             facing_pose(rng, z=1.05)]
    poses[0][1][0] = -0.22
    poses[1][1][0] = 0.02
    poses[2][1][0] = 0.24
    image, depth = compose_scene(trio, poses)

    gray, depth_j, K_j = det.prepare_frame(image, depth, DEFAULT_K)
    kps, desc, query_pts = s1(gray, depth_j, K_j)
    dist, rows = s2(desc, det.db)

    dist_h = np.asarray(dist)
    rows_h = np.asarray(rows)
    valid_h = np.asarray(kps.valid)
    qpts = np.asarray(query_pts)                      # (Q,3) camera frame
    q_finite = np.isfinite(qpts).all(-1)
    obj_of_row = np.asarray(det.db.obj_of_row)
    db_pts = np.asarray(det.db.points)                # (N,3) object frame
    m_valid = (rows_h >= 0) & (dist_h <= cfg.radius) & valid_h[:, None] \
        & q_finite[:, None]
    obj_idx = np.where(m_valid, obj_of_row[np.maximum(rows_h, 0)], -1)

    for oid, (gt_R, gt_T) in zip([o.object_id for o in trio], poses):
        o = oid_to_idx[oid]
        sel = obj_idx == o                            # (Q,k) bool
        if not sel.any():
            print(f"{oid}: no matches at all")
            continue
        qi, ki = np.nonzero(sel)
        t_pts = db_pts[rows_h[qi, ki]]                # object frame
        t_cam = t_pts @ gt_R.T + gt_T                 # GT-projected
        err = np.linalg.norm(t_cam - qpts[qi], axis=1)
        correct = err < 0.02
        d_sel = dist_h[qi, ki]
        n_c = int(correct.sum())
        # clustered store (the real cluster_matches on this object only)
        cl = cluster_matches(
            jnp.asarray(obj_idx), jnp.asarray(dist_h), jnp.asarray(m_valid),
            jnp.asarray(db_pts[np.maximum(rows_h, 0)]), jnp.asarray(qpts),
            kps.xy, jnp.asarray([o]), cfg.guess.max_matches_per_object)
        cl_t = np.asarray(cl.train_pts)[0]
        cl_q = np.asarray(cl.query_pts)[0]
        cl_v = np.asarray(cl.valid)[0]
        cl_err = np.linalg.norm(cl_t @ gt_R.T + gt_T - cl_q, axis=1)
        cl_correct = (cl_err < 0.02) & cl_v
        # degree prune
        g = jfill(jax.tree.map(lambda x: x[0], cl), det.db.spans[o])
        g_valid = np.asarray(g.valid)
        pr_correct = cl_correct & g_valid
        n_v = int(g_valid.sum())
        n_pc = int(pr_correct.sum())
        frac = (n_pc / max(n_v, 1))
        p3 = frac ** 3
        p_hit = 1 - (1 - p3) ** 1024 if p3 > 0 else 0.0
        print(f"{oid}: raw {n_c}/{len(qi)} correct "
              f"(med dist correct={np.median(d_sel[correct]) if n_c else -1:.0f} "
              f"junk={np.median(d_sel[~correct]) if (~correct).any() else -1:.0f}) "
              f"| clustered {int(cl_correct.sum())}/{int(cl_v.sum())} "
              f"| pruned-valid {n_pc}/{n_v} "
              f"| naive P(any pure triple in 1024)={p_hit:.2f}",
              flush=True)
