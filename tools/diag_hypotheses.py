"""Validate the round-2 redesign hypotheses on the cached bench DB:

H1: geometric-consistency counts (pairs with | |t|-|q| | < 2*sigma, degree>=3)
    separate PRESENT from ABSENT objects where raw match counts do not.
H2: per-(query,object) top-1 matching yields at least as many correct matches
    per present object as the global k=8 matcher (no crowding).
H3: consistency-weighted (power-iteration) sampling lifts P(pure triple)
    far above uniform on the real per-object match sets.
"""
import os
import sys

sys.path.insert(0, ".")
import numpy as np

os.environ.setdefault("BENCH_DB_CACHE", "/tmp/bench_cache")

import jax
import jax.numpy as jnp

from bench import build_db
from tod_tpu.models import FusedDetector, FusedDetectorConfig
from tod_tpu.geometry.detection import GuessConfig
from tod_tpu.geometry.ransac import RansacConfig
from tod_tpu.ops.matching import hamming_topk, pad_db
from tod_tpu.utils.synthetic import DEFAULT_K, compose_scene, facing_pose

N = int(os.environ.get("BENCH_OBJECTS", "100"))
objects, models = build_db(N)
cfg = FusedDetectorConfig(
    n_features=5000, radius=50.0, k_matches=8,
    guess=GuessConfig(ransac=RansacConfig(n_hypotheses=1024, min_inliers=8,
                                          max_instances=3),
                      max_matches_per_object=512, object_batch=8,
                      max_active_objects=16))
det = FusedDetector(models, cfg)
oid_to_idx = {m.object_id: i for i, m in enumerate(models)}
s1, s2, _ = det._stages

rng = np.random.default_rng(7)
SCENE = int(os.environ.get("DIAG_SCENE", "2"))   # scene 2 = objs 6,7,8 (all missed)
for s in range(SCENE + 1):
    trio = [objects[(3 * s + j) % len(objects)] for j in range(3)]
    poses = [facing_pose(rng, z=0.75), facing_pose(rng, z=0.9),
             facing_pose(rng, z=1.05)]
    poses[0][1][0] = -0.22
    poses[1][1][0] = 0.02
    poses[2][1][0] = 0.24
image, depth = compose_scene(trio, poses)
present = {oid_to_idx[o.object_id] for o in trio}
gt_pose = {oid_to_idx[o.object_id]: p for o, p in zip(trio, poses)}

gray, depth_j, K_j = det.prepare_frame(image, depth, DEFAULT_K)
kps, desc, query_pts = s1(gray, depth_j, K_j)
dist, rows = s2(desc, det.db)

dist_h = np.asarray(dist); rows_h = np.asarray(rows)
valid_h = np.asarray(kps.valid); qpts = np.asarray(query_pts)
xy_h = np.asarray(kps.xy)
q_finite = np.isfinite(qpts).all(-1)
obj_of_row = np.asarray(det.db.obj_of_row)
db_pts = np.asarray(det.db.points)
spans = np.asarray(det.db.spans)
m_valid = (rows_h >= 0) & (dist_h <= 50.0) & valid_h[:, None] & q_finite[:, None]
obj_idx = np.where(m_valid, obj_of_row[np.maximum(rows_h, 0)], -1)

SIGMA = 0.01


def consistency_count(qp, tp, xy, span, cap=128):
    """#matches with >= 3 'sample-consistent' partners among a capped set."""
    if len(qp) == 0:
        return 0
    if len(qp) > cap:
        sel = np.random.default_rng(0).choice(len(qp), cap, replace=False)
        qp, tp, xy = qp[sel], tp[sel], xy[sel]
    dq = np.linalg.norm(qp[:, None] - qp[None], axis=-1)
    dt = np.linalg.norm(tp[:, None] - tp[None], axis=-1)
    dpix = np.linalg.norm(xy[:, None] - xy[None], axis=-1)
    cons = (np.abs(dt - dq) < 2 * SIGMA) & (dpix > 20) & (dq <= span + 2 * SIGMA)
    np.fill_diagonal(cons, False)
    deg = cons.sum(1)
    return int((deg >= 3).sum())


# ---- H1: consistency vs raw counts over all objects ------------------------
print("H1: activation signal (scene objects:", sorted(present), ")")
scores = []
for o in range(N):
    qi, ki = np.nonzero(obj_idx == o)
    raw = len(qi)
    cc = consistency_count(qpts[qi], db_pts[rows_h[qi, ki]], xy_h[qi],
                           spans[o])
    scores.append((o, raw, cc))
by_raw = sorted(scores, key=lambda t: -t[1])
by_cc = sorted(scores, key=lambda t: -t[2])
rank_raw = {o: r for r, (o, _, _) in enumerate(by_raw)}
rank_cc = {o: r for r, (o, _, _) in enumerate(by_cc)}
for o in sorted(present):
    _, raw, cc = scores[o]
    print(f"  obj{o:03d}: raw={raw} (rank {rank_raw[o]}) "
          f"consistency={cc} (rank {rank_cc[o]})")
absent_cc = sorted((cc for o, _, cc in scores if o not in present))
print(f"  absent consistency: median={absent_cc[len(absent_cc)//2]} "
      f"max={absent_cc[-1]}; top16-by-cc hits "
      f"{sum(1 for o,_,_ in by_cc[:16] if o in present)}/3 present")

# ---- H2: per-object top-1 correct counts vs global k=8 ---------------------
print("\nH2: per-object top-1 vs global k=8 (present objects)")
starts = np.concatenate([[0], np.cumsum([m.n_points for m in models])])
for o in sorted(present):
    lo, hi = int(starts[o]), int(starts[o + 1])
    db_o, nv = pad_db(np.asarray(models[o].descriptors, np.uint8), 2048)
    d1, i1 = jax.jit(lambda q, db: hamming_topk(q, db, nv, k=1, chunk=2048))(
        desc, jnp.asarray(db_o))
    d1 = np.asarray(d1)[:, 0]; i1 = np.asarray(i1)[:, 0]
    keep = (d1 <= 50.0) & valid_h & q_finite
    gt_R, gt_T = gt_pose[o]
    tp = np.asarray(models[o].points)[np.maximum(i1, 0)]
    err = np.linalg.norm(tp @ gt_R.T + gt_T - qpts, axis=1)
    c_top1 = int((keep & (err < 0.02)).sum())
    # global k=8 correct for the same object
    qi, ki = np.nonzero(obj_idx == o)
    tg = db_pts[rows_h[qi, ki]]
    errg = np.linalg.norm(tg @ gt_R.T + gt_T - qpts[qi], axis=1)
    c_glob = int((errg < 0.02).sum())
    u_top1 = c_top1  # top-1 per query is inherently unique per keypoint
    uq = len(set(qi[errg < 0.02]))
    print(f"  obj{o:03d}: top1 correct(unique kps)={u_top1} "
          f"global-k8 correct={c_glob} (unique kps {uq}) "
          f"top1 total-within-radius={int(keep.sum())}")

# ---- H3: weighted vs uniform pure-triple probability ------------------------
print("\nH3: sampling (present objects, 512-cap cluster)")
for o in sorted(present):
    qi, ki = np.nonzero(obj_idx == o)
    if len(qi) > 512:
        sel = np.argsort(dist_h[qi, ki])[:512]
        qi, ki = qi[sel], ki[sel]
    qp, tp, xy = qpts[qi], db_pts[rows_h[qi, ki]], xy_h[qi]
    gt_R, gt_T = gt_pose[o]
    corr = np.linalg.norm(tp @ gt_R.T + gt_T - qp, axis=1) < 0.02
    dq = np.linalg.norm(qp[:, None] - qp[None], axis=-1)
    dt = np.linalg.norm(tp[:, None] - tp[None], axis=-1)
    dpix = np.linalg.norm(xy[:, None] - xy[None], axis=-1)
    A = ((np.abs(dt - dq) < 2 * SIGMA) & (dpix > 20)
         & (dq <= spans[o] + 2 * SIGMA))
    np.fill_diagonal(A, False)
    Af = A.astype(np.float64)
    w = Af @ (Af @ (Af @ np.ones(len(A))))      # ~triangle/path weighting
    w = w / max(w.sum(), 1e-9)
    # simulate both samplers
    rngs = np.random.default_rng(1)
    def sim(weights, n=2000):
        pure = 0
        p = weights / weights.sum() if weights.sum() > 0 else None
        if p is None:
            return 0.0
        for _ in range(n):
            v1 = rngs.choice(len(A), p=p)
            n1 = A[v1] * weights
            if n1.sum() <= 0: continue
            v2 = rngs.choice(len(A), p=n1 / n1.sum())
            n2 = n1 * A[v2]
            if n2.sum() <= 0: continue
            v3 = rngs.choice(len(A), p=n2 / n2.sum())
            pure += corr[v1] & corr[v2] & corr[v3]
        return pure / n
    p_u = sim(np.ones(len(A)) * (A.sum(1) > 0))
    p_w = sim(w)
    print(f"  obj{o:03d}: n={len(qi)} correct={int(corr.sum())} "
          f"P(pure|uniform-graph)={p_u:.3f} P(pure|weighted)={p_w:.3f} "
          f"-> P(hit in 1024)={1-(1-p_u)**1024:.2f} vs "
          f"{1-(1-p_w)**1024:.2f}")
