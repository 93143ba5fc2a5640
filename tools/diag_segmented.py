"""Validate the segmented-matcher design end-to-end on cached data:

  - per-object top-1 (FULL rows) for all 100 objects on one scene:
      * activation separability: within-radius counts present vs absent,
        at several radii; with tighter 'strong' thresholds
      * correct-match survival in the top-512-by-distance per-object store
  - subsampled (1/8) variant of the same activation signal
  - how many queries have finite 3D (query compaction win)
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
from tod_tpu.ops.matching import hamming_topk
from tod_tpu.utils.synthetic import DEFAULT_K, compose_scene, facing_pose

N = int(os.environ.get("BENCH_OBJECTS", "100"))
objects, models = build_db(N)
cfg = FusedDetectorConfig(n_features=5000, radius=50.0, k_matches=8,
                          guess=GuessConfig(ransac=RansacConfig()))
det = FusedDetector(models, cfg)
oid_to_idx = {m.object_id: i for i, m in enumerate(models)}
s1, _, _ = det._stages

rng = np.random.default_rng(7)
SCENE = int(os.environ.get("DIAG_SCENE", "2"))
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
valid_h = np.asarray(kps.valid)
qpts = np.asarray(query_pts)
q_finite = np.isfinite(qpts).all(-1) & valid_h
print(f"queries: {int(valid_h.sum())} valid keypoints, "
      f"{int(q_finite.sum())} with finite 3D", flush=True)

# stack per-object DBs into (O, Rmax, 32) with per-object valid counts
rmax = max(m.n_points for m in models)
rmax_pad = -(-rmax // 2048) * 2048
db_all = np.zeros((N, rmax_pad, 32), np.uint8)
nv = np.zeros(N, np.int32)
for i, m in enumerate(models):
    db_all[i, :m.n_points] = m.descriptors
    nv[i] = m.n_points
db_j = jnp.asarray(db_all)
nv_j = jnp.asarray(nv)

match1 = jax.jit(jax.vmap(
    lambda db, n: hamming_topk(desc, db, n, k=1, chunk=2048),
    in_axes=(0, 0)))
# memory: (100, Rpad, 32) u8 = ~180MB; distances per object streamed
d_all, i_all = match1(db_j, nv_j)
d_all = np.asarray(d_all)[:, :, 0]     # (O, Q)
i_all = np.asarray(i_all)[:, :, 0]

# subsample variant (every 8th row)
SUB = 2048
db_sub = np.zeros((N, SUB, 32), np.uint8)
nv_sub = np.zeros(N, np.int32)
for i, m in enumerate(models):
    step = max(1, m.n_points // SUB)
    rows = np.arange(0, m.n_points, step)[:SUB]
    db_sub[i, :len(rows)] = m.descriptors[rows]
    nv_sub[i] = len(rows)
d_sub, _ = jax.jit(jax.vmap(
    lambda db, n: hamming_topk(desc, db, n, k=1, chunk=2048),
    in_axes=(0, 0)))(jnp.asarray(db_sub), jnp.asarray(nv_sub))
d_sub = np.asarray(d_sub)[:, :, 0]

for radius in (30, 35, 40, 50):
    cnt = ((d_all <= radius) & q_finite[None, :]).sum(1)
    cnt_s = ((d_sub <= radius) & q_finite[None, :]).sum(1)
    pr = sorted(cnt[list(present)])
    ab = np.sort(cnt[[o for o in range(N) if o not in present]])
    pr_s = sorted(cnt_s[list(present)])
    ab_s = np.sort(cnt_s[[o for o in range(N) if o not in present]])
    in16 = sum(1 for o in np.argsort(-cnt)[:16] if o in present)
    in16_s = sum(1 for o in np.argsort(-cnt_s)[:16] if o in present)
    print(f"r={radius}: FULL present={pr} absent(med/max)="
          f"{ab[len(ab)//2]}/{ab[-1]} top16 {in16}/3 | "
          f"SUB present={pr_s} absent(med/max)={ab_s[len(ab_s)//2]}/{ab_s[-1]} "
          f"top16 {in16_s}/3", flush=True)

# correct-match survival in the per-object top-512 store (radius 50)
print("\ntop-512 store composition (present objects, FULL top-1):")
for o in sorted(present):
    keep = (d_all[o] <= 50.0) & q_finite
    gt_R, gt_T = gt_pose[o]
    tp = np.asarray(models[o].points)[np.maximum(i_all[o], 0)]
    err = np.linalg.norm(tp @ gt_R.T + gt_T - qpts, axis=1)
    correct = keep & (err < 0.02)
    sel = np.argsort(np.where(keep, d_all[o], 1e9))[:512]
    sel = sel[keep[sel]]
    print(f"  obj{o:03d}: within-r {int(keep.sum())} "
          f"(correct {int(correct.sum())}); in top-512 store: "
          f"{len(sel)} kept, correct {int(correct[sel].sum())}", flush=True)
