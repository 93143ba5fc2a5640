"""Distance distributions: correct vs junk matches on the honest DB."""
import os, sys
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_DB_CACHE", "/tmp/bench_db_cache")
import bench
import jax, jax.numpy as jnp
bench.log(f"devices: {bench.wait_for_devices()}")
objects, models = bench.build_db(100)
from tod_tpu.models import FusedDetector, FusedDetectorConfig
from tod_tpu.ops.matching import hamming_topk
from tod_tpu.utils.synthetic import DEFAULT_K, compose_scene, facing_pose
cfg = FusedDetectorConfig(n_features=5000)
det = FusedDetector(models, cfg)
rng = np.random.default_rng(7)
for s in range(3):
    trio = [objects[(3 * s + j) % len(objects)] for j in range(3)]
    poses = [facing_pose(rng, z=0.75), facing_pose(rng, z=0.9),
             facing_pose(rng, z=1.05)]
    poses[0][1][0] = -0.22; poses[1][1][0] = 0.02; poses[2][1][0] = 0.24
    image, depth = compose_scene(trio, poses)
    if s != 2: continue
g, d, K = det.prepare_frame(image, depth, DEFAULT_K)
s1, _, _ = det._stages
kps, desc, query_pts = s1(g, d, K)
K_BIG = 16
dist, rows = hamming_topk(desc, det.db.descriptors, det.db.n_valid, k=K_BIG, chunk=16384)
dist = np.asarray(dist); rows = np.asarray(rows)
kv = np.asarray(kps.valid); qp = np.asarray(query_pts)
obj_of_row = np.asarray(det.db.obj_of_row); pts = np.asarray(det.db.points)
q_fin = np.isfinite(qp).all(-1)
valid = (rows >= 0) & kv[:, None] & q_fin[:, None]
gt = {det.object_ids.index(o.object_id): p for o, p in zip(trio, poses)}
corr_d, junk_d = [], []
for o, (gt_R, gt_T) in gt.items():
    is_obj = valid & (obj_of_row[np.maximum(rows, 0)] == o)
    t_pts = pts[np.maximum(rows, 0)]
    pred = t_pts @ gt_R.T + gt_T
    err = np.linalg.norm(pred - qp[:, None, :], axis=-1)
    corr = is_obj & (err < 0.03)
    corr_d.append(dist[corr]); junk_d.append(dist[is_obj & ~corr])
corr_d = np.concatenate(corr_d); junk_d = np.concatenate(junk_d)
other = valid & ~np.isin(obj_of_row[np.maximum(rows, 0)], list(gt.keys()))
other_d = dist[other]
for name, a in (("correct(GT objs)", corr_d), ("junk(GT objs)", junk_d),
                ("other objects", other_d)):
    if len(a):
        print(name, "n=", len(a), "percentiles[10,25,50,75,90]=",
              np.percentile(a, [10, 25, 50, 75, 90]).round(1), flush=True)
# rank histogram of correct matches: at which k position do they sit?
for o, (gt_R, gt_T) in gt.items():
    is_obj = valid & (obj_of_row[np.maximum(rows, 0)] == o)
    t_pts = pts[np.maximum(rows, 0)]
    pred = t_pts @ gt_R.T + gt_T
    err = np.linalg.norm(pred - qp[:, None, :], axis=-1)
    corr = is_obj & (err < 0.03) & (dist <= 35)
    ranks = np.nonzero(corr)[1]
    print(f"obj {o}: correct-match rank histogram:",
          np.bincount(ranks, minlength=K_BIG)[:K_BIG], flush=True)
