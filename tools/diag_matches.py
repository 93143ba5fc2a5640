"""Quantify match dilution on the honest DB: of each GT object's within-radius
matches, how many are TRUE correspondences (geometrically consistent with the
GT pose), as a function of k."""
import json, os, sys, time
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_DB_CACHE", "/tmp/bench_db_cache")

import bench
import jax, jax.numpy as jnp

bench.log(f"devices: {bench.wait_for_devices()}")
objects, models = bench.build_db(int(os.environ.get("DIAG_OBJECTS", "100")))

from tod_tpu.models import FusedDetector, FusedDetectorConfig
from tod_tpu.geometry.detection import GuessConfig
from tod_tpu.geometry.ransac import RansacConfig
from tod_tpu.ops.matching import hamming_topk
from tod_tpu.utils.synthetic import DEFAULT_K, compose_scene, facing_pose

cfg = FusedDetectorConfig(n_features=5000)
det = FusedDetector(models, cfg)

rng = np.random.default_rng(7)
scenes = []
for s in range(3):
    trio = [objects[(3 * s + j) % len(objects)] for j in range(3)]
    poses = [facing_pose(rng, z=0.75), facing_pose(rng, z=0.9),
             facing_pose(rng, z=1.05)]
    poses[0][1][0] = -0.22; poses[1][1][0] = 0.02; poses[2][1][0] = 0.24
    image, depth = compose_scene(trio, poses)
    scenes.append((trio, poses, image, depth))

trio, poses, image, depth = scenes[2]
g, d, K = det.prepare_frame(image, depth, DEFAULT_K)
s1, _, _ = det._stages
kps, desc, query_pts = s1(g, d, K)

K_BIG = 16
dist, rows = hamming_topk(desc, det.db.descriptors, det.db.n_valid,
                          k=K_BIG, chunk=16384)
dist = np.asarray(dist); rows = np.asarray(rows)
kv = np.asarray(kps.valid); qp = np.asarray(query_pts)
obj_of_row = np.asarray(det.db.obj_of_row)
pts = np.asarray(det.db.points)
q_fin = np.isfinite(qp).all(-1)

for gid, (gt_R, gt_T) in zip([o.object_id for o in trio], poses):
    o = det.object_ids.index(gid)
    for k in (5, 16):
        dk, rk = dist[:, :k], rows[:, :k]
        valid = (rk >= 0) & (dk <= 35) & kv[:, None] & q_fin[:, None]
        is_obj = valid & (obj_of_row[np.maximum(rk, 0)] == o)
        t_pts = pts[np.maximum(rk, 0)]          # (Q,k,3) object frame
        pred_cam = t_pts @ gt_R.T + gt_T        # model->camera
        err = np.linalg.norm(pred_cam - qp[:, None, :], axis=-1)
        correct = is_obj & (err < 0.03)
        n_kp = len(np.unique(np.nonzero(correct)[0]))
        print(f"{gid} k={k}: obj matches={int(is_obj.sum())}, "
              f"correct={int(correct.sum())} on {n_kp} distinct keypoints",
              flush=True)
    # oracle: how many keypoints on the object have ANY db descriptor of the
    # right object within radius AND correct, regardless of global rank?
