"""Per-keypoint margin: for query keypoints ON a GT object, the distance to
the geometrically-correct nearest descriptor of that object vs the nearest
junk (anything else). If best-correct >= best-junk, no matcher/radius/k
tuning can recover recall — the descriptor repeatability itself is the
ceiling."""
import os, sys
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_DB_CACHE", "/tmp/bench_db_cache")
import bench
import jax, jax.numpy as jnp
bench.log(f"devices: {bench.wait_for_devices()}")
objects, models = bench.build_db(100)
from tod_tpu.models import FusedDetector, FusedDetectorConfig
from tod_tpu.ops.matching import hamming_topk, pad_db
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
    if s == 0: break
g, d, K = det.prepare_frame(image, depth, DEFAULT_K)
s1, _, _ = det._stages
kps, desc, query_pts = s1(g, d, K)
qp = np.asarray(query_pts); kv = np.asarray(kps.valid)
desc_np = np.asarray(desc)

o = det.object_ids.index(trio[0].object_id)
gt_R, gt_T = poses[0]
m = models[o]
# query keypoints whose 3D point lies ON object o (within 1.5cm of the plane patch)
world = (qp - gt_T) @ gt_R   # object frame
on_obj = kv & np.isfinite(qp).all(-1) & (np.abs(world[:,2]) < 0.015) \
         & (np.abs(world[:,0]) < 0.12) & (np.abs(world[:,1]) < 0.12)
print("keypoints on obj:", int(on_obj.sum()))
qsel = np.nonzero(on_obj)[0][:256]
qd = jnp.asarray(desc_np[qsel])
# correct candidates: model points within 2cm of the keypoint's object-frame pos
mp = m.points
dists_all = []
import numpy.linalg as la
# exhaustive per-keypoint: distance to every descriptor of the model, split correct/incorrect
md = jnp.asarray(pad_db(m.descriptors, 2048)[0])
dd, rr = None, None
from tod_tpu.ops.matching import unpack_bits
qb = np.unpackbits(desc_np[qsel], axis=1, bitorder="little")
mb = np.unpackbits(m.descriptors, axis=1, bitorder="little")
D = (qb[:, None, :] != mb[None, :, :]).sum(-1)  # (256, Nm) -- small enough
corr_mask = (la.norm(mp[None] - world[qsel][:, None], axis=-1) < 0.02)
best_corr = np.where(corr_mask.any(1), np.where(corr_mask, D, 999).min(1), -1)
best_wrong_same = np.where(~corr_mask, D, 999).min(1)
ok = best_corr >= 0
print("keypoints with a correct candidate:", int(ok.sum()), "/", len(qsel))
print("best-correct dist percentiles:", np.percentile(best_corr[ok], [10,25,50,75,90]))
print("best-wrong-same-object dist percentiles:", np.percentile(best_wrong_same[ok], [10,25,50,75,90]))
# junk floor vs whole DB
dist5, rows5 = hamming_topk(jnp.asarray(desc_np[qsel]), det.db.descriptors, det.db.n_valid, k=1, chunk=16384)
gl = np.asarray(dist5)[:, 0]
print("global NN dist percentiles:", np.percentile(gl[ok], [10,25,50,75,90]))
print("margin (best_correct - global_NN) percentiles:", np.percentile((best_corr - gl)[ok], [10,25,50,75,90]))
print("frac keypoints where correct IS the global NN:", float((best_corr[ok] <= gl[ok]).mean()))
