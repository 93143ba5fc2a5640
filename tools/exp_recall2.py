"""Round 2 sweep: training keypoint budget x azimuth density -> recall.
Hypothesis: the same physical corner is often missing from the model
(top-600-in-mask vs scene's frame-wide 5000), so no correct twin exists."""
import json, os, sys, time
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
import bench
bench.log(f"devices: {bench.wait_for_devices()}")
from tod_tpu.db import InMemoryDb, insert_observation, load_models_for_objects
from tod_tpu.models import TodTrainer, FusedDetector, FusedDetectorConfig
from tod_tpu.geometry.detection import GuessConfig
from tod_tpu.geometry.ransac import RansacConfig
from tod_tpu.utils.synthetic import (DEFAULT_K, SyntheticObject, compose_scene,
                                     facing_pose, turntable_observations)
N_OBJ = 20

def build(n_views, elevations, n_feat, dedup=8):
    InMemoryDb.reset_shared()
    db = InMemoryDb.shared("exp")
    objects = []
    t0 = time.time()
    for i in range(N_OBJ):
        obj = SyntheticObject.make(f"obj{i:03d}", seed=100 + i)
        objects.append(obj)
        ids = [insert_observation(db, obj.object_id, obs["frame_number"],
                                  obs["image"], obs["depth"], obs["mask"],
                                  obs["K"], obs["R"], obs["T"])
               for obs in turntable_observations(obj, n_views=n_views,
                                                 elevations_deg=elevations)]
        TodTrainer("t", object_id=obj.object_id,
                   json_db=json.dumps({"type": "mem", "collection": "exp"}),
                   json_feature_params=json.dumps({"type": "ORB",
                                                   "n_features": n_feat}),
                   dedup_hamming=dedup).process()
        for d in ids:
            db.delete(d)
    models = load_models_for_objects(db, "all")
    models = {m.object_id: m for m in models}
    models = [models[o.object_id] for o in objects]
    bench.log(f"built ({time.time()-t0:.0f}s) rows={sum(m.n_points for m in models)}")
    return objects, models

def recall(objects, models, radius, k, n_q=5000):
    cfg = FusedDetectorConfig(
        n_features=n_q, radius=radius, k_matches=k,
        guess=GuessConfig(ransac=RansacConfig(n_hypotheses=1024, min_inliers=8,
                                              max_instances=3),
                          max_matches_per_object=512, object_batch=8,
                          max_active_objects=16))
    det = FusedDetector(models, cfg)
    rng = np.random.default_rng(7)
    hits, total = 0, 0
    for s in range(6):
        trio = [objects[(3 * s + j) % len(objects)] for j in range(3)]
        poses = [facing_pose(rng, z=0.75), facing_pose(rng, z=0.9),
                 facing_pose(rng, z=1.05)]
        poses[0][1][0] = -0.22; poses[1][1][0] = 0.02; poses[2][1][0] = 0.24
        image, depth = compose_scene(trio, poses)
        found = det.detect(image, depth, DEFAULT_K)
        by_id = {}
        for r in found:
            by_id.setdefault(r.object_id, []).append(r)
        for (o, (gt_R, gt_T)) in zip(trio, poses):
            total += 1
            best = min((np.linalg.norm(r.T - gt_T) for r in
                        by_id.get(o.object_id, [])), default=None)
            hits += int(best is not None and best <= 0.02)
    return hits, total

SWEEP = (
        ("C 12azx3el nf1500", 12, (85.0, 60.0, 35.0), 1500),
        ("D 24azx3el nf600 ", 24, (85.0, 60.0, 35.0), 600),
        ("E 24azx3el nf1500", 24, (85.0, 60.0, 35.0), 1500))

if __name__ == "__main__":
    for tag, nv, elevs, nf in SWEEP:
        objects, models = build(nv, elevs, nf)
        h, t = recall(objects, models, 45, 8)
        bench.log(f"{tag}: r=45 k=8 -> {h}/{t}")
