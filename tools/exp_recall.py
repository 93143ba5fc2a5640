"""Parameter sweep: training view density x scene difficulty x radius x k
-> recall on a 20-object DB. Picks the honest-bench operating point."""
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

def build(n_views, elevations, dists):
    InMemoryDb.reset_shared()
    db = InMemoryDb.shared("exp")
    objects = []
    t0 = time.time()
    for i in range(N_OBJ):
        obj = SyntheticObject.make(f"obj{i:03d}", seed=100 + i)
        objects.append(obj)
        ids = []
        for dist in dists:
            for obs in turntable_observations(obj, n_views=n_views,
                                              elevations_deg=elevations,
                                              distance=dist):
                obs["frame_number"] += int(dist * 10000)
                ids.append(insert_observation(db, obj.object_id,
                    obs["frame_number"], obs["image"], obs["depth"],
                    obs["mask"], obs["K"], obs["R"], obs["T"]))
        TodTrainer("t", object_id=obj.object_id,
                   json_db=json.dumps({"type": "mem", "collection": "exp"}),
                   json_feature_params=json.dumps({"type": "ORB", "n_features": 600}),
                   dedup_hamming=8).process()
        for d in ids:
            db.delete(d)
    models = load_models_for_objects(db, "all")
    models = {m.object_id: m for m in models}
    models = [models[o.object_id] for o in objects]
    bench.log(f"trained {N_OBJ} ({time.time()-t0:.0f}s), "
              f"rows={sum(m.n_points for m in models)}")
    return objects, models

def recall(objects, models, zs, max_tilt, radius, k):
    cfg = FusedDetectorConfig(
        n_features=5000, radius=radius, k_matches=k,
        guess=GuessConfig(ransac=RansacConfig(n_hypotheses=1024, min_inliers=8,
                                              max_instances=3),
                          max_matches_per_object=512, object_batch=8,
                          max_active_objects=16))
    det = FusedDetector(models, cfg)
    rng = np.random.default_rng(7)
    hits, total = 0, 0
    for s in range(6):
        trio = [objects[(3 * s + j) % len(objects)] for j in range(3)]
        poses = [facing_pose(rng, z=zs[0], max_tilt=max_tilt),
                 facing_pose(rng, z=zs[1], max_tilt=max_tilt),
                 facing_pose(rng, z=zs[2], max_tilt=max_tilt)]
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

# config A: current bench training (12 az x (85,60,35), dist 0.8)
objects, models = build(12, (85.0, 60.0, 35.0), (0.8,))
for radius, k in ((35, 5), (45, 5), (45, 8), (50, 8)):
    h, t = recall(objects, models, (0.75, 0.9, 1.05), 0.5, radius, k)
    bench.log(f"A(train 36v@0.8) scene z.75-1.05 tilt.5 r={radius} k={k}: {h}/{t}")

# config B: denser near-frontal + two distances
objects, models = build(16, (85.0, 65.0), (0.75, 0.95))
for radius, k in ((45, 5), (45, 8)):
    h, t = recall(objects, models, (0.75, 0.9, 1.05), 0.5, radius, k)
    bench.log(f"B(train 64v@.75/.95) scene z.75-1.05 tilt.5 r={radius} k={k}: {h}/{t}")
    h, t = recall(objects, models, (0.75, 0.85, 0.95), 0.35, radius, k)
    bench.log(f"B(train 64v@.75/.95) scene z.75-.95 tilt.35 r={radius} k={k}: {h}/{t}")
