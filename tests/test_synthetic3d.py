"""Non-planar (3D) object coverage: textured boxes and cylinders.

The reference's actual domain is turntable captures of 3D household objects
(src/training/Trainer.cpp:121-187 multi-view back-projection/merging,
training.cpp:107-129 depth validation, adjacency_ransac.cpp:143-151
span/adjacency gating for curved/occluding geometry). Rounds 1-2 evaluated
only textured planes; these tests exercise what planes cannot:

  * multi-view model merging across self-occluding faces,
  * rank-3 model point sets (the Horn rotation beyond the planar case),
  * depth validation at silhouette/occlusion boundaries,
  * detection under per-view partial visibility.
"""

import json

import numpy as np
import pytest

from tod_tpu.db import InMemoryDb, insert_observation, load_models_for_objects
from tod_tpu.models import FusedDetector, FusedDetectorConfig, TodTrainer
from tod_tpu.geometry.detection import ActivationConfig, GuessConfig
from tod_tpu.geometry.ransac import RansacConfig
from tod_tpu.utils.synthetic import (
    DEFAULT_K,
    SyntheticBox,
    SyntheticCylinder,
    compose_scene,
    presenting_pose,
    turntable_observations,
)

DB_JSON = json.dumps({"type": "mem", "collection": "t3d"})


def _make_objects():
    return [SyntheticBox.make("box_a", 21), SyntheticCylinder.make("cyl_a", 22)]


@pytest.fixture(scope="module")
def trained3d():
    InMemoryDb.reset_shared()
    db = InMemoryDb.shared("t3d")
    objects = _make_objects()
    for obj in objects:
        for obs in turntable_observations(obj, n_views=10,
                                          elevations_deg=(65.0, 35.0)):
            insert_observation(db, obj.object_id, obs["frame_number"],
                               obs["image"], obs["depth"], obs["mask"],
                               obs["K"], obs["R"], obs["T"])
        TodTrainer("trainer", object_id=obj.object_id, json_db=DB_JSON,
                   json_feature_params=json.dumps(
                       {"type": "ORB", "n_features": 800})).process()
    yield objects, db
    InMemoryDb.reset_shared()


@pytest.fixture(autouse=True)
def _reset_shared_dbs():   # module fixture owns the DB lifecycle
    yield


def test_renderers_are_geometrically_consistent():
    """Back-projected depth at every mask pixel lands on the analytic
    object surface (<3mm), for both solids, across turntable views."""
    K = DEFAULT_K
    rng = np.random.default_rng(0)
    for obj in _make_objects():
        for o in turntable_observations(obj, n_views=3,
                                        elevations_deg=(60.0, 35.0)):
            mask = o["mask"] > 0
            assert mask.sum() > 3000, "object barely visible"
            depth = o["depth"].astype(np.float64) / 1000.0
            ys, xs = np.nonzero(mask)
            sel = rng.choice(len(ys), size=400, replace=False)
            ys, xs = ys[sel], xs[sel]
            z = depth[ys, xs]
            assert (z > 0).all(), "invalid depth inside the mask"
            rays = np.stack([xs, ys, np.ones_like(xs)], -1) @ np.linalg.inv(K).T
            X = (rays * z[:, None] - o["T"]) @ o["R"]   # camera -> object
            if isinstance(obj, SyntheticBox):
                sx, sy, sz = (s / 2 for s in obj.size_m)
                on = (np.abs(np.abs(X[:, 0]) - sx) < 3e-3) \
                    | (np.abs(np.abs(X[:, 1]) - sy) < 3e-3) \
                    | (np.abs(np.abs(X[:, 2]) - sz) < 3e-3)
            else:
                r = np.hypot(X[:, 0], X[:, 1])
                on = (np.abs(r - obj.radius_m) < 3e-3) \
                    | ((np.abs(np.abs(X[:, 2]) - obj.height_m / 2) < 3e-3)
                       & (r <= obj.radius_m + 3e-3))
            assert on.mean() > 0.97, f"{obj.object_id}: {on.mean():.3f}"


def test_trained_3d_models_are_rank3_and_on_surface(trained3d):
    """Multi-view merging produces genuinely 3D models whose points lie on
    the true object surface — the regime the planar suite never reaches."""
    objects, db = trained3d
    models = {m.object_id: m for m in load_models_for_objects(db, "all")}
    for obj in objects:
        m = models[obj.object_id]
        assert m.n_points > 2000, f"{obj.object_id}: {m.n_points} points"
        c = m.points - m.points.mean(0)
        sv = np.linalg.svd(c, compute_uv=False) / np.sqrt(len(c))
        assert sv[2] > 0.015, f"{obj.object_id}: near-planar model {sv}"
        P = m.points
        if isinstance(obj, SyntheticBox):
            sx, sy, sz = (s / 2 for s in obj.size_m)
            d = np.minimum.reduce([np.abs(np.abs(P[:, 0]) - sx),
                                   np.abs(np.abs(P[:, 1]) - sy),
                                   np.abs(np.abs(P[:, 2]) - sz)])
            assert (d < 3e-3).mean() > 0.99
            assert ((np.abs(P[:, 0]) <= sx + 3e-3)
                    & (np.abs(P[:, 1]) <= sy + 3e-3)
                    & (np.abs(P[:, 2]) <= sz + 3e-3)).mean() > 0.99
        else:
            r = np.hypot(P[:, 0], P[:, 1])
            side = np.abs(r - obj.radius_m) < 3e-3
            cap = (np.abs(np.abs(P[:, 2]) - obj.height_m / 2) < 3e-3) \
                & (r <= obj.radius_m + 3e-3)
            assert (side | cap).mean() > 0.99


def test_segmented_detection_recovers_3d_poses(trained3d):
    """Full pipeline on a two-solid scene: both poses within 2cm / 5deg
    (exercises rank-3 Horn fits + adjacency gating on curved geometry)."""
    objects, db = trained3d
    models = load_models_for_objects(db, "all")
    rng = np.random.default_rng(3)
    poses = [presenting_pose(rng, z=0.65), presenting_pose(rng, z=0.8)]
    poses[0][1][0] = -0.12
    poses[1][1][0] = 0.14
    image, depth = compose_scene(objects, poses)

    cfg = FusedDetectorConfig(
        n_features=2000, pipeline="segmented", q_cap=1024, radius=50.0,
        activation=ActivationConfig(m_cap=128, n_hypotheses=128),
        guess=GuessConfig(
            ransac=RansacConfig(n_hypotheses=512, min_inliers=8,
                                sensor_error=0.01, max_instances=2,
                                tight_final_fit=True),
            max_matches_per_object=256, max_active_objects=2))
    det = FusedDetector(models, cfg)
    results = det.detect(image, depth, DEFAULT_K)
    for obj, (gt_R, gt_T) in zip(objects, poses):
        mine = [r for r in results if r.object_id == obj.object_id]
        assert mine, f"{obj.object_id} not detected"
        best = max(mine, key=lambda r: r.confidence)
        dt = np.linalg.norm(best.T - gt_T)
        ang = np.degrees(np.arccos(np.clip(
            (np.trace(best.R @ gt_R.T) - 1) / 2, -1, 1)))
        assert dt < 0.02, f"{obj.object_id}: dt {dt * 1000:.1f} mm"
        assert ang < 5.0, f"{obj.object_id}: rot err {ang:.2f} deg"
        assert best.confidence >= 50, \
            f"{obj.object_id}: weak support {best.confidence}"


def test_global_pipeline_detects_3d_object(trained3d):
    """The reference-contract global-kNN pipeline also handles solids."""
    objects, db = trained3d
    models = load_models_for_objects(db, "all")
    rng = np.random.default_rng(9)
    pose = presenting_pose(rng, z=0.7)
    image, depth = compose_scene([objects[0]], [pose])
    cfg = FusedDetectorConfig(
        n_features=2000, radius=50.0, k_matches=8,
        guess=GuessConfig(
            ransac=RansacConfig(n_hypotheses=512, min_inliers=8,
                                sensor_error=0.01, max_instances=2),
            max_matches_per_object=256, max_active_objects=2))
    det = FusedDetector(models, cfg)
    results = det.detect(image, depth, DEFAULT_K)
    mine = [r for r in results if r.object_id == objects[0].object_id]
    assert mine, "box not detected through the global pipeline"
    best = max(mine, key=lambda r: r.confidence)
    assert np.linalg.norm(best.T - pose[1]) < 0.02
