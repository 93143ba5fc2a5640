"""Cell-level tests: matcher binary + float (SIFT/L2) paths, feature cell."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from tod_tpu.cells import DescriptorMatcher, FeatureDescriptor
from tod_tpu.db import InMemoryDb, write_model


def test_matcher_binary_path(rng):
    db = InMemoryDb.shared("m1")
    desc = rng.integers(0, 256, (100, 32), dtype=np.uint8)
    pts = rng.uniform(-0.1, 0.1, (100, 3)).astype(np.float32)
    write_model(db, "obj", desc, pts)

    cell = DescriptorMatcher(
        "m", search_json_params=json.dumps({"type": "LSH", "radius": 60}),
        json_db=json.dumps({"type": "mem", "collection": "m1"}))
    cell.ensure_configured()
    cell.inputs["descriptors"] = desc[:10]  # self-match
    cell.process()
    m = cell.outputs["matches"]
    assert (np.asarray(m.dist)[:, 0] == 0).all()  # exact self matches
    np.testing.assert_array_equal(m.train_idx[:, 0], np.arange(10))
    np.testing.assert_array_equal(m.obj_idx[:, 0], 0)
    m3d = cell.outputs["matches_3d"]
    np.testing.assert_allclose(m3d[:, 0], pts[:10], atol=1e-6)


def test_matcher_float_l2_path(rng):
    """The SIFT/L2 descriptor path (reference type: SIFT option,
    doc/source/index.rst:45 — never implemented there, real here)."""
    db = InMemoryDb.shared("m2")
    desc = rng.normal(size=(80, 64)).astype(np.float32)
    pts = rng.uniform(-0.1, 0.1, (80, 3)).astype(np.float32)
    write_model(db, "objf", desc, pts)

    cell = DescriptorMatcher(
        "m", search_json_params=json.dumps({"type": "L2", "radius": 3.0}),
        json_db=json.dumps({"type": "mem", "collection": "m2"}))
    cell.ensure_configured()
    assert not cell.index.is_binary
    q = desc[:7] + rng.normal(size=(7, 64)).astype(np.float32) * 0.01
    cell.inputs["descriptors"] = q
    cell.process()
    m = cell.outputs["matches"]
    np.testing.assert_array_equal(m.train_idx[:, 0], np.arange(7))
    assert (np.asarray(m.dist)[:, 0] < 0.5).all()
    assert m.valid[:, 0].all()


def test_matcher_empty_db():
    InMemoryDb.reset_shared()
    cell = DescriptorMatcher(
        "m", search_json_params=json.dumps({"type": "LSH", "radius": 35}),
        json_db=json.dumps({"type": "mem", "collection": "empty_db"}))
    cell.ensure_configured()
    cell.inputs["descriptors"] = np.zeros((5, 32), np.uint8)
    cell.process()
    assert not cell.outputs["matches"].valid.any()


def test_matcher_bare_string_object_id(rng):
    """Regression: a bare (non-JSON-list) object id string must load that
    object, not iterate character-by-character into an empty index."""
    db = InMemoryDb.shared("m3")
    desc = rng.integers(0, 256, (50, 32), dtype=np.uint8)
    pts = rng.uniform(-0.1, 0.1, (50, 3)).astype(np.float32)
    write_model(db, "obj1", desc, pts)

    cell = DescriptorMatcher(
        "m", search_json_params=json.dumps({"type": "LSH", "radius": 60}),
        json_db=json.dumps({"type": "mem", "collection": "m3"}),
        json_object_ids="obj1")
    cell.ensure_configured()
    assert cell.index.object_ids == ["obj1"]


def test_fused_detector_empty_db():
    """Regression: FusedDetector with an empty model DB must detect nothing
    instead of crashing (ZeroDivisionError in match_against_db)."""
    from tod_tpu.models import FusedDetector, FusedDetectorConfig
    from tod_tpu.geometry.detection import GuessConfig
    from tod_tpu.geometry.ransac import RansacConfig

    cfg = FusedDetectorConfig(
        n_features=128, guess=GuessConfig(
            ransac=RansacConfig(n_hypotheses=32),
            max_matches_per_object=32))
    det = FusedDetector([], cfg)
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (96, 128), np.uint8).astype(np.float32)
    depth = np.full((96, 128), 0.8, np.float32)
    K = np.array([[100, 0, 64], [0, 100, 48], [0, 0, 1]], np.float32)
    assert det.detect(image, depth, K) == []
    # batched path too
    g, d, k = det.prepare_frame(image, depth, K)
    _, out = det.detect_batch_raw(jnp.stack([g, g]), jnp.stack([d, d]),
                                  jnp.stack([k, k]))
    assert out.accepted.shape[0] == 2 and not np.asarray(out.accepted).any()


def test_trainer_batched_matches_per_view():
    """The batched Trainer (one jitted call per object) must produce exactly
    the per-view streaming results, stacked in view order."""
    import jax
    from tod_tpu.cells.trainer import _jitted_train_views
    from tod_tpu.db import InMemoryDb, insert_observation
    from tod_tpu.cells import Trainer
    from tod_tpu.utils.synthetic import SyntheticObject, turntable_observations

    InMemoryDb.reset_shared()
    db = InMemoryDb.shared("tb")
    obj = SyntheticObject.make("tb_obj", seed=5)
    views = list(turntable_observations(obj, n_views=3,
                                        elevations_deg=(60.0,)))
    for obs in views:
        insert_observation(db, "tb_obj", obs["frame_number"], obs["image"],
                           obs["depth"], obs["mask"], obs["K"], obs["R"],
                           obs["T"])
    cell = Trainer("t", json_feature_params=json.dumps(
        {"type": "ORB", "n_features": 200}))
    cell.inputs["json_db"] = json.dumps({"type": "mem", "collection": "tb"})
    cell.inputs["object_id"] = "tb_obj"
    cell.ensure_configured()
    cell.process()
    got_desc = cell.outputs["descriptors"]
    got_pts = cell.outputs["points"].reshape(-1, 3)

    # per-view reference: the same jitted program with V=1 view at a time
    img_hw = views[0]["image"].shape[:2]
    run = _jitted_train_views("ORB", 200, 3, 1.2, 20.0, img_hw,
                              views[0]["image"].ndim == 3)
    ref_desc, ref_pts = [], []
    for obs in views:
        d, w, v = run(*[jnp.asarray(np.asarray(x)[None]) for x in
                        (obs["image"], obs["mask"], obs["depth"],
                         obs["K"], obs["R"], obs["T"])])
        v = np.asarray(v)[0]
        ref_desc.append(np.asarray(d)[0][v])
        ref_pts.append(np.asarray(w)[0][v])
    np.testing.assert_array_equal(got_desc, np.concatenate(ref_desc))
    np.testing.assert_allclose(got_pts, np.concatenate(ref_pts), atol=1e-5)


def test_guess_generator_active_object_cap_exposed():
    """max_active_objects/object_batch are real cell params (forwarded by
    TodDetector), and truncation that drops matched objects warns."""
    import warnings
    from tod_tpu.cells.guess import GuessGenerator
    from tod_tpu.models import TodDetector

    det = TodDetector("d", max_active_objects=2, object_batch=1,
                      search=json.dumps({"type": "LSH", "radius": 35}),
                      json_db=json.dumps({"type": "mem", "collection": "x"}))
    det.ensure_configured()
    g = det.guess_generator
    g.ensure_configured()
    assert g._cfg.max_active_objects == 2
    assert g._cfg.object_batch == 1

    # 3 objects all matched but cap = 2 -> warn
    cell = GuessGenerator("g", max_active_objects=2, min_inliers=100,
                          n_ransac_iterations=128)
    cell.ensure_configured()
    q = 12
    rng = np.random.default_rng(1)
    cell.inputs["keypoints"] = type("KP", (), {
        "xy": rng.uniform(0, 60, (q, 2)).astype(np.float32),
        "valid": np.ones(q, bool)})()
    from tod_tpu.cells.types import MatchSet
    obj_idx = np.tile(np.array([0, 1, 2], np.int32), (q, 1))
    cell.inputs["matches"] = MatchSet(
        dist=np.ones((q, 3), np.float32),
        train_idx=np.zeros((q, 3), np.int32),
        obj_idx=obj_idx, local_idx=np.zeros((q, 3), np.int32),
        valid=np.ones((q, 3), bool))
    cell.inputs["matches_3d"] = rng.uniform(-0.1, 0.1, (q, 3, 3)).astype(
        np.float32)
    cell.inputs["points3d"] = np.full((64, 64, 3), 0.5, np.float32)
    cell.inputs["object_ids"] = ["a", "b", "c"]
    cell.inputs["spans"] = {"a": 0.3, "b": 0.3, "c": 0.3}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cell.process()
    assert any("max_active_objects" in str(x.message) for x in w)
