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
