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
