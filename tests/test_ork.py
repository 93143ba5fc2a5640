"""Config smoke tests: all conf/*.ork parse and instantiate
(the reference's object_recognition_core_config_test analog,
test/CMakeLists.txt:2-4 — instantiate the graph, don't run it) plus one real
mini run of the detection .ork on synthetic frames.
"""

import json
import os

import numpy as np
import pytest

from tod_tpu.pipeline import build_pipeline_from_ork, load_ork
from tod_tpu.utils.synthetic import DEFAULT_K

CONF = os.path.join(os.path.dirname(__file__), "..", "conf")


def _fake_frames(n=2):
    rng = np.random.default_rng(0)
    return [dict(image=rng.integers(0, 255, (48, 64, 3), dtype=np.uint8),
                 depth=np.full((48, 64), 800, np.uint16),
                 K=DEFAULT_K) for _ in range(n)]


MEM_DB = {"type": "mem", "collection": "ork_smoke"}


def test_training_ork_instantiates():
    p = build_pipeline_from_ork(
        os.path.join(CONF, "training.ork"),
        overrides={"pipeline1": {"db": MEM_DB}})
    assert "pipeline1" in p.cells
    cell = p.cells["pipeline1"]
    assert "ORB" in cell.params["json_feature_params"]
    assert json.loads(cell.params["json_db"])["type"] == "mem"


def test_detection_ork_instantiates():
    p = build_pipeline_from_ork(
        os.path.join(CONF, "detection.ork"),
        overrides={"source1": {"frames": _fake_frames()},
                   "pipeline1": {"db": MEM_DB}})
    assert set(p.cells) == {"source1", "pipeline1"}
    det = p.cells["pipeline1"]
    assert det.params["json_object_ids"] == "all"
    feat = json.loads(det.params["json_feature_params"])
    assert feat["n_features"] == 5000


def test_detection_ros_ork_instantiates():
    p = build_pipeline_from_ork(
        os.path.join(CONF, "detection.ros.ork"),
        overrides={"source1": {"frames": _fake_frames()},
                   "pipeline1": {"db": MEM_DB}})
    assert set(p.cells) == {"source1", "sink1", "sink2", "voter1", "pipeline1"}
    # wiring: source -> pipeline, pipeline -> voter -> sink1, pipeline/source -> sink2
    edges = {(c.src.name, c.dst.name) for c in p.plasm.connections}
    assert ("source1", "pipeline1") in edges
    assert ("pipeline1", "voter1") in edges
    assert ("voter1", "sink1") in edges


def test_detection_ork_executes_on_synthetic_frames():
    """A real (tiny) run: empty model DB -> zero poses, but the whole graph
    schedules end to end."""
    p = build_pipeline_from_ork(
        os.path.join(CONF, "detection.ork"),
        overrides={
            "source1": {"frames": _fake_frames()},
            "pipeline1": {"db": MEM_DB,
                          "feature": {"type": "ORB", "n_features": 64,
                                      "n_levels": 1, "scale_factor": 1.2},
                          "n_ransac_iterations": 128},
        })
    p.execute(1)
    assert p.cells["pipeline1"].outputs["pose_results"] == []


def test_reference_style_ork_parses():
    """The loader accepts the reference's exact YAML shape (keys + modules)."""
    doc = load_ork(os.path.join(CONF, "detection.ros.ork"))
    assert doc["pipeline1"]["module"] == "object_recognition_tod"
    assert doc["source1"]["type"] == "RosKinect"
