"""Visualization overlay smoke tests."""

import numpy as np

from tod_tpu.cells.types import PoseResult
from tod_tpu.utils.visualize import (
    draw_clusters,
    draw_detections,
    draw_keypoints,
    draw_pose_axes,
)

K = np.array([[525.0, 0, 319.5], [0, 525.0, 239.5], [0, 0, 1]])


def test_draw_keypoints_marks_pixels(rng):
    img = np.zeros((480, 640), np.uint8)
    xy = rng.uniform(50, 400, (20, 2))
    out = draw_keypoints(img, xy, valid=np.ones(20, bool))
    assert out.shape == (480, 640, 3)
    assert out.sum() > 0


def test_draw_clusters_colors(rng):
    img = np.zeros((100, 100, 3), np.uint8)
    xy = rng.uniform(10, 90, (12, 2))
    out = draw_clusters(img, xy, np.arange(12) % 3)
    assert out.sum() > 0


def test_draw_pose_axes_and_detections():
    img = np.zeros((480, 640, 3), np.uint8)
    R = np.eye(3)
    T = np.array([0.0, 0.0, 0.8])
    out = draw_pose_axes(img, K, R, T)
    assert out.sum() > 0
    res = [PoseResult(R=R, T=T, object_id="obj", confidence=12)]
    out2 = draw_detections(img, K, res)
    assert out2.sum() > out.sum() * 0.5
    # behind-camera pose draws nothing (no crash)
    out3 = draw_pose_axes(img, K, R, np.array([0.0, 0.0, -1.0]))
    assert out3.sum() == 0


def test_detector_visualize_subgraph(tmp_path):
    """TodDetector with visualize=<prefix> wires the PoseDrawer PNG sink
    (reference detector.py:84-108) and writes an annotated frame."""
    import json
    import numpy as np
    from tod_tpu.db import InMemoryDb
    from tod_tpu.models import TodDetector

    InMemoryDb.reset_shared()
    prefix = str(tmp_path / "viz")
    det = TodDetector(
        "d", visualize=prefix,
        search=json.dumps({"type": "LSH", "radius": 35}),
        json_db=json.dumps({"type": "mem", "collection": "viz_t"}))
    det.ensure_configured()
    assert hasattr(det, "pose_drawer")
    rng = np.random.default_rng(0)
    det.inputs["image"] = rng.integers(0, 255, (96, 128, 3), np.uint8)
    det.inputs["depth"] = np.full((96, 128), 800, np.uint16)
    det.inputs["K_image"] = np.array([[100, 0, 64], [0, 100, 48], [0, 0, 1]],
                                     np.float64)
    det.inputs["mask"] = None
    det.process()
    import glob
    assert glob.glob(prefix + "_poses_*.png"), "PoseDrawer wrote no PNG"


def test_trainer_visualize_pngs(tmp_path):
    import json
    import glob
    import numpy as np
    from tod_tpu.cells import Trainer
    from tod_tpu.db import InMemoryDb, insert_observation
    from tod_tpu.utils.synthetic import SyntheticObject, turntable_observations

    InMemoryDb.reset_shared()
    db = InMemoryDb.shared("viz_tr")
    obj = SyntheticObject.make("vobj", seed=6)
    for obs in turntable_observations(obj, n_views=2,
                                      elevations_deg=(60.0,)):
        insert_observation(db, "vobj", obs["frame_number"], obs["image"],
                           obs["depth"], obs["mask"], obs["K"], obs["R"],
                           obs["T"])
    prefix = str(tmp_path / "train")
    cell = Trainer("t", visualize=prefix, json_feature_params=json.dumps(
        {"type": "ORB", "n_features": 150}))
    cell.inputs["json_db"] = json.dumps({"type": "mem",
                                         "collection": "viz_tr"})
    cell.inputs["object_id"] = "vobj"
    cell.ensure_configured()
    cell.process()
    assert len(glob.glob(prefix + "_vobj_v*.png")) == 2
