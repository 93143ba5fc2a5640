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
