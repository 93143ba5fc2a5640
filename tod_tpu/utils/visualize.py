"""Visualization: keypoint / cluster / pose overlays.

TPU hosts have no display, so the reference's highgui windows
(Trainer.cpp:173-180; detector.py:86-108 DrawKeypoints + PosesDrawer;
GuessGenerator's per-cluster/inlier overlays, SURVEY.md section 5) become
image-returning helpers; callers save PNGs or stream them elsewhere.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence, Tuple

import cv2
import numpy as np

# the reference's debug color rotation (GuessGenerator.cpp:71-81 configure)
COLORS: List[Tuple[int, int, int]] = [
    (255, 255, 0), (0, 255, 255), (255, 0, 255), (255, 0, 0), (0, 255, 0),
    (0, 0, 255), (0, 0, 0), (85, 85, 85), (170, 170, 170), (255, 255, 255),
]


def _as_bgr(image: np.ndarray) -> np.ndarray:
    img = np.asarray(image)
    if img.ndim == 2:
        return cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_GRAY2BGR)
    return np.ascontiguousarray(img.astype(np.uint8))


def draw_keypoints(image: np.ndarray, xy: np.ndarray,
                   valid: Optional[np.ndarray] = None,
                   color: Tuple[int, int, int] = (255, 0, 0),
                   radius: int = 3) -> np.ndarray:
    """ecto_opencv DrawKeypoints analog: circles at keypoint locations."""
    out = _as_bgr(image)
    xy = np.asarray(xy)
    for i, (x, y) in enumerate(xy):
        if valid is not None and not valid[i]:
            continue
        cv2.circle(out, (int(round(float(x))), int(round(float(y)))),
                   radius, color, 1)
    return out


def draw_clusters(image: np.ndarray, xy: np.ndarray,
                  cluster_ids: np.ndarray,
                  valid: Optional[np.ndarray] = None) -> np.ndarray:
    """DrawClustersPerObject analog (adjacency_ransac.cpp:208-230): one color
    per object cluster."""
    out = _as_bgr(image)
    for i, (x, y) in enumerate(np.asarray(xy)):
        if valid is not None and not valid[i]:
            continue
        c = COLORS[int(cluster_ids[i]) % len(COLORS)]
        cv2.circle(out, (int(round(float(x))), int(round(float(y)))), 3, c, 1)
    return out


def draw_pose_axes(image: np.ndarray, K: np.ndarray, R: np.ndarray,
                   T: np.ndarray, axis_len: float = 0.1,
                   thickness: int = 2) -> np.ndarray:
    """PosesDrawer analog (detector.py:105-108): project the object frame's
    axes through the pose (model->camera) and draw x=red, y=green, z=blue."""
    out = _as_bgr(image)
    K = np.asarray(K, np.float64)
    pts_obj = np.float64([[0, 0, 0], [axis_len, 0, 0], [0, axis_len, 0],
                          [0, 0, axis_len]])
    cam = pts_obj @ np.asarray(R, np.float64).T + np.asarray(T, np.float64)
    if (cam[:, 2] <= 1e-6).any():
        return out
    pix = (cam @ K.T)
    pix = (pix[:, :2] / pix[:, 2:3]).astype(int)
    o = tuple(pix[0])
    for end, color in zip(pix[1:], [(0, 0, 255), (0, 255, 0), (255, 0, 0)]):
        cv2.line(out, o, tuple(end), color, thickness)
    return out


def draw_detections(image: np.ndarray, K: np.ndarray,
                    pose_results: Iterable) -> np.ndarray:
    """Overlay every detected pose's axes + object id label."""
    out = _as_bgr(image)
    for i, r in enumerate(pose_results):
        out = draw_pose_axes(out, K, r.R, r.T)
        cam = np.asarray(r.T, np.float64)
        pix = K @ cam
        if pix[2] > 1e-6:
            x, y = int(pix[0] / pix[2]), int(pix[1] / pix[2])
            cv2.putText(out, f"{r.object_id} ({int(r.confidence)})",
                        (x + 6, y - 6), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                        COLORS[i % len(COLORS)], 1)
    return out
