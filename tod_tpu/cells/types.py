"""Shared cell-boundary types.

``PoseResult`` mirrors object_recognition_core's PoseResult as consumed from
GuessGenerator (src/detection/GuessGenerator.cpp:224-230: set_R / set_T /
set_object_id). ``MatchSet`` is the static-shape replacement for OpenCV's
``vector<vector<DMatch>>`` + per-match 3D gather mats
(DescriptorMatcher.cpp:142-152): fixed (Q, k) arrays + validity masks.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass
class PoseResult:
    """One detected object instance: object/world frame -> camera frame."""

    R: np.ndarray                 # (3,3)
    T: np.ndarray                 # (3,)
    object_id: str
    confidence: float = 0.0       # unique-inlier count (the reference's score)
    db_params: Optional[dict] = None
    rms_residual: float = 0.0     # RMS 3D residual (m) of the pose over its
                                  # inliers (serving pipeline; 0 = n/a)
    clique_size: int = 0          # greedy inlier-clique statistic (serving)
    quality: float = 0.0          # fused serving confidence (confidence_v2:
                                  # inliers + residual + clique; gate with
                                  # min_quality for high-precision serving)

    def set_R(self, R):  # reference-style setters
        self.R = np.asarray(R, np.float32).reshape(3, 3)

    def set_T(self, T):
        self.T = np.asarray(T, np.float32).reshape(3)

    def set_object_id(self, db_params, object_id):
        self.db_params = db_params
        self.object_id = object_id


@dataclass
class MatchSet:
    """Top-k matches of every query keypoint against the whole model DB.

    ``train_idx`` are *global* DB rows; ``obj_idx`` maps each match to the
    model it came from (the DMatch.imgIdx analog); ``local_idx`` is the row
    within that model (the DMatch.trainIdx analog).
    """

    dist: np.ndarray       # (Q, k) float32
    train_idx: np.ndarray  # (Q, k) int32 global DB row
    obj_idx: np.ndarray    # (Q, k) int32 model index
    local_idx: np.ndarray  # (Q, k) int32 row within the model
    valid: np.ndarray      # (Q, k) bool

    @property
    def k(self) -> int:
        return self.dist.shape[1]
