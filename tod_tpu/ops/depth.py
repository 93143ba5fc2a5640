"""Depth ops: validity, metric conversion, rescale, pinhole back-projection.

TPU-native equivalents of OpenCV's rgbd module as used by the reference:
``rescaleDepth`` + NN-resize-with-NaN-fill (src/training/Trainer.cpp:63-81),
``isValidDepth`` (src/training/training.cpp:107-129), ``depthTo3dSparse``
(Trainer.cpp:168) and the dense ``DepthTo3d`` cell (detector.py:62).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tod_tpu.ops.image import resize_nearest


def to_metric_depth(depth: jax.Array) -> jax.Array:
    """Convert a depth map to float32 meters with NaN for invalid pixels
    (cv::rescaleDepth semantics). Integer maps are millimeters; 0, saturated
    u16 (65535) and non-positive i16 values (CV_16S sensors use negative
    sentinels — training.cpp:107-129 handles both 16U and 16S) are invalid.
    Float maps pass through, non-finite or non-positive -> NaN."""
    if jnp.issubdtype(depth.dtype, jnp.integer):
        d = depth.astype(jnp.float32)
        invalid = (d <= 0.0) | (d >= 65535.0)
        return jnp.where(invalid, jnp.nan, d / 1000.0)
    d = depth.astype(jnp.float32)
    return jnp.where(jnp.isfinite(d) & (d > 0), d, jnp.nan)


def rescale_depth(depth: jax.Array, image_hw: Tuple[int, int]) -> jax.Array:
    """Match the reference's ``rescale_depth`` (Trainer.cpp:63-81): convert to
    metric float32; if sizes differ, NN-resize by the width ratio into the top
    subregion of an image-sized NaN canvas (aspect-ratio preserving)."""
    d = to_metric_depth(depth)
    ih, iw = image_hw
    dh, dw = depth.shape
    if (dh, dw) == (ih, iw):
        return d
    factor = float(iw) / float(dw)
    sub_h = min(ih, int(dh * factor))
    sub = resize_nearest(d, (sub_h, iw))
    out = jnp.full((ih, iw), jnp.nan, jnp.float32)
    return out.at[:sub_h].set(sub)


def is_valid_depth(depth_m: jax.Array) -> jax.Array:
    """Validity of metric depth: finite (NaN marks invalid after conversion)."""
    return jnp.isfinite(depth_m)


def depth_to_3d_sparse(depth_m: jax.Array, K: jax.Array, xy: jax.Array) -> jax.Array:
    """Back-project integer pixel coords through the pinhole.

    ``depth_m``: (H,W) float32 meters. ``K``: (3,3). ``xy``: (N,2) float/int
    pixel coordinates (x, y). Returns (N,3) camera-frame points; NaN where the
    depth is invalid. cv::depthTo3dSparse analog (Trainer.cpp:168).
    """
    K = K.astype(jnp.float32)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    h, w = depth_m.shape
    xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, h - 1)
    z = depth_m[yi, xi]
    x = (xy[:, 0].astype(jnp.float32) - cx) * z / fx
    y = (xy[:, 1].astype(jnp.float32) - cy) * z / fy
    return jnp.stack([x, y, z], axis=-1)


def depth_to_3d(depth_m: jax.Array, K: jax.Array) -> jax.Array:
    """Dense back-projection: (H,W) depth -> (H,W,3) camera-frame point cloud
    (the ecto_opencv DepthTo3d cell, detector.py:62)."""
    K = K.astype(jnp.float32)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    h, w = depth_m.shape
    us = jnp.arange(w, dtype=jnp.float32)[None, :]
    vs = jnp.arange(h, dtype=jnp.float32)[:, None]
    x = (us - cx) * depth_m / fx
    y = (vs - cy) * depth_m / fy
    return jnp.stack([x, y, depth_m], axis=-1)
