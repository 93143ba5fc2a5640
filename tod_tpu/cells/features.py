"""Feature / depth cells.

TPU-native equivalents of the ecto_opencv cells the reference detector wires
up (python/object_recognition_tod/detector.py:26-31):
``FeatureDescriptor`` (ORB detect+describe), ``DepthTo3d`` and
``RescaledRegisteredDepth`` (ecto_image_pipeline). The math lives in
tod_tpu.ops; cells wrap jitted functions with the reference's tendril names.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tod_tpu.ops.depth import depth_to_3d, rescale_depth, to_metric_depth
from tod_tpu.ops.image import rgb_to_gray
from tod_tpu.ops.orb import orb_detect_and_compute
from tod_tpu.pipeline.cell import Cell
from tod_tpu.pipeline.tendril import Tendrils
from tod_tpu.utils.config import parse_json_params


@functools.lru_cache(maxsize=8)
def _jitted_features(feat_type: str, n_features: int, n_levels: int,
                     scale_factor: float, fast_threshold: float,
                     with_mask: bool, subpixel: bool = False):
    if feat_type == "SIFT":
        from tod_tpu.ops.sift import sift_detect_and_compute as detect

        extra = {}
    else:
        detect = orb_detect_and_compute
        extra = {"subpixel": subpixel}

    @jax.jit
    def run(gray, mask=None):
        return detect(
            gray, n_features=n_features, n_levels=n_levels,
            scale_factor=scale_factor, fast_threshold=fast_threshold,
            mask=mask, **extra)

    return run


class FeatureDescriptor(Cell):
    """ORB keypoints + descriptors (the ecto_opencv FeatureDescriptor cell,
    detector.py:27; reference feature params from conf/detection.ork:26-28)."""

    @staticmethod
    def declare_params(p: Tendrils) -> None:
        p.declare("json_feature_params",
                  "Feature parameters as a JSON string (type/n_features/"
                  "n_levels/scale_factor).",
                  default='{"type": "ORB"}')
        p.declare("json_descriptor_params",
                  "Descriptor parameters as a JSON string.",
                  default='{"type": "ORB"}')

    @staticmethod
    def declare_io(p: Tendrils, i: Tendrils, o: Tendrils) -> None:
        i.declare("image", "The input image (H,W,3) u8 or (H,W) gray.")
        i.declare("mask", "Optional detection mask (H,W).")
        i.declare("depth", "Optional depth (unused; parity with ecto port).")
        o.declare("keypoints", "Keypoints structure (padded, masked).")
        o.declare("descriptors", "(K,32) uint8 ORB bits, or (K,128) float32 "
                  "SIFT descriptors when feature type is SIFT.")

    def configure(self) -> None:
        feat = parse_json_params(self.params["json_feature_params"])
        self._type = feat.get("type", "ORB")
        if self._type not in ("ORB", "SIFT"):
            raise ValueError(
                f"feature type {self._type!r} not implemented "
                "(ORB and SIFT are supported, doc/source/index.rst:45)")
        self._n_features = int(feat.get("n_features", 1000))
        self._n_levels = int(feat.get("n_levels", 3))
        self._scale = float(feat.get("scale_factor", 1.2))
        self._fast_threshold = float(feat.get("fast_threshold", 20))
        # sub-pixel corner refinement: valuable for depthless (2D-only)
        # detection where reprojection is the only signal; off by default
        # (see ops/orb.orb_detect_and_compute)
        self._subpixel = bool(feat.get("subpixel", False))
        if self._subpixel and self._type != "ORB":
            import warnings

            warnings.warn(
                f"feature param subpixel=true is only implemented for ORB; "
                f"{self._type} keypoints keep integer coordinates")

    def process(self) -> None:
        image = np.asarray(self.inputs["image"])
        gray = jnp.asarray(image if image.ndim == 2 else image,
                           dtype=jnp.float32)
        if image.ndim == 3:
            gray = rgb_to_gray(gray)
        mask = self.inputs["mask"]
        fn = _jitted_features(self._type, self._n_features, self._n_levels,
                              self._scale, self._fast_threshold,
                              mask is not None, self._subpixel)
        if mask is not None:
            kps, desc = fn(gray, jnp.asarray(np.asarray(mask)))
        else:
            kps, desc = fn(gray)
        self.outputs["keypoints"] = jax.device_get(kps)
        self.outputs["descriptors"] = np.asarray(jax.device_get(desc))


class RescaledRegisteredDepth(Cell):
    """Rescale a registered depth map to the RGB image size
    (ecto_image_pipeline RescaledRegisteredDepth, detector.py:26; semantics of
    the trainer's rescale_depth, src/training/Trainer.cpp:63-81)."""

    @staticmethod
    def declare_io(p: Tendrils, i: Tendrils, o: Tendrils) -> None:
        i.declare("image", "The RGB image whose size the depth must match.")
        i.declare("depth_in", "The raw depth map (u16 mm or f32 m).")
        o.declare("depth", "(H,W) float32 metric depth with NaN invalids.")

    def process(self) -> None:
        image = np.asarray(self.inputs["image"])
        raw = self.inputs["depth_in"]
        depth = (np.zeros((0, 0), np.float32) if raw is None
                 else np.asarray(raw))
        if depth.size == 0:  # depthless frame: propagate empty (2D-only path)
            self.outputs["depth"] = np.zeros((0, 0), np.float32)
            return
        out = rescale_depth(jnp.asarray(depth), image.shape[:2])
        self.outputs["depth"] = np.asarray(jax.device_get(out))


class DepthTo3d(Cell):
    """Dense back-projection depth -> (H,W,3) point cloud (ecto_opencv
    calib.DepthTo3d, detector.py:62)."""

    @staticmethod
    def declare_io(p: Tendrils, i: Tendrils, o: Tendrils) -> None:
        i.declare("depth", "(H,W) float32 metric depth.")
        i.declare("K", "(3,3) camera intrinsics.")
        o.declare("points3d", "(H,W,3) float32 camera-frame points.")

    def process(self) -> None:
        depth = jnp.asarray(np.asarray(self.inputs["depth"]))
        if depth.size == 0:  # depthless frame: empty cloud (2D-only path)
            self.outputs["points3d"] = np.zeros((0, 0, 3), np.float32)
            return
        if not jnp.issubdtype(depth.dtype, jnp.floating):
            depth = to_metric_depth(depth)
        K = jnp.asarray(np.asarray(self.inputs["K"], np.float32))
        cloud = depth_to_3d(depth, K)
        self.outputs["points3d"] = np.asarray(jax.device_get(cloud))
