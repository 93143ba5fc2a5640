"""Trainer + ModelFiller cells: build a TOD model from turntable observations.

TPU-native rebuild of src/training/Trainer.cpp + ModelFiller.cpp: per
observation run ORB on the masked view, validate keypoints against the eroded
mask + depth (training.cpp:57-145), back-project to 3D and transform
camera->world (training.cpp:175-195), stack across views (mergePoints,
training.cpp:147-173), and pack the stacked model into a DB document.

The whole per-view pipeline (ORB -> validate -> backproject -> to-world) is
one jitted function; views stream through it (the reference's per-view loop,
Trainer.cpp:134-181).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tod_tpu.db import Document, ObjectDbParameters, observations_for_object
from tod_tpu.geometry.transforms import camera_to_world
from tod_tpu.ops.depth import depth_to_3d_sparse, rescale_depth
from tod_tpu.ops.image import rgb_to_gray
from tod_tpu.ops.morphology import validate_keypoints
from tod_tpu.ops.orb import orb_detect_and_compute
from tod_tpu.pipeline.cell import Cell
from tod_tpu.pipeline.tendril import Tendrils
from tod_tpu.utils.config import parse_json_params


@functools.lru_cache(maxsize=8)
def _jitted_train_view(n_features: int, n_levels: int, scale_factor: float,
                       fast_threshold: float):
    """(gray, mask, depth_m, K, R, T) -> (descriptors, world points, valid)."""

    @jax.jit
    def run(gray, mask, depth_m, K, R, T):
        kps, desc = orb_detect_and_compute(
            gray, n_features=n_features, n_levels=n_levels,
            scale_factor=scale_factor, fast_threshold=fast_threshold,
            mask=mask)
        val = validate_keypoints(kps.xy, kps.valid, mask, depth_m)
        cam_pts = depth_to_3d_sparse(depth_m, K, val.xy.astype(jnp.float32))
        world = camera_to_world(R, T, cam_pts)
        return desc, world, val.valid

    return run


class Trainer(Cell):
    @staticmethod
    def declare_params(p: Tendrils) -> None:
        p.declare("json_feature_params",
                  'Feature params JSON: {"type": "ORB", "n_features": ...,'
                  ' "n_levels": ..., "scale_factor": ...}',
                  default='{"type": "ORB"}', required=True)
        p.declare("json_descriptor_params",
                  'Descriptor params JSON: {"type": "ORB", ...}',
                  default='{"type": "ORB"}', required=True)
        p.declare("visualize", "If true, debug data is visualized.",
                  default=False)
        p.declare("dedup_hamming",
                  "Model compression: drop descriptors within this Hamming "
                  "distance of an earlier one at (near) the same 3D point. "
                  "0 disables (reference-parity). Shrinks the matcher DB "
                  "2-4x on turntable captures.", default=0)
        p.declare("dedup_point_m",
                  "3D distance (meters) for the dedup same-place test.",
                  default=0.005)

    @staticmethod
    def declare_io(p: Tendrils, i: Tendrils, o: Tendrils) -> None:
        i.declare("json_db", "The parameters of the DB as a JSON string.",
                  required=True)
        i.declare("object_id", "The id of the object in the DB.",
                  required=True)
        o.declare("descriptors", "The stacked descriptors (N,32) u8.")
        o.declare("points", "The 3d positions (1,N,3) f32, world frame.")

    def configure(self) -> None:
        feat = parse_json_params(self.params["json_feature_params"])
        if feat.get("type", "ORB") != "ORB":
            raise ValueError("training supports ORB features "
                             "(the reference hardcodes ORB too, "
                             "Trainer.cpp:143-150)")
        self._n_features = int(feat.get("n_features", 1000))
        self._n_levels = int(feat.get("n_levels", 3))
        self._scale = float(feat.get("scale_factor", 1.2))
        self._fast_threshold = float(feat.get("fast_threshold", 20))

    def process(self) -> None:
        db = ObjectDbParameters(self.inputs["json_db"]).generate_db()
        observations = observations_for_object(db, self.inputs["object_id"])

        run = _jitted_train_view(self._n_features, self._n_levels,
                                 self._scale, self._fast_threshold)
        desc_all: List[np.ndarray] = []
        pts_all: List[np.ndarray] = []
        for obs in observations:
            image = np.asarray(obs.image)
            gray = jnp.asarray(image, jnp.float32)
            if image.ndim == 3:
                gray = rgb_to_gray(gray)
            depth_m = rescale_depth(jnp.asarray(obs.depth), image.shape[:2])
            desc, world, valid = run(
                gray, jnp.asarray(np.asarray(obs.mask)), depth_m,
                jnp.asarray(np.asarray(obs.K, np.float32)),
                jnp.asarray(np.asarray(obs.R, np.float32)),
                jnp.asarray(np.asarray(obs.T, np.float32)))
            valid = np.asarray(jax.device_get(valid))
            if valid.any():
                desc_all.append(np.asarray(jax.device_get(desc))[valid])
                pts_all.append(np.asarray(jax.device_get(world))[valid])

        # mergePoints (training.cpp:147-173)
        if desc_all:
            descriptors = np.concatenate(desc_all)
            points = np.concatenate(pts_all).astype(np.float32)
        else:
            descriptors = np.zeros((0, 32), np.uint8)
            points = np.zeros((0, 3), np.float32)

        dedup = int(self.params["dedup_hamming"])
        if dedup > 0 and len(descriptors) > 1:
            from tod_tpu.ops.compress import compress_model

            descriptors, points = compress_model(
                descriptors, points, hamming_threshold=dedup,
                point_threshold=float(self.params["dedup_point_m"]))

        self.outputs["descriptors"] = descriptors
        self.outputs["points"] = points.reshape(1, -1, 3)


class ModelFiller(Cell):
    """Packs points + descriptors into a DB document
    (src/training/ModelFiller.cpp:11-26)."""

    @staticmethod
    def declare_io(p: Tendrils, i: Tendrils, o: Tendrils) -> None:
        i.declare("points", "The 3d position of the points.")
        i.declare("descriptors", "The descriptors.")
        o.declare("db_document", "The filled document.")

    def process(self) -> None:
        doc = Document(fields={"Type": "Model", "method": "TOD"})
        doc.set_attachment("descriptors",
                           np.asarray(self.inputs["descriptors"], np.uint8))
        doc.set_attachment("points",
                           np.asarray(self.inputs["points"], np.float32))
        self.outputs["db_document"] = doc
