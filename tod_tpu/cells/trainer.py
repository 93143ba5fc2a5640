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
def _jitted_train_views(feat_type: str, n_features: int, n_levels: int,
                        scale_factor: float, fast_threshold: float,
                        img_hw: Tuple[int, int], rgb: bool,
                        subpixel: bool = False):
    """One jitted program for a whole view batch:
    (images, masks, depths, Ks, Rs, Ts) stacked over the view axis ->
    (descriptors (V,K,32), world points (V,K,3), valid (V,K)).

    The reference streams views one at a time through cv::ORB
    (Trainer.cpp:134-181); batching the view axis is the TPU-native form —
    one dispatch + one host transfer per object instead of per view
    (the sharded multi-chip variant is parallel.train.train_views_sharded).
    """
    from tod_tpu.parallel.train import train_views_step

    @jax.jit
    def run(images, masks, depths, Ks, Rs, Ts):
        grays = jax.vmap(rgb_to_gray)(images.astype(jnp.float32)) if rgb \
            else images.astype(jnp.float32)
        depths_m = jax.vmap(lambda d: rescale_depth(d, img_hw))(depths)
        return train_views_step(
            grays, masks, depths_m, Ks, Rs, Ts, n_features=n_features,
            n_levels=n_levels, scale_factor=scale_factor,
            fast_threshold=fast_threshold, feature_type=feat_type,
            subpixel=subpixel)

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
        self._type = feat.get("type", "ORB")
        if self._type not in ("ORB", "SIFT"):
            # the reference hardcodes ORB (Trainer.cpp:143-150); we support
            # the documented SIFT option too (doc/source/index.rst:45)
            raise ValueError(f"training supports ORB or SIFT features, "
                             f"not {self._type!r}")
        self._n_features = int(feat.get("n_features", 1000))
        self._n_levels = int(feat.get("n_levels", 3))
        self._scale = float(feat.get("scale_factor", 1.2))
        self._fast_threshold = float(feat.get("fast_threshold", 20))
        # trainer-side sub-pixel model points (ORB only, default off =
        # reference-parity integer snap, training.cpp:88-102); pair with the
        # detection-side "subpixel" feature param (cells/features.py)
        self._subpixel = bool(feat.get("subpixel", False))
        if self._subpixel and self._type != "ORB":
            import warnings

            warnings.warn(
                f"feature param subpixel=true is only implemented for ORB; "
                f"{self._type} training keeps integer coordinates")

    def process(self) -> None:
        db = ObjectDbParameters(self.inputs["json_db"]).generate_db()
        observations = observations_for_object(db, self.inputs["object_id"])

        # group views by shape so each group is ONE batched jitted dispatch
        # (turntable captures share one camera, so normally one group)
        groups: dict = {}
        for obs in observations:
            image = np.asarray(obs.image)
            key = (image.shape, np.asarray(obs.depth).shape)
            groups.setdefault(key, []).append(obs)

        desc_all: List[np.ndarray] = []
        pts_all: List[np.ndarray] = []
        for (img_shape, _), group in groups.items():
            run = _jitted_train_views(
                self._type, self._n_features, self._n_levels, self._scale,
                self._fast_threshold, img_shape[:2], len(img_shape) == 3,
                self._subpixel)
            images = np.stack([np.asarray(o.image) for o in group])
            masks = np.stack([np.asarray(o.mask) for o in group])
            depths = np.stack([np.asarray(o.depth) for o in group])
            Ks = np.stack([np.asarray(o.K, np.float32) for o in group])
            Rs = np.stack([np.asarray(o.R, np.float32) for o in group])
            Ts = np.stack([np.asarray(o.T, np.float32) for o in group])
            desc, world, valid = run(jnp.asarray(images), jnp.asarray(masks),
                                     jnp.asarray(depths), jnp.asarray(Ks),
                                     jnp.asarray(Rs), jnp.asarray(Ts))
            valid = np.asarray(jax.device_get(valid))       # (V, K)
            desc = np.asarray(jax.device_get(desc))         # (V, K, 32)
            world = np.asarray(jax.device_get(world))       # (V, K, 3)
            flat = valid.reshape(-1)
            if flat.any():
                desc_all.append(desc.reshape(-1, desc.shape[-1])[flat])
                pts_all.append(world.reshape(-1, 3)[flat])

            viz = self.params["visualize"]
            if viz:
                # the reference pops a window per observation with the
                # surviving keypoints (Trainer.cpp:173-180); headless: PNGs
                # of the validated points projected back into each view
                import cv2

                from tod_tpu.utils.visualize import draw_keypoints

                prefix = viz if isinstance(viz, str) else "/tmp/tod_tpu_train"
                for v in range(min(len(group), 4)):
                    cam = world[v][valid[v]] @ Rs[v].T + Ts[v]
                    pix = cam @ Ks[v].T
                    xy = pix[:, :2] / np.maximum(pix[:, 2:3], 1e-6)
                    overlay = draw_keypoints(images[v], xy)
                    cv2.imwrite(
                        f"{prefix}_{self.inputs['object_id']}_v{v:02d}.png",
                        overlay if overlay.ndim == 2 else overlay[..., ::-1])

        # mergePoints (training.cpp:147-173)
        if desc_all:
            descriptors = np.concatenate(desc_all)
            points = np.concatenate(pts_all).astype(np.float32)
        else:
            descriptors = np.zeros((0, 32), np.uint8)
            points = np.zeros((0, 3), np.float32)

        dedup = int(self.params["dedup_hamming"])
        if dedup > 0 and len(descriptors) > 1 \
                and descriptors.dtype == np.uint8:  # Hamming dedup: ORB only
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
        desc = np.asarray(self.inputs["descriptors"])
        if desc.dtype != np.float32:  # binary ORB bits; floats = SIFT path
            desc = desc.astype(np.uint8)
        doc.set_attachment("descriptors", desc)
        doc.set_attachment("points",
                           np.asarray(self.inputs["points"], np.float32))
        self.outputs["db_document"] = doc
