"""GuessGenerator cell: matches -> 6-DoF object pose guesses.

TPU-native rebuild of src/detection/GuessGenerator.cpp: cluster matches per
object, build geometric-consistency graphs, repeatedly run graph-constrained
RANSAC with inlier invalidation, and emit PoseResults + Rs/Ts. All the math
is the single jitted function in tod_tpu.geometry.detection; this cell adapts
the dataflow-graph tendril interface (declare_params parity:
GuessGenerator.cpp:71-81, declare_io parity: :83-99).
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from tod_tpu.cells.types import MatchSet, PoseResult
from tod_tpu.geometry.detection import GuessConfig, detect_frame_from_matches
from tod_tpu.geometry.ransac import RansacConfig
from tod_tpu.pipeline.cell import Cell
from tod_tpu.utils.transfer import fetch_arrays
from tod_tpu.pipeline.tendril import Tendrils
from tod_tpu.utils.config import parse_json_params


@functools.lru_cache(maxsize=8)
def _jitted_detect(cfg: GuessConfig):
    return jax.jit(functools.partial(detect_frame_from_matches, cfg=cfg))


class GuessGenerator(Cell):
    @staticmethod
    def declare_params(p: Tendrils) -> None:
        p.declare("min_inliers", "Minimum number of inliers", default=15)
        p.declare("n_ransac_iterations", "Number of RANSAC iterations "
                  "(hypothesis batch size here).", default=1000)
        p.declare("sensor_error", "The error (in meters) from the sensor",
                  default=0.01)
        p.declare("visualize", "If true, debug visualization output",
                  default=False)
        p.declare("db", "The DB parameters as a JSON string", default="{}")
        p.declare("max_instances",
                  "Static cap on instances found per object", default=5)
        p.declare("max_matches_per_object",
                  "Static per-object match capacity", default=1024)
        p.declare("max_active_objects",
                  "Pose search runs only on the top-N objects by "
                  "within-radius match count (bounds geometry cost as the "
                  "DB grows; the reference iterates every matched object, "
                  "GuessGenerator.cpp:170). A warning is logged when this "
                  "cap drops matched objects.", default=16)
        p.declare("object_batch",
                  "Objects vmapped per pose-search step (memory/throughput "
                  "trade-off; does not change results).", default=8)
        p.declare("seed", "PRNG seed for hypothesis sampling", default=0)

    @staticmethod
    def declare_io(p: Tendrils, i: Tendrils, o: Tendrils) -> None:
        i.declare("image", "The original image (visualization only).")
        i.declare("K", "3x3 camera matrix — enables the 2D-only P3P path "
                  "when the point cloud is empty (the reference left this "
                  "unimplemented, GuessGenerator.cpp:147-152).",
                  default=None)
        i.declare("points3d", "(H,W,3) camera-frame point cloud.")
        i.declare("keypoints", "The query keypoints structure.")
        i.declare("matches", "MatchSet from the DescriptorMatcher.")
        i.declare("matches_3d", "(Q,k,3) matched training points.")
        i.declare("spans", "{object_id: span}.")
        i.declare("object_ids", "Model index -> object id list.")
        o.declare("pose_results", "List of PoseResult.")
        o.declare("Rs", "Rotations of the poses (for visualization).")
        o.declare("Ts", "Translations of the poses.")

    def configure(self) -> None:
        self._db_params = parse_json_params(self.params["db"])
        # Hypothesis batch: round the sequential iteration count to a
        # TPU-friendly batch (the adaptive loop usually stops far earlier
        # than n_iterations; a full parallel batch is strictly more search).
        n_hyp = max(128, min(int(self.params["n_ransac_iterations"]), 4096))
        self._cfg = GuessConfig(
            ransac=RansacConfig(
                n_hypotheses=n_hyp,
                min_inliers=int(self.params["min_inliers"]),
                sensor_error=float(self.params["sensor_error"]),
                max_instances=int(self.params["max_instances"])),
            max_matches_per_object=int(self.params["max_matches_per_object"]),
            max_active_objects=int(self.params["max_active_objects"]),
            object_batch=int(self.params["object_batch"]))
        self._key = jax.random.PRNGKey(int(self.params["seed"]))

    def process(self) -> None:
        kps = self.inputs["keypoints"]
        matches: MatchSet = self.inputs["matches"]
        matches_3d = np.asarray(self.inputs["matches_3d"])
        cloud = np.asarray(self.inputs["points3d"])
        object_ids: List[str] = list(self.inputs["object_ids"])
        spans_map = dict(self.inputs["spans"])

        pose_results: List[PoseResult] = []
        rs: List[np.ndarray] = []
        ts: List[np.ndarray] = []
        if not object_ids or matches.dist.size == 0:
            self.outputs["pose_results"] = pose_results
            self.outputs["Rs"] = rs
            self.outputs["Ts"] = ts
            return
        if cloud.size == 0:
            # 2D-only path: empty TODO in the reference
            # (GuessGenerator.cpp:147-152); implemented here via vmapped P3P
            # + reprojection consensus when the camera matrix is wired in.
            K = self.inputs["K"]
            if K is None:
                self.outputs["pose_results"] = pose_results
                self.outputs["Rs"] = rs
                self.outputs["Ts"] = ts
                return
            self._process_2d(np.asarray(K, np.float32))
            return

        kp_xy = np.asarray(kps.xy, np.float32)
        kp_valid = np.asarray(kps.valid)
        h, w = cloud.shape[:2]
        xi = np.clip(kp_xy[:, 0].astype(np.int32), 0, w - 1)
        yi = np.clip(kp_xy[:, 1].astype(np.int32), 0, h - 1)
        query_pts = cloud[yi, xi].astype(np.float32)
        query_pts[~kp_valid] = np.nan

        spans = np.asarray([spans_map[o] for o in object_ids], np.float32)

        n_matched = len(np.unique(
            matches.obj_idx[matches.valid & (matches.obj_idx >= 0)]))
        if n_matched > self._cfg.max_active_objects:
            import warnings

            warnings.warn(
                f"{n_matched} objects have matches but max_active_objects="
                f"{self._cfg.max_active_objects}: pose search drops the "
                f"{n_matched - self._cfg.max_active_objects} least-matched "
                "objects (raise the max_active_objects param to search all)")

        self._key, sub = jax.random.split(self._key)
        _, det = _jitted_detect(self._cfg)(
            sub, jnp.asarray(matches.obj_idx),
            jnp.asarray(matches.dist), jnp.asarray(matches.valid),
            jnp.asarray(matches_3d), jnp.asarray(query_pts),
            jnp.asarray(kp_xy), jnp.asarray(spans))

        det_r, det_t, det_n, det_acc = fetch_arrays(
            det.R, det.T, det.n_inliers, det.accepted)

        for o, object_id in enumerate(object_ids):
            for inst in range(det_acc.shape[1]):
                if det_acc[o, inst]:
                    pr = PoseResult(R=det_r[o, inst], T=det_t[o, inst],
                                    object_id=object_id,
                                    confidence=float(det_n[o, inst]),
                                    db_params=self._db_params)
                    pose_results.append(pr)
                    rs.append(det_r[o, inst])
                    ts.append(det_t[o, inst])

        self.outputs["pose_results"] = pose_results
        self.outputs["Rs"] = rs
        self.outputs["Ts"] = ts

        viz = self.params["visualize"]
        if viz:
            # headless analog of the reference's highgui windows
            # (GuessGenerator.cpp:163-167, 211-221): per-object cluster +
            # inlier-keypoint overlays saved as PNGs under the given prefix.
            import cv2

            from tod_tpu.utils.visualize import draw_clusters

            prefix = viz if isinstance(viz, str) else "/tmp/tod_tpu_viz"
            image = np.asarray(self.inputs["image"])
            flat_valid = matches.valid.any(axis=1) & kp_valid
            cluster = np.where(matches.valid, matches.obj_idx, -1).max(axis=1)
            overlay = draw_clusters(image, kp_xy[flat_valid],
                                    cluster[flat_valid])
            self._viz_counter = getattr(self, "_viz_counter", 0) + 1
            cv2.imwrite(f"{prefix}_clusters_{self._viz_counter:04d}.png",
                        overlay)

    def _process_2d(self, K: np.ndarray) -> None:
        """2D-only pose search: P3P graph-RANSAC scored by reprojection
        consensus (geometry/detection2d.py). Capability the reference
        lacks — its docs state "Pipeline does not work with 2D only input"
        (doc/source/index.rst:46)."""
        from tod_tpu.geometry.detection2d import Pnp2dConfig, detect_frame_2d

        kps = self.inputs["keypoints"]
        matches: MatchSet = self.inputs["matches"]
        matches_3d = np.asarray(self.inputs["matches_3d"])
        object_ids: List[str] = list(self.inputs["object_ids"])

        kp_xy = np.asarray(kps.xy, np.float32)
        kp_valid = np.asarray(kps.valid)
        valid = matches.valid & kp_valid[:, None]

        rcfg = self._cfg.ransac
        cfg2d = Pnp2dConfig(
            n_hypotheses=min(rcfg.n_hypotheses, 512),
            min_inliers=rcfg.min_inliers,
            max_instances=rcfg.max_instances)
        self._key, sub = jax.random.split(self._key)
        det = _jitted_detect_2d(cfg2d, self._cfg.max_matches_per_object)(
            sub, jnp.asarray(matches.obj_idx), jnp.asarray(matches.dist),
            jnp.asarray(valid), jnp.asarray(matches_3d),
            jnp.asarray(kp_xy), jnp.asarray(K),
            jnp.arange(len(object_ids), dtype=jnp.int32))

        det_r, det_t, det_n, det_acc = fetch_arrays(
            det.R, det.T, det.n_inliers, det.accepted)

        pose_results: List[PoseResult] = []
        rs: List[np.ndarray] = []
        ts: List[np.ndarray] = []
        for o, object_id in enumerate(object_ids):
            for inst in range(det_acc.shape[1]):
                if det_acc[o, inst]:
                    pose_results.append(PoseResult(
                        R=det_r[o, inst], T=det_t[o, inst],
                        object_id=object_id,
                        confidence=float(det_n[o, inst]),
                        db_params=self._db_params))
                    rs.append(det_r[o, inst])
                    ts.append(det_t[o, inst])
        self.outputs["pose_results"] = pose_results
        self.outputs["Rs"] = rs
        self.outputs["Ts"] = ts


@functools.lru_cache(maxsize=8)
def _jitted_detect_2d(cfg, max_matches: int):
    from tod_tpu.geometry.detection2d import detect_frame_2d

    return jax.jit(functools.partial(detect_frame_2d, cfg=cfg,
                                     max_matches=max_matches))
