"""TodDetector: the detection pipeline BlackBox.

API-parity rebuild of python/object_recognition_tod/detector.py:15-110 —
same cells, same forwards, same direct params, same dataflow wiring — on the
tod_tpu pipeline runtime. For production throughput use
tod_tpu.models.fused.FusedDetector (one jitted function for the whole frame);
this BlackBox is the flexible/compatible graph form.
"""

from __future__ import annotations

from tod_tpu.cells.features import (
    DepthTo3d,
    FeatureDescriptor,
    RescaledRegisteredDepth,
)
from tod_tpu.cells.guess import GuessGenerator
from tod_tpu.cells.io import PassthroughN
from tod_tpu.cells.matcher import DescriptorMatcher
from tod_tpu.pipeline.blackbox import BlackBox
from tod_tpu.pipeline.cell import CellInfo, Forward
from tod_tpu.pipeline.tendril import Tendrils


class TodDetector(BlackBox):
    @classmethod
    def declare_cells(cls, p: Tendrils):
        cells = {
            "depth_map": CellInfo(RescaledRegisteredDepth),
            "passthrough": CellInfo(
                PassthroughN,
                {"items": {"image": "An image",
                           "K_image": "The camera matrix"}}),
        }
        if p["pipeline"] == "segmented":
            # the TPU-native serving pipeline behind the same .ork surface:
            # per-object matching + two-tier geometry in one cell
            # (cells/serving.py; selected by `pipeline: segmented` in the
            # detection .ork, conf/detection.serving.ork)
            from tod_tpu.cells.serving import SegmentedDetector

            cells["serving"] = CellInfo(SegmentedDetector, {
                "search_json_params": p["search"],
                "json_db": p["json_db"],
                "json_object_ids": p["json_object_ids"],
                "visualize": p["visualize"]})
        else:
            guess_params = {"visualize": p["visualize"], "db": p["json_db"]}
            cells["feature_descriptor"] = CellInfo(FeatureDescriptor)
            cells["guess_generator"] = CellInfo(GuessGenerator, guess_params)
        if p["visualize"]:
            # the reference's DrawKeypoints + imshow + PosesDrawer subgraph
            # (detector.py:84-108), headless: PNG sink per frame
            from tod_tpu.cells.viz import PoseDrawer

            prefix = (p["visualize"] if isinstance(p["visualize"], str)
                      else "/tmp/tod_tpu_viz")
            cells["pose_drawer"] = CellInfo(PoseDrawer, {"prefix": prefix})
        return cells

    @classmethod
    def declare_forwards(cls, _p):
        if _p["pipeline"] == "segmented":
            p = {"serving": [Forward("json_feature_params"),
                             Forward("json_descriptor_params"),
                             Forward("n_ransac_iterations"),
                             Forward("min_inliers"),
                             Forward("sensor_error"),
                             Forward("max_instances"),
                             Forward("max_matches_per_object"),
                             Forward("max_active_objects"),
                             Forward("q_cap"),
                             Forward("activation_m_cap"),
                             Forward("activation_hypotheses"),
                             Forward("activation_min_score"),
                             Forward("activation_prescreen"),
                             Forward("tight_final_fit"),
                             Forward("bucket_grid"),
                             Forward("min_confidence"),
                             Forward("min_quality"),
                             Forward("coarse_stride"),
                             Forward("fine_width"),
                             Forward("track_width"),
                             Forward("track_ttl"),
                             Forward("track_min_confidence"),
                             Forward("activation_reserve"),
                             Forward("explore_width"),
                             Forward("catalog_capacity"),
                             Forward("reserve_rows"),
                             Forward("seed")]}
            i = {"passthrough": [Forward("image"), Forward("K_image")],
                 "depth_map": [Forward("depth_in", "depth")]}
            o = {"serving": [Forward("pose_results")]}
            return p, i, o
        p = {"feature_descriptor": [Forward("json_feature_params"),
                                    Forward("json_descriptor_params")],
             "guess_generator": [Forward("n_ransac_iterations"),
                                 Forward("min_inliers"),
                                 Forward("sensor_error"),
                                 Forward("max_active_objects"),
                                 Forward("object_batch")]}
        i = {"passthrough": [Forward("image"), Forward("K_image")],
             "feature_descriptor": [Forward("mask")],
             "depth_map": [Forward("depth_in", "depth")]}
        o = {"feature_descriptor": [Forward("keypoints")],
             "guess_generator": [Forward("pose_results")]}
        return p, i, o

    @classmethod
    def declare_direct_params(cls, p: Tendrils):
        p.declare("json_db", "The DB to get data from as a JSON string",
                  default="{}")
        p.declare("search", "The search parameters as a JSON string",
                  default="{}")
        p.declare("json_object_ids", "The ids of the objects to find as a "
                  'JSON list or the keyword "all".', default="all")
        p.declare("pipeline", 'Serving architecture: "cells" (the '
                  "reference's global-kNN cell graph) or \"segmented\" (the "
                  "TPU-native per-object serving pipeline, "
                  "cells/serving.py). Reference .ork files have no such "
                  "knob and default to the cell graph.", default="cells")
        p.declare("visualize", "Debug overlays: false (off), true (PNGs "
                  "under /tmp/tod_tpu_viz), or a string path prefix. This "
                  "framework is headless — where the reference pops highgui "
                  "windows (detector.py:84-108), overlays are written as "
                  "image files.", default=False)

    def configure_blackbox(self, p, _i, _o):
        if p["pipeline"] == "segmented":
            return
        self.descriptor_matcher = DescriptorMatcher(
            "Matcher",
            search_json_params=p["search"],
            json_db=p["json_db"],
            json_object_ids=p["json_object_ids"])
        self._points3d = DepthTo3d()

    def connections(self, p):
        if p["pipeline"] == "segmented":
            graph = [self.passthrough["image"] >> self.depth_map["image"],
                     self.passthrough["image"] >> self.serving["image"],
                     self.depth_map["depth"] >> self.serving["depth"],
                     self.passthrough["K_image"] >> self.serving["K"]]
            if p["visualize"]:
                graph += [self.passthrough["image"]
                          >> self.pose_drawer["image"],
                          self.passthrough["K_image"]
                          >> self.pose_drawer["K_image"],
                          self.serving["keypoints"]
                          >> self.pose_drawer["keypoints"],
                          self.serving["pose_results"]
                          >> self.pose_drawer["pose_results"]]
            return graph
        # depth branch: resize depth to the RGB frame, then back-project the
        # dense cloud the pose search consumes (wiring parity with
        # detector.py:64-69)
        graph = [self.passthrough["image"] >> self.depth_map["image"],
                 self.depth_map["depth"] >> self._points3d["depth"],
                 self.passthrough["K_image"] >> self._points3d["K"],
                 self._points3d["points3d"]
                 >> self.guess_generator["points3d"]]

        graph += [self.passthrough["image"]
                  >> self.feature_descriptor["image"],
                  self.passthrough["image"] >> self.guess_generator["image"],
                  # K enables the 2D-only P3P fallback for depthless frames
                  # (unimplemented in the reference, GuessGenerator.cpp:147)
                  self.passthrough["K_image"] >> self.guess_generator["K"]]

        graph += [self.descriptor_matcher["spans"]
                  >> self.guess_generator["spans"],
                  self.descriptor_matcher["object_ids"]
                  >> self.guess_generator["object_ids"]]

        graph += [self.feature_descriptor["keypoints"]
                  >> self.guess_generator["keypoints"],
                  self.feature_descriptor["descriptors"]
                  >> self.descriptor_matcher["descriptors"],
                  self.descriptor_matcher["matches", "matches_3d"]
                  >> self.guess_generator["matches", "matches_3d"]]

        if p["visualize"]:
            graph += [self.passthrough["image"] >> self.pose_drawer["image"],
                      self.passthrough["K_image"]
                      >> self.pose_drawer["K_image"],
                      self.feature_descriptor["keypoints"]
                      >> self.pose_drawer["keypoints"],
                      self.guess_generator["pose_results"]
                      >> self.pose_drawer["pose_results"]]
        return graph
