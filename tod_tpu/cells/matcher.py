"""DescriptorMatcher cell: query descriptors vs the whole trained model DB.

TPU-native rebuild of the reference's DescriptorMatcher
(src/detection/DescriptorMatcher.cpp): model loading + span computation from
the parameter callback (:61-129) and the knn(k=5)+radius-truncation matching
contract (:195-252), with the FLANN-LSH index replaced by the exact MXU
Hamming matmul (tod_tpu.ops.matching; SURVEY.md section 7 "LSH semantics vs
dense matmul"). LSH tuning knobs (n_tables/key_size/multi_probe_level) are
accepted for .ork compatibility and ignored — exact search has no tuning.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from tod_tpu.cells.types import MatchSet
from tod_tpu.db import ObjectDbParameters, load_models_for_objects
from tod_tpu.ops.matching import hamming_topk, pad_db
from tod_tpu.pipeline.cell import Cell
from tod_tpu.utils.transfer import fetch_arrays
from tod_tpu.pipeline.tendril import Tendrils
from tod_tpu.utils.config import parse_json_params

DB_CHUNK = 16384


@functools.lru_cache(maxsize=4)
def _jitted_match(k: int):
    @functools.partial(jax.jit, static_argnames=("k",))
    def run(query, db, n_valid, k=k):
        return hamming_topk(query, db, n_valid, k=k, chunk=DB_CHUNK)

    return run


@functools.lru_cache(maxsize=4)
def _jitted_match_l2(k: int):
    from tod_tpu.ops.matching import l2_topk

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(query, db, n_valid, k=k):
        d_sq, idx = l2_topk(query, db, n_valid, k=k,
                            chunk=min(DB_CHUNK, 4096))
        return jnp.sqrt(d_sq), idx  # report plain L2 like cv::BFMatcher

    return run


class MatcherIndex:
    """The packed on-device model database (the matcher_->add analog,
    DescriptorMatcher.cpp:126-128): stacked descriptors, 3D points, per-row
    object ids, per-object spans. Binary (uint8, Hamming/ORB) and float
    (L2, the SIFT path) descriptor models are both supported."""

    def __init__(self, models: List):
        self.object_ids = [m.object_id for m in models]
        self.spans = {m.object_id: m.span for m in models}
        self.is_binary = (not models
                          or models[0].descriptors.dtype == np.uint8)
        if models:
            desc = np.concatenate([m.descriptors for m in models])
            pts = np.concatenate([m.points for m in models])
            obj = np.concatenate([np.full(m.n_points, i, np.int32)
                                  for i, m in enumerate(models)])
            starts = np.cumsum([0] + [m.n_points for m in models])[:-1]
            local = np.concatenate([np.arange(m.n_points, dtype=np.int32)
                                    for m in models])
        else:
            desc = np.zeros((0, 32), np.uint8)
            pts = np.zeros((0, 3), np.float32)
            obj = np.zeros(0, np.int32)
            starts = np.zeros(0, np.int64)
            local = np.zeros(0, np.int32)
        self.n_descriptors = len(desc)
        padded, n = pad_db(desc, DB_CHUNK)
        self.descriptors = jnp.asarray(padded)
        self.points = np.concatenate(
            [pts, np.zeros((len(padded) - n, 3), np.float32)])
        self.obj_of_row = np.concatenate(
            [obj, np.full(len(padded) - n, -1, np.int32)])
        self.local_of_row = np.concatenate(
            [local, np.zeros(len(padded) - n, np.int32)])
        self.span_array = np.asarray([self.spans[o] for o in self.object_ids],
                                     np.float32)


class DescriptorMatcher(Cell):
    @staticmethod
    def declare_params(p: Tendrils) -> None:
        p.declare("search_json_params",
                  'JSON: {"type": LSH, "radius": eps-NN cut, "ratio": SIFT '
                  "ratio criterion, n_tables/key_size/multi_probe_level "
                  "accepted for compatibility}", required=True)
        p.declare("json_db", "The DB parameters as a JSON string.",
                  default="{}")
        p.declare("json_object_ids",
                  'The object ids to load, as a JSON list or "all".',
                  default="all")

    @staticmethod
    def declare_io(p: Tendrils, i: Tendrils, o: Tendrils) -> None:
        i.declare("descriptors", "The descriptors to match to the database.")
        o.declare("matches", "MatchSet: top-k matches per query descriptor.")
        o.declare("matches_3d",
                  "(Q,k,3) 3d positions of the matched training points.")
        o.declare("object_ids", "The ids of the loaded objects.")
        o.declare("spans", "{object_id: span} of the loaded objects.")

    def configure(self) -> None:
        search = parse_json_params(self.params["search_json_params"])
        self._radius = float(search.get("radius", 0) or 0)
        self._ratio = float(search.get("ratio", 0) or 0)
        search_type = search.get("type", "LSH")
        if search_type not in ("LSH", "BruteForce", "L2"):
            raise ValueError(f"search not implemented for type {search_type}")
        self._k = int(search.get("k", 5))  # knnMatch(k=5), :211
        self._use_ratio = bool(search.get("use_ratio", False))
        self.reload_models()

    def reload_models(self) -> None:
        """The parameter_callback analog: (re)load every model from the DB
        and (re)build the matcher index (DescriptorMatcher.cpp:61-129)."""
        db = ObjectDbParameters(self.params["json_db"]).generate_db()
        object_ids = self.params["json_object_ids"]
        if isinstance(object_ids, str) and object_ids not in ("all", ""):
            # a bare id string would otherwise iterate character-by-character
            object_ids = parse_json_params(object_ids) \
                if object_ids.startswith("[") else [object_ids]
        models = load_models_for_objects(db, object_ids or "all")
        self.index = MatcherIndex(models)

    def process(self) -> None:
        query = np.ascontiguousarray(self.inputs["descriptors"])
        if self.index.is_binary:
            query = query.astype(np.uint8)
        else:
            query = query.astype(np.float32)
        q = len(query)
        idx = self.index
        if idx.n_descriptors == 0:
            empty = MatchSet(
                dist=np.zeros((q, self._k), np.float32),
                train_idx=np.full((q, self._k), -1, np.int32),
                obj_idx=np.full((q, self._k), -1, np.int32),
                local_idx=np.zeros((q, self._k), np.int32),
                valid=np.zeros((q, self._k), bool))
            self.outputs["matches"] = empty
            self.outputs["matches_3d"] = np.zeros((q, self._k, 3), np.float32)
            self.outputs["object_ids"] = idx.object_ids
            self.outputs["spans"] = idx.spans
            return

        match_fn = (_jitted_match if idx.is_binary else _jitted_match_l2)
        dist, rows = match_fn(self._k)(
            jnp.asarray(query), idx.descriptors, idx.n_descriptors)
        dist, rows = fetch_arrays(dist, rows)   # one RTT, not two

        valid = rows >= 0
        if self._radius:
            # knn then radius truncation (DescriptorMatcher.cpp:211-220)
            valid &= dist <= self._radius
        if self._use_ratio and self._ratio:
            # Lowe ratio criterion: drop queries whose best match is not
            # clearly better than the 2nd-best. The reference declares this
            # but never implements it (dead code via unsigned-int truncation,
            # DescriptorMatcher.cpp:223-227/:257-259), so it is opt-in here
            # (search param "use_ratio": true) to preserve default behavior.
            if dist.shape[1] >= 2:
                ambiguous = dist[:, 0] >= self._ratio * np.maximum(
                    dist[:, 1], 1e-6)
                valid &= ~ambiguous[:, None]
        safe_rows = np.where(valid, rows, 0)
        self.outputs["matches"] = MatchSet(
            dist=dist, train_idx=np.where(valid, rows, -1),
            obj_idx=np.where(valid, idx.obj_of_row[safe_rows], -1),
            local_idx=idx.local_of_row[safe_rows],
            valid=valid)
        self.outputs["matches_3d"] = idx.points[safe_rows]
        self.outputs["object_ids"] = idx.object_ids
        self.outputs["spans"] = idx.spans
