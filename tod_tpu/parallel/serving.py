"""Multi-chip streaming serving driver: host state around the sharded step.

:func:`tod_tpu.parallel.segmented.serving_step_sharded` is a pure compiled
program — per-frame streaming state (tracked ages, needy-first eviction,
the exploration rotation, tracked-pose seeds) lives with the caller. This
module supplies that caller: :class:`ShardedServingDetector` mirrors the
single-device ``FusedDetector`` streaming loop (models/fused.py) over a
('data', 'db') mesh — one independent camera stream per 'data' shard, the
catalog sharded by object over 'db' — keeping per-stream state exactly as
the single-device loop does, so each stream's results are bitwise-identical
to a ``FusedDetector`` fed the same compacted queries and PRNG key
(parity test in tests/test_parallel.py).

The reference has no distributed capability at all (SURVEY.md section 2c);
this is the first-class TPU-native scaling surface for serving large
catalogs at camera rate.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tod_tpu.db.models import TodModel
from tod_tpu.geometry.detection import (AGE_NEVER, fold_best_pose,
                                        seeds_from_state, tracked_from_age,
                                        tracked_needy, update_age)
from tod_tpu.geometry.ransac import ObjectDetections
from tod_tpu.ops.pallas.segmented import DB_CHUNK, subsample_models
from tod_tpu.parallel.segmented import (pack_segmented_l2_sharded,
                                        pack_segmented_sharded,
                                        serving_step_sharded,
                                        stacked_max_chunks)


# per-stream state updates are the SAME bodies the single-device driver
# jits (geometry/detection.py) — only vmapped over the 'data' streams here,
# so the two drivers cannot drift apart (their per-stream results are
# parity-tested bitwise-identical)
@functools.partial(jax.jit, static_argnums=(1, 2))
def _tracked_rows(age, width, ttl):
    return jax.vmap(lambda a: tracked_from_age(a, width, ttl))(age)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _tracked_rows_needy(age, last_sel, width, ttl):
    return jax.vmap(lambda a, s: tracked_needy(a, s, width, ttl))(age,
                                                                  last_sel)


@functools.partial(jax.jit, static_argnums=(2,))
def _age_rows(age, det, min_confidence=0.0):
    return jax.vmap(lambda a, d: update_age(a, d, min_confidence))(age, det)


_pose_rows = jax.jit(jax.vmap(fold_best_pose))


class ShardedServingDetector:
    """Streaming multi-chip serving: ``mesh.shape['data']`` independent
    camera streams against one object-sharded catalog.

    ``config``: a segmented-pipeline ``FusedDetectorConfig``; coarse→fine
    (``coarse_stride > 0``) enables ``track_width`` / ``explore_width``
    reserved slab slots and tracked-pose seeding with the same semantics
    (and the same per-stream state updates) as the single-device
    ``FusedDetector`` streaming loop. Stream ``b`` draws from
    ``PRNGKey(seed + b)``, matching a single-device detector built with
    ``seed + b``.

    ``step(xy, qp, ok, dsc)`` takes one compacted frame per stream
    (leading dim B = n_data; produce them with the detector's feature
    stage or ``FusedDetector.prepare_frame`` + ``_stage_features_compact``)
    and returns stacked ``ObjectDetections (B, O_total, I, ...)`` on the
    shard-major object axis (``object_ids``; ``None`` = padding slot).
    """

    def __init__(self, mesh: Mesh, models: Sequence[TodModel], config,
                 seed: int = 0, db_chunk: int = DB_CHUNK):
        if config.pipeline != "segmented":
            raise ValueError("ShardedServingDetector serves the segmented "
                             "pipeline only")
        if (config.track_width or config.explore_width) \
                and config.coarse_stride <= 0:
            raise ValueError("track_width/explore_width require "
                             "coarse_stride > 0")
        self.config = config
        self.mesh = mesh
        self.n_data = mesh.shape["data"]
        n_db = mesh.shape["db"]
        models = list(models)
        if config.feature == "SIFT":
            self.sdb, self.object_ids = pack_segmented_l2_sharded(
                models, n_shards=n_db, db_chunk=db_chunk)
        else:
            self.sdb, self.object_ids = pack_segmented_sharded(
                models, n_shards=n_db, db_chunk=db_chunk)
        self._db_args: Tuple = (self.sdb,)
        fine_max_chunks = 0
        if config.coarse_stride > 0:
            # the SAME round-robin shard split keeps coarse/fine object
            # axes aligned (owner = id // o_local on both)
            sub = subsample_models(models, config.coarse_stride)
            if config.feature == "SIFT":
                self.cdb, _ = pack_segmented_l2_sharded(
                    sub, n_shards=n_db, db_chunk=db_chunk)
            else:
                self.cdb, _ = pack_segmented_sharded(
                    sub, n_shards=n_db, db_chunk=db_chunk)
            self._db_args = (self.sdb, self.cdb)
            fine_max_chunks = stacked_max_chunks(self.sdb)
        self._fn = serving_step_sharded(mesh, config,
                                        fine_max_chunks=fine_max_chunks)

        b, o = self.n_data, len(self.object_ids)
        self._keys = [jax.random.PRNGKey(seed + i) for i in range(b)]
        self._age = jnp.full((b, o), AGE_NEVER, jnp.int32)
        self._last_r = jnp.zeros((b, o, 3, 3), jnp.float32)
        self._last_t = jnp.zeros((b, o, 3), jnp.float32)
        self._last_sel: Optional[jax.Array] = None
        self._explore_pos = 0
        # exploration rotates over REAL catalog slots only (padding slots
        # would waste their forced tier-1 entry on rows that never match)
        self._real_slots = np.asarray(
            [i for i, oid in enumerate(self.object_ids) if oid is not None],
            np.int32)

    def _explore_ids(self) -> jax.Array:
        e = self.config.explore_width
        n = len(self._real_slots)
        if e >= n:
            ids = np.concatenate([self._real_slots,
                                  np.full(e - n, -1, np.int32)])
        else:
            pos = (self._explore_pos + np.arange(e)) % n
            ids = self._real_slots[pos]
            self._explore_pos = int((self._explore_pos + e) % n)
        return jnp.broadcast_to(jnp.asarray(ids), (self.n_data, e))

    def step(self, xy, qp, ok, dsc) -> ObjectDetections:
        """One streamed frame per 'data' stream (compacted queries in,
        full-object-axis detections out; updates per-stream state)."""
        cfg = self.config
        track = cfg.track_width > 0
        explore = cfg.explore_width > 0
        subs = []
        for i in range(self.n_data):
            self._keys[i], sub = jax.random.split(self._keys[i])
            subs.append(sub)
        keys = jnp.stack(subs)

        args: Tuple = (keys, xy, qp, ok, dsc) + self._db_args
        if track:
            tracked = (_tracked_rows_needy(self._age, self._last_sel,
                                           cfg.track_width, cfg.track_ttl)
                       if self._last_sel is not None else
                       _tracked_rows(self._age, cfg.track_width,
                                     cfg.track_ttl))
            args += (tracked,)
        if explore:
            args += (self._explore_ids(),)
        if track:
            seeds = seeds_from_state(self._age, self._last_r, self._last_t,
                                     cfg.track_ttl)
            args += (seeds.R, seeds.T, seeds.ok)

        out = self._fn(*args)
        if track:
            det, self._last_sel = out
            self._age = _age_rows(self._age, det,
                                  getattr(cfg, "track_min_confidence", 0.0))
            self._last_r, self._last_t = _pose_rows(
                self._last_r, self._last_t, det)
        else:
            det = out
        return det

    def results(self, det: ObjectDetections,
                stream: int) -> List[Tuple[str, np.ndarray, np.ndarray, int]]:
        """Host-side extraction for one stream: ``(object_id, R, T,
        n_inliers)`` for accepted instances over ``min_confidence`` and
        the fused ``min_quality`` (same gates as the single-device
        ``FusedDetector.detect``)."""
        from tod_tpu.models.fused import confidence_v2
        from tod_tpu.utils.transfer import fetch_arrays

        r, t, n, acc, rms, cs = fetch_arrays(
            det.R[stream], det.T[stream], det.n_inliers[stream],
            det.accepted[stream], det.rms_residual[stream],
            det.clique_size[stream])
        gate = getattr(self.config, "min_confidence", 0)
        q_gate = getattr(self.config, "min_quality", 0)
        sigma = self.config.guess.sensor_error
        out = []
        for o, oid in enumerate(self.object_ids):
            if oid is None:
                continue
            for inst in range(acc.shape[1]):
                if acc[o, inst] and n[o, inst] >= gate and \
                        confidence_v2(float(n[o, inst]),
                                      float(rms[o, inst]),
                                      int(cs[o, inst]), sigma) >= q_gate:
                    out.append((oid, r[o, inst], t[o, inst],
                                int(n[o, inst])))
        return out
