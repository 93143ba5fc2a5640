"""Frame-level detection math: match clustering + per-object pose search.

Bridges the matcher's flat (Q, k) match arrays to per-object fixed-capacity
ObjectMatches (the ClusterPerObject analog, adjacency_ransac.cpp:177-205) and
runs adjacency fill + multi-instance RANSAC per object — the whole
GuessGenerator::process hot section (GuessGenerator.cpp:127-250) as one
jit-compatible function.

Objects are processed with ``lax.map(batch_size=...)``: a few objects' M x M
adjacency work is vmapped at a time, bounding memory at
O(batch * M^2) while keeping the MXU fed.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tod_tpu.geometry.adjacency import ObjectMatches, fill_adjacency
from tod_tpu.geometry.ransac import (
    ObjectDetections,
    RansacConfig,
    detect_object_instances,
)


@dataclasses.dataclass(frozen=True)
class GuessConfig:
    """Static shape/algorithm knobs for the frame-level pose search."""

    ransac: RansacConfig = RansacConfig()
    max_matches_per_object: int = 1024  # M: per-object match capacity
    object_batch: int = 8               # objects vmapped per lax.map step

    @property
    def sensor_error(self) -> float:
        return self.ransac.sensor_error


def cluster_matches(obj_idx: jax.Array, dist: jax.Array, valid: jax.Array,
                    train_pts: jax.Array, query_pts: jax.Array,
                    query_xy: jax.Array, n_objects: int,
                    max_matches: int) -> ObjectMatches:
    """Group flat (Q,k) matches into per-object fixed-capacity stores.

    ``obj_idx``/``dist``/``valid``: (Q,k); ``train_pts``: (Q,k,3);
    ``query_pts``: (Q,3) 3D points of the query keypoints (NaN = invalid —
    ClusterPerObject's NaN skip, adjacency_ransac.cpp:187-190);
    ``query_xy``: (Q,2). Returns ObjectMatches with leading dim ``n_objects``.

    The reference keeps every match; a static capacity needs an eviction
    policy. Evicting by distance alone lets repetitive-texture near-duplicates
    crowd out correct matches, so priority is (match rank within its query,
    then distance): every keypoint's best match survives before any keypoint's
    second-best, preserving keypoint coverage.
    """
    q, k = obj_idx.shape
    qk = q * k
    obj_flat = obj_idx.reshape(qk)
    dist_flat = dist.reshape(qk)
    rank_flat = jnp.tile(jnp.arange(k, dtype=jnp.float32), q)
    q_finite = jnp.isfinite(query_pts).all(-1)                 # (Q,)
    valid_flat = valid.reshape(qk) & jnp.repeat(q_finite, k)
    t_flat = train_pts.reshape(qk, 3)
    kp_of_flat = jnp.repeat(jnp.arange(q, dtype=jnp.int32), k)
    priority = rank_flat * 300.0 + dist_flat  # rank-major, distance-minor

    def one_object(o):
        mask = valid_flat & (obj_flat == o)
        score = jnp.where(mask, -priority, -jnp.inf)
        top, sel = jax.lax.top_k(score, max_matches)
        ok = jnp.isfinite(top)
        kp = kp_of_flat[sel]
        return ObjectMatches(
            query_pts=jnp.where(ok[:, None], query_pts[kp], 0.0),
            train_pts=jnp.where(ok[:, None], t_flat[sel], 0.0),
            query_idx=jnp.where(ok, kp, -1),
            query_xy=jnp.where(ok[:, None], query_xy[kp], 0.0),
            valid=ok)

    return jax.vmap(one_object)(jnp.arange(n_objects, dtype=jnp.int32))


def detect_objects(key: jax.Array, matches: ObjectMatches, spans: jax.Array,
                   cfg: GuessConfig) -> ObjectDetections:
    """Adjacency fill + multi-instance graph-RANSAC for every object.

    ``matches``: ObjectMatches stacked with leading dim O; ``spans``: (O,).
    Returns ObjectDetections stacked (O, I, ...).
    """
    n_objects = spans.shape[0]
    keys = jax.random.split(key, n_objects)

    def per_object(args):
        key_o, m, span = args
        graphs = fill_adjacency(m, span, cfg.sensor_error)
        return detect_object_instances(key_o, m, graphs, cfg.ransac)

    return jax.lax.map(per_object, (keys, matches, spans),
                       batch_size=min(cfg.object_batch, max(n_objects, 1)))


def detect_frame_from_matches(
        key: jax.Array, obj_idx: jax.Array, dist: jax.Array,
        valid: jax.Array, train_pts: jax.Array, query_pts: jax.Array,
        query_xy: jax.Array, spans: jax.Array,
        cfg: GuessConfig) -> Tuple[ObjectMatches, ObjectDetections]:
    """cluster + detect in one jittable call (GuessGenerator::process)."""
    n_objects = spans.shape[0]
    clustered = cluster_matches(obj_idx, dist, valid, train_pts, query_pts,
                                query_xy, n_objects,
                                cfg.max_matches_per_object)
    detections = detect_objects(key, clustered, spans, cfg)
    return clustered, detections
