"""Multi-chip batched detection: frames over 'data', DB over 'db'.

The full fused detection step for a BATCH of RGB-D frames, laid out on the
('data', 'db') mesh:
  1. feature extraction + clustering + RANSAC are frame-independent, so they
     partition trivially along 'data' (XLA propagates the batch sharding);
  2. matching is the cross-frame bottleneck: the stacked query descriptors
     (B*K rows, 'data'-sharded) hit the 'db'-sharded database through the
     shard_map matcher (2D-parallel matmul + ICI top-k merge).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tod_tpu.geometry.detection import detect_frame_from_matches
from tod_tpu.geometry.ransac import ObjectDetections
from tod_tpu.models.fused import FusedDetectorConfig, ModelDb
from tod_tpu.ops.depth import depth_to_3d_sparse, to_metric_depth
from tod_tpu.ops.orb import Keypoints, orb_detect_and_compute
from tod_tpu.parallel.matching import sharded_hamming_topk


def detect_batch_sharded(mesh: Mesh, keys: jax.Array, grays: jax.Array,
                         depths: jax.Array, Ks: jax.Array, db: ModelDb,
                         cfg: FusedDetectorConfig) -> ObjectDetections:
    """Detect over a batch of frames. ``grays``: (B,H,W) f32, ``depths``:
    (B,H,W), ``Ks``: (B,3,3), ``keys``: (B,2) PRNG keys. B must divide by the
    'data' axis; db rows by 'db' axis * chunk. Returns ObjectDetections with
    leading dims (B, O, I)."""

    def features(key, gray, depth, K):
        kps, desc = orb_detect_and_compute(
            gray, n_features=cfg.n_features, n_levels=cfg.n_levels,
            scale_factor=cfg.scale_factor, fast_threshold=cfg.fast_threshold)
        depth_m = to_metric_depth(depth)
        query_pts = depth_to_3d_sparse(depth_m, K, kps.xy)
        query_pts = jnp.where(kps.valid[:, None], query_pts, jnp.nan)
        return kps, desc, query_pts

    kps, desc, query_pts = jax.vmap(features)(keys, grays, depths, Ks)
    b, q = desc.shape[:2]

    # 2D-parallel matching on the flattened (B*Q) query axis
    dist, rows = sharded_hamming_topk(
        mesh, desc.reshape(b * q, -1), db.descriptors, db.n_valid,
        k=cfg.k_matches, chunk=cfg.db_chunk)
    dist = dist.reshape(b, q, cfg.k_matches)
    rows = rows.reshape(b, q, cfg.k_matches)

    def geometry(key, kps_i, dist_i, rows_i, query_pts_i):
        m_valid = (rows_i >= 0) & (dist_i <= cfg.radius) & kps_i.valid[:, None]
        safe = jnp.maximum(rows_i, 0)
        obj_idx = jnp.where(m_valid, db.obj_of_row[safe], -1)
        train_pts = db.points[safe]
        _, det = detect_frame_from_matches(
            key, obj_idx, dist_i, m_valid, train_pts, query_pts_i,
            kps_i.xy, db.spans, cfg.guess)
        return det

    return jax.vmap(geometry)(keys, kps, dist, rows, query_pts)


def jit_detect_batch(mesh: Mesh, cfg: FusedDetectorConfig):
    """jit detect_batch_sharded with explicit input shardings on the mesh."""
    data = NamedSharding(mesh, P("data"))
    db_shard = NamedSharding(mesh, P("db"))
    db_shard_t = NamedSharding(mesh, P(None, "db"))
    repl = NamedSharding(mesh, P())
    db_shardings = ModelDb(descriptors=db_shard, bits_t=db_shard_t,
                           popcounts=db_shard_t, points=repl,
                           obj_of_row=repl, n_valid=repl, spans=repl)
    return jax.jit(
        functools.partial(detect_batch_sharded, mesh, cfg=cfg),
        in_shardings=(data, data, data, data, db_shardings))
