"""2D-only detection: P3P graph-RANSAC from 2D keypoints + 3D model points.

The reference explicitly does NOT support this — GuessGenerator.cpp:147-152
is an empty TODO ("if the cloud is empty, we take 2d points ... solvePnP"
never plugged in; doc/source/index.rst:46 "Pipeline does not work with 2D
only input"). tod_tpu implements it: when a frame has no depth, poses come
from vmapped Grunert P3P hypotheses (geometry/pnp.py) scored by reprojection
consensus, refined by fixed-iteration Gauss-Newton, with the same
multi-instance keypoint-invalidation loop as the 3D path.

Differences from the 3D path (inherent to missing depth):
  * no physical/sample consistency graphs (they need 3D query points) — the
    sampling gate is pixel separation > 20px plus model-point separation;
  * inliers are reprojection-error consensus (``pixel_error`` px) instead of
    3D residuals; no clique certificate (it certifies 3D consistency).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from tod_tpu.geometry.adjacency import (
    ObjectMatches,
    count_unique_query_indices,
    pairwise_sq_dists,
)
from tod_tpu.geometry.detection import cluster_matches
from tod_tpu.geometry.pnp import gauss_newton_pose, p3p, project
from tod_tpu.geometry.ransac import (
    ObjectDetections,
    consistency_log_weights,
    sample_triples,
)

PIXEL_SEP_SQ = 20.0 * 20.0     # same sample-separation rule as the 3D path
MIN_TRAIN_SEP = 0.01           # meters: avoid near-degenerate P3P triples


@dataclasses.dataclass(frozen=True)
class Pnp2dConfig:
    n_hypotheses: int = 256
    min_inliers: int = 8
    pixel_error: float = 4.0   # reprojection inlier threshold (px)
    max_instances: int = 3
    refine_iters: int = 5
    # Depth prior for the scale-ratio sampling gate: the histogram of
    # log(pixel-dist / model-dist) is binned over [log(f/z_max), log(f/z_min)]
    # with f taken from K — scenes whose true object depth falls outside
    # [z_min, z_max] would clamp the mode into an edge bin and degrade the
    # sampling graph, so widen these for macro or long-range work.
    z_min: float = 0.25        # meters: nearest expected object distance
    z_max: float = 5.0         # meters: farthest expected object distance


def _bearings(query_xy: jax.Array, K: jax.Array) -> jax.Array:
    """(M,2) pixels -> (M,3) unit camera-frame rays."""
    x = (query_xy[:, 0] - K[0, 2]) / K[0, 0]
    y = (query_xy[:, 1] - K[1, 2]) / K[1, 1]
    rays = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)


def ransac_round_2d(key, m: ObjectMatches, K: jax.Array, valid: jax.Array,
                    cfg: Pnp2dConfig):
    """One P3P-RANSAC round: returns (R, T, inliers (M,), n_unique, found)."""
    mcap = valid.shape[0]
    bear = _bearings(m.query_xy, K)

    # sampling graph: pairs far apart in pixels AND on the model, AND
    # scale-ratio consistent — the 2D analog of FillAdjacency's metric
    # consistency: for correct matches, pixel distance ~= (f/z) * model
    # distance with one global scale, so log(dpix/dmodel) clusters tightly;
    # junk pairs scatter. Gate to the mode cluster +-log(1.4)
    # (perspective tilt perturbs local scale ~15-25%).
    dpix2 = pairwise_sq_dists(
        jnp.concatenate([m.query_xy, jnp.zeros_like(m.query_xy[:, :1])], -1))
    dtrain2 = pairwise_sq_dists(m.train_pts)
    base = ((dpix2 > PIXEL_SEP_SQ) & (dtrain2 > MIN_TRAIN_SEP ** 2)
            & valid[:, None] & valid[None, :]
            & ~jnp.eye(mcap, dtype=bool))
    log_r = 0.5 * (jnp.log(jnp.maximum(dpix2, 1e-12))
                   - jnp.log(jnp.maximum(dtrain2, 1e-12)))
    # global scale estimate = histogram MODE of log(dpix/dmodel) over valid
    # pairs (median is fragile when junk pairs outnumber correct ones):
    # correct pairs pile into one ~f/z bin, junk spreads. The bin range is
    # derived from the camera's focal length and the config's depth prior
    # (f/z for z in [z_min, z_max]) so it tracks K instead of assuming a
    # fixed px/m envelope.
    n_bins = 64
    f = 0.5 * (K[0, 0] + K[1, 1])
    lo, hi = jnp.log(f / cfg.z_max), jnp.log(f / cfg.z_min)
    # pairs whose ratio falls OUTSIDE the prior range are excluded from the
    # vote (clamping them into the edge bins lets junk mass steal the mode)
    in_range = base & (log_r >= lo) & (log_r < hi)
    bins = jnp.clip(((log_r - lo) / (hi - lo) * n_bins).astype(jnp.int32),
                    0, n_bins - 1)
    counts = jnp.zeros(n_bins, jnp.int32).at[
        jnp.where(in_range, bins, 0)].add(in_range.astype(jnp.int32))
    peak = jnp.argmax(counts)
    center = lo + (peak.astype(jnp.float32) + 0.5) / n_bins * (hi - lo)
    adj = base & (jnp.abs(log_r - center) < jnp.log(1.4))

    # weight triple draws by 3-path counts in the consistency graph (same
    # dense-core concentration as the 3D path's consistency_log_weights)
    logw = consistency_log_weights(adj, valid)
    b = cfg.n_hypotheses
    (v1, v2, v3), samp_ok = sample_triples(key, adj, valid, b, logw=logw)
    idx3 = jnp.stack([v1, v2, v3], axis=1)              # (B,3)
    sols = jax.vmap(p3p)(bear[idx3], m.train_pts[idx3])  # (B,8,...)

    # reprojection consensus for every candidate pose
    def count(R, T):
        uv, front = project(R, T, K, m.train_pts)       # (M,2)
        err2 = ((uv - m.query_xy) ** 2).sum(-1)
        inl = valid & front & (err2 < cfg.pixel_error ** 2)
        return inl

    inl = jax.vmap(jax.vmap(count))(sols.R, sols.T)      # (B,8,M)
    inl = inl & sols.valid[..., None] & samp_ok[:, None, None]
    n_in = inl.sum(-1)                                   # (B,8)
    flat = n_in.reshape(-1)

    # Planar scenes carry the classic two-fold PnP tilt ambiguity (the
    # mirrored pose is ~2*tilt away; measured: a consistent ~60deg error
    # about the camera x-axis on frontal planar targets). Inlier COUNT at
    # the pixel threshold cannot separate the branches — truncated
    # reprojection SSE can (the wrong branch's residuals are bimodal under
    # perspective foreshortening). Refine several top hypotheses (the P3P
    # candidate set contains both branches) and pick by truncated SSE.
    n_ref = 8
    _, top = jax.lax.top_k(flat, n_ref)
    r_top = sols.R.reshape(-1, 3, 3)[top]
    t_top = sols.T.reshape(-1, 3)[top]
    inl_top = inl.reshape(-1, mcap)[top]
    thr2 = cfg.pixel_error ** 2

    def trunc_sse(R, T):
        uv, front = project(R, T, K, m.train_pts)
        err2 = ((uv - m.query_xy) ** 2).sum(-1)
        err2 = jnp.where(front, err2, 4.0 * thr2)
        return jnp.where(valid, jnp.minimum(err2, 4.0 * thr2), 0.0).sum()

    def refine(r0, t0, inl0):
        r1, t1 = gauss_newton_pose(r0, t0, K, m.train_pts, m.query_xy,
                                   inl0.astype(jnp.float32),
                                   iters=cfg.refine_iters)
        inl1 = count(r1, t1)
        r2, t2 = gauss_newton_pose(r1, t1, K, m.train_pts, m.query_xy,
                                   inl1.astype(jnp.float32),
                                   iters=cfg.refine_iters)
        inl2 = count(r2, t2)
        better = inl2.sum() >= inl0.sum()
        rr = jnp.where(better, r2, r0)
        tt = jnp.where(better, t2, t0)
        return rr, tt, jnp.where(better, inl2, inl0), trunc_sse(rr, tt)

    # explicit mirror branch: for (near-)planar models, reflect the model
    # plane normal about the viewing ray (the IPPE-style second solution)
    # and let GN polish it — guarantees BOTH ambiguity branches compete
    # even when every top hypothesis sampled the same one.
    ctr = jnp.where(valid[:, None], m.train_pts, 0.0)
    nvalid = jnp.maximum(valid.sum(), 1)
    mean = ctr.sum(0) / nvalid
    cov = ((ctr - mean) * valid[:, None]).T @ (ctr - mean)
    _, evecs = jnp.linalg.eigh(cov)
    n_model = evecs[:, 0]                      # smallest-variance direction

    def mirror(r0, t0):
        n_c = r0 @ n_model
        v = t0 / jnp.maximum(jnp.linalg.norm(t0), 1e-9)
        n_ref = 2.0 * jnp.dot(n_c, v) * v - n_c
        axis = jnp.cross(n_c, n_ref)
        s = jnp.linalg.norm(axis)
        c = jnp.clip(jnp.dot(n_c, n_ref), -1.0, 1.0)
        a = axis / jnp.maximum(s, 1e-9)
        ax = jnp.array([[0.0, -a[2], a[1]],
                        [a[2], 0.0, -a[0]],
                        [-a[1], a[0], 0.0]])
        ang = jnp.arctan2(s, c)
        Q = (jnp.eye(3) + jnp.sin(ang) * ax
             + (1.0 - jnp.cos(ang)) * (ax @ ax))
        Q = jnp.where(s > 1e-6, Q, jnp.eye(3))
        return Q @ r0, t0

    r_mir, t_mir = jax.vmap(mirror)(r_top, t_top)
    inl_mir = jax.vmap(count)(r_mir, t_mir) & (flat[top] >= 3)[:, None]
    r_all = jnp.concatenate([r_top, r_mir])
    t_all = jnp.concatenate([t_top, t_mir])
    inl_all = jnp.concatenate([inl_top, inl_mir])
    # hypothesis validity: the pre-refinement counts already carry the
    # sample/P3P masks (inl was masked by sols.valid & samp_ok), so a seed
    # is valid iff it had >= 3 masked inliers. Refinement must not let an
    # INVALID seed re-acquire inliers and win (it would then force
    # found=False for the whole round).
    ok_all = jnp.concatenate([flat[top] >= 3, flat[top] >= 3])

    r_ref, t_ref, inl_ref, sse = jax.vmap(refine)(r_all, t_all, inl_all)
    inl_ref = inl_ref & ok_all[:, None]
    n_ref_in = inl_ref.sum(-1)
    # valid candidates within 85% of the best inlier count compete on SSE
    n_best = n_ref_in.max()
    contender = ok_all & (n_ref_in.astype(jnp.float32)
                          >= 0.85 * n_best.astype(jnp.float32))
    win = jnp.argmin(jnp.where(contender, sse, jnp.inf))
    found = ok_all[win] & (n_ref_in[win] >= 3)
    R, T = r_ref[win], t_ref[win]
    inliers = inl_ref[win] & found
    n_unique = count_unique_query_indices(m.query_idx, inliers)
    return R, T, inliers, jnp.where(found, n_unique, 0), found


def detect_object_instances_2d(key, m: ObjectMatches, K: jax.Array,
                               cfg: Pnp2dConfig) -> ObjectDetections:
    """Multi-instance loop (GuessGenerator.cpp:192-231 semantics): accept a
    pose when it has >= min_inliers unique keypoints, invalidate those
    keypoints' matches, repeat."""

    def step(valid, key_i):
        R, T, inliers, n_unique, found = ransac_round_2d(key_i, m, K, valid,
                                                         cfg)
        accept = found & (n_unique >= cfg.min_inliers)
        shares = ((m.query_idx[:, None] == m.query_idx[None, :])
                  & inliers[None, :]).any(axis=1)
        valid_next = jnp.where(accept, valid & ~shares, valid)
        return valid_next, (R, T, n_unique, accept)

    keys = jax.random.split(key, cfg.max_instances)
    _, (rs, ts, counts, accepted) = jax.lax.scan(step, m.valid, keys)
    # the 2D path carries no 3D residual / sample-graph statistics (the
    # reference's 2D branch is an empty TODO, GuessGenerator.cpp:147-152)
    zero_f = jnp.zeros_like(counts, jnp.float32)
    return ObjectDetections(R=rs, T=ts, n_inliers=counts, accepted=accepted,
                            rms_residual=zero_f,
                            clique_size=jnp.zeros_like(counts))


def detect_frame_2d(key, obj_idx: jax.Array, dist: jax.Array,
                    valid: jax.Array, train_pts: jax.Array,
                    query_xy: jax.Array, K: jax.Array,
                    object_ids: jax.Array, max_matches: int,
                    cfg: Pnp2dConfig) -> ObjectDetections:
    """Cluster flat (Q,k) matches per object and run the 2D pose search for
    each. Reuses the 3D path's cluster_matches (same eviction policy) with a
    zero query-point placeholder — the 2D path never reads query_pts."""
    q = obj_idx.shape[0]
    clustered = cluster_matches(
        obj_idx, dist, valid, train_pts,
        jnp.zeros((q, 3), jnp.float32),   # finite placeholder: no 3D gate
        query_xy, object_ids, max_matches)

    n_objects = object_ids.shape[0]
    keys = jax.random.split(key, n_objects)

    def one_object(args):
        key_o, m = args
        return detect_object_instances_2d(key_o, m, K, cfg)

    return jax.lax.map(one_object, (keys, clustered),
                       batch_size=min(8, max(n_objects, 1)))
