"""Geometric-consistency adjacency graphs over match sets.

TPU-native rebuild of the reference's AdjacencyRansac bookkeeping
(src/common/adjacency_ransac.cpp): instead of sorted-vector sparse adjacency
lists that are mutated as matches get invalidated (maximum_clique.h:52-148),
we keep dense boolean M x M matrices (M = static per-object match capacity)
plus a validity mask, and "invalidate" by masking — the natural jit-friendly
form. Pairwise distances ride the MXU as |a|^2 + |b|^2 - 2 a.b matmuls.

Semantics mirrored from FillAdjacency (adjacency_ransac.cpp:128-172):
  * physical edge (i, j):  |q_i - q_j| <= span + 2*sigma   and
                           | |t_i - t_j| - |q_i - q_j| | <= 4*sigma
  * sample edge (i, j):    physical  and  pixel dist > 20 px  and
                           | |t| - |q| | < 2*sigma
and from InvalidateIndices (adjacency_ransac.cpp:64-89): iteratively drop
vertices with fewer than 3 sample-neighbors until a fixpoint.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

MIN_SAMPLE_SIZE = 3        # adjacency_ransac.h min_sample_size_
PIXEL_SEP_SQ = 20.0 * 20.0  # sample-pair pixel separation (":> 20*20")


def pairwise_sq_dists(a: jax.Array) -> jax.Array:
    """(M,3) -> (M,M) squared distances via an MXU matmul (f32 HIGHEST)."""
    sq = (a * a).sum(-1)
    dot = jnp.dot(a, a.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    d = sq[:, None] + sq[None, :] - 2.0 * dot
    return jnp.maximum(d, 0.0)


class ObjectMatches(NamedTuple):
    """Fixed-capacity per-object correspondence store (AdjacencyRansac's
    query/training point vectors, adjacency_ransac.h:48-138)."""

    query_pts: jax.Array   # (M,3) camera-frame 3D query points
    train_pts: jax.Array   # (M,3) object-frame 3D model points
    query_idx: jax.Array   # (M,) int32 source keypoint index
    query_xy: jax.Array    # (M,2) float32 keypoint pixel coords
    valid: jax.Array       # (M,) bool


class AdjacencyGraphs(NamedTuple):
    physical: jax.Array    # (M,M) bool, symmetric, no self-loops
    sample: jax.Array      # (M,M) bool
    valid: jax.Array       # (M,) bool after degree pruning


def prune_low_degree(sample: jax.Array, valid: jax.Array,
                     min_degree: int = MIN_SAMPLE_SIZE,
                     max_iters: int = 8) -> jax.Array:
    """Fixpoint of "drop vertices with < min_degree sample-neighbors among the
    still-valid set" (InvalidateIndices, adjacency_ransac.cpp:64-89).

    Bounded at ``max_iters`` rounds: cascades deeper than that are rare, and
    an under-pruned vertex only costs a few wasted hypothesis samples (the
    reference iterates to the true fixpoint; under vmap a long cascade in ONE
    object would stall every lane)."""

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        valid, _, it = state
        deg = (sample & valid[None, :]).sum(axis=1)
        new_valid = valid & (deg >= min_degree)
        return new_valid, (new_valid != valid).any(), it + 1

    # the initial `changed` flag derives from `valid` so its varying-manual-
    # axes type matches the body output under shard_map (check_vma)
    changed0 = valid.any() | True
    valid, _, _ = jax.lax.while_loop(
        cond, body, (valid, changed0, jnp.int32(0)))
    return valid


def fill_adjacency(m: ObjectMatches, span: jax.Array, sensor_error: float,
                   residual_prune: bool = True) -> AdjacencyGraphs:
    """Build both adjacency matrices + degree-pruned validity for one object.

    ``span``: scalar object span (AABB diagonal of the model cloud).
    """
    dq2 = pairwise_sq_dists(m.query_pts)
    dq = jnp.sqrt(dq2)
    dt = jnp.sqrt(pairwise_sq_dists(m.train_pts))
    dpix2 = pairwise_sq_dists(
        jnp.concatenate([m.query_xy, jnp.zeros_like(m.query_xy[:, :1])], -1))

    cons = jnp.abs(dt - dq)
    span_gate = dq2 <= (span + 2.0 * sensor_error) ** 2
    pair_valid = m.valid[:, None] & m.valid[None, :]
    not_diag = ~jnp.eye(m.valid.shape[0], dtype=bool)

    physical = (span_gate & (cons <= 4.0 * sensor_error)
                & pair_valid & not_diag)
    sample = physical & (dpix2 > PIXEL_SEP_SQ) & (cons < 2.0 * sensor_error)

    valid = m.valid
    if residual_prune:
        valid = prune_low_degree(sample, valid)
    return AdjacencyGraphs(physical=physical, sample=sample, valid=valid)


def invalidate_query_indices(graphs_valid: jax.Array, sample: jax.Array,
                             query_idx: jax.Array,
                             inlier_mask: jax.Array) -> jax.Array:
    """Remove every match sharing a query keypoint with an inlier, then
    degree-prune (InvalidateQueryIndices, adjacency_ransac.cpp:94-123):
    one keypoint can explain at most one detection."""
    shares = (query_idx[:, None] == query_idx[None, :]) & inlier_mask[None, :]
    valid = graphs_valid & ~shares.any(axis=1)
    return prune_low_degree(sample, valid)


def count_unique_query_indices(query_idx: jax.Array,
                               mask: jax.Array) -> jax.Array:
    """Number of distinct keypoints among masked matches (the reference's
    pose-acceptance count, GuessGenerator.cpp:205 uses unique query inliers)."""
    eq = query_idx[:, None] == query_idx[None, :]
    m = mask[:, None] & mask[None, :]
    earlier = jnp.tril(jnp.ones_like(eq), k=-1).astype(bool)
    dup = (eq & m & earlier).any(axis=1)
    return (mask & ~dup).sum()
