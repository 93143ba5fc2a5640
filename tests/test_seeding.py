"""Tracked-pose hypothesis seeding (geometry/ransac.py SeedPose).

A tracked object's last ACCEPTED pose enters tier-2 round 1 as one extra
hypothesis. It competes under the unchanged acceptance contract
(residual inliers + clique certificate + min_inliers unique keypoints),
so a wrong/stale seed can never be accepted on trust — but a correct seed
makes re-detection independent of per-frame sampling luck (the measured
steady-state flicker on weak textures, PROGRESS.md round 3).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tod_tpu.geometry.adjacency import ObjectMatches, fill_adjacency
from tod_tpu.geometry.ransac import (RansacConfig, SeedPose,
                                     detect_object_instances, ransac_round)


def _rigid_cluster(rng, pts):
    """Camera points = random rigid pose applied to object points ``pts``."""
    r = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
    if np.linalg.det(r) < 0:
        r[:, 0] *= -1
    t = rng.uniform(-0.1, 0.1, 3).astype(np.float32) + [0, 0, 0.8]
    return pts @ r.T + t, (r, t)


def _scene(rng, n_correct=10, n_junk_clusters=11, junk_size=5, sigma=0.01):
    """Handcrafted per-object match store: ``n_correct`` matches related by
    one rigid pose (output convention R_o @ obj + T_o = camera) plus junk
    in SMALL internally-rigid sub-clusters — each is sample-adjacent (so it
    survives degree pruning and soaks up sampling draws) but has fewer
    members than min_inliers (so junk poses are never accepted)."""
    m = n_correct + n_junk_clusters * junk_size
    t = rng.uniform(-0.08, 0.08, (m, 3)).astype(np.float32)   # object frame
    q = np.empty((m, 3), np.float32)
    q[:n_correct], (r_o, t_o) = _rigid_cluster(rng, t[:n_correct])
    for c in range(n_junk_clusters):
        lo = n_correct + c * junk_size
        q[lo:lo + junk_size], _ = _rigid_cluster(rng, t[lo:lo + junk_size])
    # pixel coords on a 70 px grid: every pair clears the 20 px
    # sample-adjacency separation rule deterministically
    gx, gy = np.meshgrid(np.arange(9), np.arange(8))
    grid = np.stack([40 + 70 * gx.ravel(), 30 + 55 * gy.ravel()], -1)
    xy = grid[rng.permutation(len(grid))[:m]].astype(np.float32)
    matches = ObjectMatches(
        query_pts=jnp.asarray(q), train_pts=jnp.asarray(t),
        query_idx=jnp.arange(m, dtype=jnp.int32),
        query_xy=jnp.asarray(xy), valid=jnp.ones(m, bool))
    span = jnp.float32(np.linalg.norm(t.max(0) - t.min(0)))
    graphs = fill_adjacency(matches, span, sigma)
    return matches, graphs, (r_o, t_o)


def _starved_cfg():
    # a 1-hypothesis uniform draw over a junk-cluster-dominated sampling
    # graph essentially never lands an all-correct triple — re-detection
    # without a seed is luck
    return RansacConfig(n_hypotheses=1, min_inliers=8, sensor_error=0.01,
                        max_instances=2, weighted_sampling=False)


def test_seed_recovers_pose_when_sampling_starved(rng):
    matches, graphs, (r_o, t_o) = _scene(rng)
    cfg = _starved_cfg()

    # deterministically pick a key whose single unseeded draw fails
    key = None
    for k in range(16):
        bare = ransac_round(jax.random.PRNGKey(k), matches, graphs,
                            graphs.valid, cfg)
        if not bool(bare.found) or int(bare.n_unique) < cfg.min_inliers:
            key = jax.random.PRNGKey(k)
            break
    assert key is not None, (
        "fixture too easy: every 1-hypothesis draw found the pose unseeded; "
        "rebalance the junk clusters")

    seed = SeedPose(R=jnp.asarray(r_o), T=jnp.asarray(t_o),
                    ok=jnp.asarray(True))
    seeded = ransac_round(key, matches, graphs, graphs.valid, cfg, seed)
    assert bool(seeded.found)
    assert int(seeded.n_unique) >= cfg.min_inliers
    np.testing.assert_allclose(np.asarray(seeded.R), r_o, atol=1e-3)
    np.testing.assert_allclose(np.asarray(seeded.T), t_o, atol=1e-3)


def test_seed_disabled_is_identical_to_no_seed(rng):
    matches, graphs, _ = _scene(rng)
    cfg = RansacConfig(n_hypotheses=128, min_inliers=8, sensor_error=0.01,
                       max_instances=3)
    key = jax.random.PRNGKey(1)
    off = SeedPose(R=jnp.eye(3), T=jnp.zeros(3), ok=jnp.asarray(False))
    det_none = detect_object_instances(key, matches, graphs, cfg)
    det_off = detect_object_instances(key, matches, graphs, cfg, off)
    for a, b in zip(det_none, det_off):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_wrong_seed_is_never_accepted_on_trust(rng):
    """A garbage seed over a junk-only store must not be accepted: the
    seed hypothesis still needs min_inliers residual-consistent unique
    keypoints + the clique certificate."""
    matches, graphs, _ = _scene(rng, n_correct=0, n_junk_clusters=13)
    cfg = _starved_cfg()
    bad = SeedPose(R=jnp.eye(3), T=jnp.asarray([0.0, 0.0, 0.5]),
                   ok=jnp.asarray(True))
    det = detect_object_instances(jax.random.PRNGKey(2), matches, graphs,
                                  cfg, bad)
    assert not bool(np.asarray(det.accepted).any())


def test_seed_beats_continuation_budget_split(rng):
    """Seeding composes with continuation_hypotheses: round 1 carries the
    seed AND the full budget; continuation rounds search leftover matches."""
    matches, graphs, (r_o, t_o) = _scene(rng)
    cfg = RansacConfig(n_hypotheses=2, min_inliers=8, sensor_error=0.01,
                       max_instances=3, continuation_hypotheses=2)
    seed = SeedPose(R=jnp.asarray(r_o), T=jnp.asarray(t_o),
                    ok=jnp.asarray(True))
    det = detect_object_instances(jax.random.PRNGKey(3), matches, graphs,
                                  cfg, seed)
    acc = np.asarray(det.accepted)
    assert acc[0], "seeded round 1 must accept the seeded instance"
    best = np.asarray(det.T)[0]
    np.testing.assert_allclose(best, t_o, atol=1e-3)


def test_uncertified_seed_competes_at_the_floor(rng):
    """Weak-texture regime (tools/diag_seed_probe.py): the true pose's
    strict-sigma support has NO clique-minimal-size clique, so every round
    is won by sub-minimal uncertified draws that refinement then grows.
    The seed must compete at the same floor — min(n, minimal) — instead of
    being killed to 0 for having more inliers than the certificate can
    certify. Construction: 10 correct matches in 5 tight pixel pairs
    (< 20 px separation breaks sample adjacency within a pair, so the max
    sample clique over the true support is 5 < minimal+1 = 8)."""
    n_correct, n_junk_clusters, junk_size = 10, 8, 4
    m = n_correct + n_junk_clusters * junk_size
    t = rng.uniform(-0.08, 0.08, (m, 3)).astype(np.float32)
    q = np.empty((m, 3), np.float32)
    q[:n_correct], (r_o, t_o) = _rigid_cluster(rng, t[:n_correct])
    for c in range(n_junk_clusters):
        lo = n_correct + c * junk_size
        q[lo:lo + junk_size], _ = _rigid_cluster(rng, t[lo:lo + junk_size])
    gx, gy = np.meshgrid(np.arange(9), np.arange(8))
    grid = np.stack([40 + 70 * gx.ravel(), 30 + 55 * gy.ravel()], -1)
    xy = grid[rng.permutation(len(grid))[:m]].astype(np.float32)
    # squeeze the correct matches into 5 tight pairs (10 px apart)
    for p in range(5):
        xy[2 * p + 1] = xy[2 * p] + [10.0, 0.0]
    matches = ObjectMatches(
        query_pts=jnp.asarray(q), train_pts=jnp.asarray(t),
        query_idx=jnp.arange(m, dtype=jnp.int32),
        query_xy=jnp.asarray(xy), valid=jnp.ones(m, bool))
    span = jnp.float32(np.linalg.norm(t.max(0) - t.min(0)))
    graphs = fill_adjacency(matches, span, 0.01)

    # certificate sanity: the true support really has no 8-clique
    from tod_tpu.geometry.ransac import _greedy_clique_size
    cand = jnp.zeros((1, m), bool).at[0, :n_correct].set(True)
    assert int(_greedy_clique_size(graphs.sample, cand, 8)[0]) < 8

    cfg = RansacConfig(n_hypotheses=1, min_inliers=8, sensor_error=0.01,
                       max_instances=1, weighted_sampling=False)
    seed = SeedPose(R=jnp.asarray(r_o), T=jnp.asarray(t_o),
                    ok=jnp.asarray(True))
    seeded = ransac_round(jax.random.PRNGKey(0), matches, graphs,
                          graphs.valid, cfg, seed)
    assert bool(seeded.found)
    assert int(seeded.n_unique) >= cfg.min_inliers
    np.testing.assert_allclose(np.asarray(seeded.T), t_o, atol=1e-3)
