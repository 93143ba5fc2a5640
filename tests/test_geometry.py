"""Geometry tests: Kabsch/polar vs SVD oracle, adjacency vs numpy oracle,
graph-RANSAC pose recovery on synthetic correspondences."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tod_tpu.geometry.adjacency import (
    AdjacencyGraphs,
    ObjectMatches,
    count_unique_query_indices,
    fill_adjacency,
    invalidate_query_indices,
    pairwise_sq_dists,
    prune_low_degree,
)
from tod_tpu.geometry.ransac import (
    RansacConfig,
    detect_object_instances,
    ransac_round,
    sample_triples,
)
from tod_tpu.geometry.transforms import (
    apply_rt,
    camera_to_world,
    invert_pose,
    kabsch,
    polar_rotation,
)


def _random_rotation(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32)


def _svd_kabsch(query, training, w=None):
    """Numpy oracle mirroring estimateRigidTransformationSVD
    (sac_model_registration_graph.h:304-347)."""
    if w is None:
        w = np.ones(len(query))
    w = w / w.sum()
    cq = (w[:, None] * query).sum(0)
    ct = (w[:, None] * training).sum(0)
    H = ((training - ct) * w[:, None]).T @ (query - cq)
    U, _, Vt = np.linalg.svd(H)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        Vt[2] *= -1
    R = U @ Vt
    return R, ct - R @ cq


def test_camera_to_world_roundtrip(rng):
    R = _random_rotation(rng)
    T = rng.normal(size=3).astype(np.float32)
    world_pts = rng.normal(size=(50, 3)).astype(np.float32)
    # observation: x_cam = world @ R^T... the reference defines world = (x-T)@R
    cam = world_pts @ R.T + T
    got = np.asarray(camera_to_world(jnp.asarray(R), jnp.asarray(T),
                                     jnp.asarray(cam)))
    np.testing.assert_allclose(got, world_pts, atol=1e-4)


def test_polar_rotation_recovers_rotation(rng):
    for _ in range(10):
        R = _random_rotation(rng)
        scale = rng.uniform(0.5, 2.0)
        got, ok = polar_rotation(jnp.asarray(R * scale))
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(got), R, atol=1e-5)


def test_polar_rotation_flags_degenerate():
    _, ok = polar_rotation(jnp.zeros((3, 3)))
    assert not bool(ok)
    # reflection (det < 0) flagged, not silently patched
    refl = jnp.asarray(np.diag([1.0, 1.0, -1.0]).astype(np.float32))
    _, ok = polar_rotation(refl)
    assert not bool(ok)


def test_kabsch_matches_svd_oracle(rng):
    for n in (3, 10, 100):
        R = _random_rotation(rng)
        T = rng.normal(size=3).astype(np.float32)
        q = rng.normal(size=(n, 3)).astype(np.float32)
        t = q @ R.T + T + rng.normal(size=(n, 3)).astype(np.float32) * 1e-3
        fit = kabsch(jnp.asarray(q), jnp.asarray(t), jnp.ones(n))
        assert bool(fit.ok)
        R_ref, T_ref = _svd_kabsch(q, t)
        np.testing.assert_allclose(np.asarray(fit.R), R_ref, atol=1e-4)
        np.testing.assert_allclose(np.asarray(fit.T), T_ref, atol=1e-4)


def test_kabsch_vmapped_batch(rng):
    B, n = 16, 8
    R = np.stack([_random_rotation(rng) for _ in range(B)])
    T = rng.normal(size=(B, 3)).astype(np.float32)
    q = rng.normal(size=(B, n, 3)).astype(np.float32)
    t = np.einsum("bij,bnj->bni", R, q) + T[:, None]
    fit = kabsch(jnp.asarray(q), jnp.asarray(t), jnp.ones((B, n)))
    assert np.asarray(fit.ok).all()
    np.testing.assert_allclose(np.asarray(fit.R), R, atol=1e-4)


def test_kabsch_weighted_ignores_masked(rng):
    R = _random_rotation(rng)
    T = rng.normal(size=3).astype(np.float32)
    q = rng.normal(size=(20, 3)).astype(np.float32)
    t = q @ R.T + T
    t[10:] += 100.0  # corrupted points, masked out
    w = np.concatenate([np.ones(10), np.zeros(10)]).astype(np.float32)
    fit = kabsch(jnp.asarray(q), jnp.asarray(t), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(fit.R), R, atol=1e-4)


def test_invert_pose():
    rng = np.random.default_rng(3)
    R = _random_rotation(rng)
    T = rng.normal(size=3).astype(np.float32)
    Ri, Ti = invert_pose(jnp.asarray(R), jnp.asarray(T))
    p = rng.normal(size=(5, 3)).astype(np.float32)
    fwd = np.asarray(apply_rt(jnp.asarray(R), jnp.asarray(T), jnp.asarray(p)))
    back = np.asarray(apply_rt(Ri, Ti, jnp.asarray(fwd)))
    np.testing.assert_allclose(back, p, atol=1e-5)


# ---------------------------------------------------------------------------
# Adjacency
# ---------------------------------------------------------------------------


def test_pairwise_sq_dists_exact(rng):
    a = rng.normal(size=(32, 3)).astype(np.float32)
    got = np.asarray(pairwise_sq_dists(jnp.asarray(a)))
    ref = ((a[:, None] - a[None]) ** 2).sum(-1)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def _synthetic_matches(rng, n_true=40, n_out=24, sigma=0.0):
    """Object model points + camera-frame observations + outlier matches."""
    model = rng.uniform(-0.1, 0.1, (max(n_true, 2), 3)).astype(np.float32)
    model = model[:n_true] if n_true else model[:0]
    span_pts = model if n_true else np.array([[-0.1] * 3, [0.1] * 3], np.float32)
    R = _random_rotation(rng)
    T = np.array([0.05, -0.02, 0.8], np.float32)
    cam = model @ R.T + T  # object -> camera
    cam += rng.normal(size=cam.shape).astype(np.float32) * sigma
    # matches: query (camera) point <-> training (object/model) point
    q_pts = [cam]
    t_pts = [model]
    q_idx = [np.arange(n_true)]
    q_xy = [rng.uniform(50, 400, (n_true, 2)).astype(np.float32)]
    # outliers: random wrong training point for random query points
    q_o = rng.uniform(-0.3, 0.3, (n_out, 3)).astype(np.float32) + [0, 0, 0.8]
    t_o = rng.uniform(-0.1, 0.1, (n_out, 3)).astype(np.float32)
    q_pts.append(q_o)
    t_pts.append(t_o)
    q_idx.append(np.arange(n_true, n_true + n_out))
    q_xy.append(rng.uniform(50, 400, (n_out, 2)).astype(np.float32))

    m = ObjectMatches(
        query_pts=jnp.asarray(np.concatenate(q_pts)),
        train_pts=jnp.asarray(np.concatenate(t_pts)),
        query_idx=jnp.asarray(np.concatenate(q_idx), jnp.int32),
        query_xy=jnp.asarray(np.concatenate(q_xy)),
        valid=jnp.ones(n_true + n_out, bool),
    )
    span = float(np.sqrt(((span_pts.max(0) - span_pts.min(0)) ** 2).sum()))
    return m, span, R, T


def test_fill_adjacency_oracle(rng):
    m, span, _, _ = _synthetic_matches(rng)
    sigma = 0.01
    g = fill_adjacency(m, jnp.float32(span), sigma)
    q = np.asarray(m.query_pts)
    t = np.asarray(m.train_pts)
    xy = np.asarray(m.query_xy)
    n = len(q)
    phys = np.asarray(g.physical)
    samp = np.asarray(g.sample)
    for i in range(0, n, 7):
        for j in range(0, n, 5):
            if i == j:
                assert not phys[i, j]
                continue
            dq = np.linalg.norm(q[i] - q[j])
            dt = np.linalg.norm(t[i] - t[j])
            expect_p = (dq <= span + 2 * sigma) and abs(dt - dq) <= 4 * sigma
            assert phys[i, j] == expect_p, (i, j)
            dpix = np.linalg.norm(xy[i] - xy[j])
            expect_s = expect_p and dpix > 20 and abs(dt - dq) < 2 * sigma
            assert samp[i, j] == expect_s, (i, j)


def test_prune_low_degree_fixpoint():
    # chain graph: every vertex has degree <= 2 < 3 -> all pruned
    n = 6
    adj = np.zeros((n, n), bool)
    for i in range(n - 1):
        adj[i, i + 1] = adj[i + 1, i] = True
    valid = prune_low_degree(jnp.asarray(adj), jnp.ones(n, bool))
    assert not np.asarray(valid).any()
    # complete graph survives
    full = ~np.eye(n, dtype=bool)
    valid = prune_low_degree(jnp.asarray(full), jnp.ones(n, bool))
    assert np.asarray(valid).all()


def test_count_unique_query_indices():
    qi = jnp.asarray([3, 3, 5, 7, 7, 7], jnp.int32)
    mask = jnp.asarray([True, True, True, True, False, True])
    assert int(count_unique_query_indices(qi, mask)) == 3  # {3,5,7}


def test_invalidate_query_indices():
    n = 8
    adj = jnp.asarray(~np.eye(n, dtype=bool))
    qi = jnp.asarray([0, 0, 1, 2, 3, 4, 5, 6], jnp.int32)
    inl = jnp.asarray([True] + [False] * 7)
    valid = invalidate_query_indices(jnp.ones(n, bool), adj, qi, inl)
    v = np.asarray(valid)
    assert not v[0] and not v[1]  # both matches of keypoint 0 removed
    assert v[2:].all()


# ---------------------------------------------------------------------------
# RANSAC
# ---------------------------------------------------------------------------


def test_sample_triples_are_cliques(rng):
    m, span, _, _ = _synthetic_matches(rng)
    g = fill_adjacency(m, jnp.float32(span), 0.01)
    key = jax.random.PRNGKey(0)
    (v1, v2, v3), ok = sample_triples(key, g.sample, g.valid, 64)
    samp = np.asarray(g.sample)
    v1, v2, v3, ok = map(np.asarray, (v1, v2, v3, ok))
    assert ok.sum() > 0
    for b in np.nonzero(ok)[0]:
        assert samp[v1[b], v2[b]] and samp[v1[b], v3[b]] and samp[v2[b], v3[b]]


def test_ransac_recovers_pose(rng):
    m, span, R, T = _synthetic_matches(rng, n_true=40, n_out=24, sigma=0.001)
    g = fill_adjacency(m, jnp.float32(span), 0.01)
    cfg = RansacConfig(n_hypotheses=256, min_inliers=8)
    rr = ransac_round(jax.random.PRNGKey(1), m, g, g.valid, cfg)
    assert bool(rr.found)
    assert int(rr.n_unique) >= 30  # most true matches recovered
    # output pose maps object/model frame -> camera frame
    np.testing.assert_allclose(np.asarray(rr.R), R, atol=5e-2)
    np.testing.assert_allclose(np.asarray(rr.T), T, atol=5e-3)


def test_ransac_pose_subcentimeter(rng):
    m, span, R, T = _synthetic_matches(rng, n_true=60, n_out=10, sigma=0.0)
    g = fill_adjacency(m, jnp.float32(span), 0.01)
    cfg = RansacConfig(n_hypotheses=512)
    rr = ransac_round(jax.random.PRNGKey(2), m, g, g.valid, cfg)
    assert bool(rr.found)
    # noiseless: sub-millimeter translation recovery
    assert np.abs(np.asarray(rr.T) - T).max() < 1e-3
    assert np.abs(np.asarray(rr.R) - R).max() < 1e-3


def test_ransac_rejects_pure_outliers(rng):
    m, span, _, _ = _synthetic_matches(rng, n_true=0, n_out=48)
    g = fill_adjacency(m, jnp.float32(span + 0.5), 0.01)
    cfg = RansacConfig(n_hypotheses=256, min_inliers=8)
    det = detect_object_instances(jax.random.PRNGKey(3), m, g, cfg)
    assert not np.asarray(det.accepted).any()


def test_multi_instance_detection(rng):
    # two instances of the same object at different poses
    model = rng.uniform(-0.1, 0.1, (40, 3)).astype(np.float32)
    poses = []
    q_pts, t_pts, q_idx, q_xy = [], [], [], []
    for k, offset in enumerate([(-0.25, 0.0, 0.8), (0.25, 0.1, 1.0)]):
        R = _random_rotation(rng)
        T = np.asarray(offset, np.float32)
        poses.append((R, T))
        cam = model @ R.T + T
        q_pts.append(cam)
        t_pts.append(model)
        q_idx.append(np.arange(k * 40, (k + 1) * 40))
        q_xy.append(rng.uniform(40 + 300 * k, 250 + 300 * k,
                                (40, 2)).astype(np.float32))
    m = ObjectMatches(
        query_pts=jnp.asarray(np.concatenate(q_pts)),
        train_pts=jnp.asarray(np.concatenate(t_pts)),
        query_idx=jnp.asarray(np.concatenate(q_idx), jnp.int32),
        query_xy=jnp.asarray(np.concatenate(q_xy)),
        valid=jnp.ones(80, bool),
    )
    span = float(np.sqrt(((model.max(0) - model.min(0)) ** 2).sum()))
    g = fill_adjacency(m, jnp.float32(span), 0.01)
    cfg = RansacConfig(n_hypotheses=512, min_inliers=8, max_instances=4)
    det = detect_object_instances(jax.random.PRNGKey(4), m, g, cfg)
    acc = np.asarray(det.accepted)
    assert acc.sum() == 2
    got_ts = np.asarray(det.T)[acc]
    want_ts = np.stack([T for _, T in poses])
    # match each found pose to a ground-truth instance
    d = np.linalg.norm(got_ts[:, None] - want_ts[None], axis=-1)
    assert (d.min(axis=1) < 5e-3).all()
    assert set(d.argmin(axis=1)) == {0, 1}


def test_active_object_selection(rng):
    """With many DB objects, only the top-by-match-count get RANSAC'd; a true
    object beyond index max_active_objects must still be found."""
    import jax
    from tod_tpu.geometry.detection import (GuessConfig,
                                            detect_frame_from_matches)
    from tod_tpu.geometry.ransac import RansacConfig

    n_obj = 30
    true_obj = 27  # beyond the active window if selection were naive
    model = rng.uniform(-0.1, 0.1, (40, 3)).astype(np.float32)
    R = _random_rotation(rng)
    T = np.array([0.0, 0.05, 0.8], np.float32)
    cam = model @ R.T + T

    q = 80
    k = 2
    obj_idx = np.full((q, k), -1, np.int32)
    valid = np.zeros((q, k), bool)
    dist = np.full((q, k), 20.0, np.float32)
    train_pts = np.zeros((q, k, 3), np.float32)
    query_pts = np.full((q, 3), np.nan, np.float32)
    query_xy = rng.uniform(50, 400, (q, 2)).astype(np.float32)
    # 40 true matches on the true object
    obj_idx[:40, 0] = true_obj
    valid[:40, 0] = True
    train_pts[:40, 0] = model
    query_pts[:40] = cam
    # sprinkle weak matches on other objects (1 each)
    for o in range(20):
        obj_idx[40 + o, 0] = o
        valid[40 + o, 0] = True
        train_pts[40 + o, 0] = rng.uniform(-0.1, 0.1, 3)
        query_pts[40 + o] = rng.uniform(-0.2, 0.2, 3) + [0, 0, 0.8]

    spans = np.full(n_obj, 0.3, np.float32)
    cfg = GuessConfig(ransac=RansacConfig(n_hypotheses=256, min_inliers=8,
                                          max_instances=2),
                      max_matches_per_object=64, max_active_objects=4)
    _, det = detect_frame_from_matches(
        jax.random.PRNGKey(0), jnp.asarray(obj_idx), jnp.asarray(dist),
        jnp.asarray(valid), jnp.asarray(train_pts), jnp.asarray(query_pts),
        jnp.asarray(query_xy), jnp.asarray(spans), cfg)
    acc = np.asarray(det.accepted)
    assert acc.shape == (n_obj, 2)
    assert acc[true_obj].any()
    np.testing.assert_allclose(np.asarray(det.T)[true_obj, 0], T, atol=5e-3)


def test_cluster_matches_rank_major_for_l2_distances():
    """Regression: the eviction priority must stay rank-major even when
    distances exceed 300 (routine for the L2/SIFT path): with capacity for
    only the best matches, every keypoint's rank-0 match survives before any
    keypoint's rank-1 match."""
    from tod_tpu.geometry.detection import cluster_matches

    q, k, cap = 6, 2, 6
    obj_idx = np.zeros((q, k), np.int32)
    # rank-0 distances are big (L2-style); rank-1 distances tiny
    dist = np.stack([np.full(q, 5000.0), np.full(q, 1.0)], axis=1)
    dist = dist.astype(np.float32)
    valid = np.ones((q, k), bool)
    train = np.zeros((q, k, 3), np.float32)
    qpts = np.zeros((q, 3), np.float32)
    qxy = np.zeros((q, 2), np.float32)
    out = cluster_matches(jnp.asarray(obj_idx), jnp.asarray(dist),
                          jnp.asarray(valid), jnp.asarray(train),
                          jnp.asarray(qpts), jnp.asarray(qxy),
                          jnp.asarray([0], jnp.int32), cap)
    # capacity 6 = exactly the 6 rank-0 matches; all 6 keypoints must appear
    kept = np.asarray(out.query_idx[0])[np.asarray(out.valid[0])]
    assert sorted(kept.tolist()) == list(range(q))


def test_fixed_refine_loop_matches_while_loop(rng):
    """fixed_refine_loop (the batched-serving form) is result-identical to
    the while_loop refinement for the same key/config."""
    import dataclasses

    m, span, _, _ = _synthetic_matches(rng, n_true=40, n_out=24, sigma=0.002)
    g = fill_adjacency(m, jnp.float32(span), 0.01)
    cfg = RansacConfig(n_hypotheses=256, min_inliers=8)
    key = jax.random.PRNGKey(5)
    a = ransac_round(key, m, g, g.valid, cfg)
    b = ransac_round(key, m, g, g.valid,
                     dataclasses.replace(cfg, fixed_refine_loop=True))
    assert bool(a.found) == bool(b.found)
    np.testing.assert_array_equal(np.asarray(a.inliers),
                                  np.asarray(b.inliers))
    np.testing.assert_allclose(np.asarray(a.R), np.asarray(b.R), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.T), np.asarray(b.T), atol=1e-6)


def test_continuation_budget_keeps_contract(rng):
    """Budget-split multi-instance rounds: round 1 results identical to the
    full-budget path (same key), later instances still found at the lean
    budget, and every accepted pose keeps the acceptance contract."""
    import dataclasses

    # reuse the two-instance scene from test_multi_instance_detection
    model = rng.uniform(-0.1, 0.1, (40, 3)).astype(np.float32)
    q_pts, t_pts, q_idx, q_xy, poses = [], [], [], [], []
    for k, offset in enumerate([(-0.25, 0.0, 0.8), (0.25, 0.1, 1.0)]):
        R = _random_rotation(rng)
        T = np.asarray(offset, np.float32)
        poses.append((R, T))
        q_pts.append(model @ R.T + T)
        t_pts.append(model)
        q_idx.append(np.arange(k * 40, (k + 1) * 40))
        q_xy.append(rng.uniform(40 + 300 * k, 250 + 300 * k,
                                (40, 2)).astype(np.float32))
    m = ObjectMatches(
        query_pts=jnp.asarray(np.concatenate(q_pts)),
        train_pts=jnp.asarray(np.concatenate(t_pts)),
        query_idx=jnp.asarray(np.concatenate(q_idx), jnp.int32),
        query_xy=jnp.asarray(np.concatenate(q_xy)),
        valid=jnp.ones(80, bool),
    )
    span = float(np.sqrt(((model.max(0) - model.min(0)) ** 2).sum()))
    g = fill_adjacency(m, jnp.float32(span), 0.01)
    full = RansacConfig(n_hypotheses=512, min_inliers=8, max_instances=4)
    split = dataclasses.replace(full, continuation_hypotheses=128)
    key = jax.random.PRNGKey(4)
    d_full = detect_object_instances(key, m, g, full)
    d_split = detect_object_instances(key, m, g, split)
    # round 1 is bit-identical (same budget, same key)
    np.testing.assert_allclose(np.asarray(d_full.T)[0],
                               np.asarray(d_split.T)[0], atol=1e-6)
    # both instances still found under the split budget
    acc = np.asarray(d_split.accepted)
    assert acc.sum() == 2
    got_ts = np.asarray(d_split.T)[acc]
    want_ts = np.stack([T for _, T in poses])
    d = np.linalg.norm(got_ts[:, None] - want_ts[None], axis=-1)
    assert (d.min(axis=1) < 5e-3).all()
    assert set(d.argmin(axis=1)) == {0, 1}
    # contract: accepted poses carry >= min_inliers unique keypoints
    assert (np.asarray(d_split.n_inliers)[acc] >= 8).all()
