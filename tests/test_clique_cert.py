"""Greedy-vs-exact clique certification validation (VERDICT round-1 weak #3).

The in-RANSAC certificate (geometry/ransac.py _greedy_clique_size) is a
LOWER bound on the max clique: greedy-certified implies exact-certified, so
the only possible divergence is under-certification (greedy rejects a
hypothesis the reference's exact Graph::FindClique would accept,
sac_model_registration_graph.h:202-265). These tests quantify that
divergence on (a) hypothesis candidate sets from a REAL detection scene and
(b) adversarial random graphs, and pin the one-sidedness invariant.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tod_tpu.geometry.adjacency import fill_adjacency
from tod_tpu.geometry.detection import cluster_matches
from tod_tpu.geometry.ransac import (
    RansacConfig,
    _greedy_clique_size,
    sample_triples,
)
from tod_tpu.geometry.transforms import kabsch
from tod_tpu.native import Graph

MINIMAL = 7  # clique_minimal_size: min(best_inlier_number_=8, 7)


def exact_certified(sample_adj: np.ndarray, cand: np.ndarray,
                    minimal: int = MINIMAL) -> bool:
    """Reference-exact certificate: does the candidate set contain a
    sample-adjacency clique of size > minimal? (native MaxCliqueDyn)."""
    idx = np.nonzero(cand)[0]
    if len(idx) <= minimal:
        return False
    g = Graph(len(idx))
    sub = sample_adj[np.ix_(idx, idx)]
    for a in range(len(idx)):
        for b in range(a + 1, len(idx)):
            if sub[a, b]:
                g.add_edge(a, b)
    return len(g.find_clique(minimal + 1)) > minimal


def greedy_certified(sample_adj: np.ndarray, cand: np.ndarray,
                     minimal: int = MINIMAL) -> bool:
    size = _greedy_clique_size(jnp.asarray(sample_adj),
                               jnp.asarray(cand[None]), minimal + 1)
    return int(np.asarray(size)[0]) > minimal


def _hypothesis_candidate_sets(key, matches, graphs, sigma, n_hyp=768):
    """Replicate ransac_round's candidate-inlier construction for real
    hypothesis draws (geometry/ransac.py:126-153)."""
    valid = np.asarray(graphs.valid)
    (v1, v2, v3), ok = sample_triples(key, graphs.sample,
                                      jnp.asarray(valid), n_hyp)
    v1, v2, v3 = np.asarray(v1), np.asarray(v2), np.asarray(v3)
    ok = np.asarray(ok)
    q = np.asarray(matches.query_pts)
    t = np.asarray(matches.train_pts)
    phys = np.asarray(graphs.physical)
    samp_deg = (np.asarray(graphs.sample) & valid[None, :]).sum(1)
    idx3 = np.stack([v1, v2, v3], 1)
    fit = kabsch(jnp.asarray(q[idx3]), jnp.asarray(t[idx3]),
                 jnp.ones((n_hyp, 3), jnp.float32))
    R = np.asarray(fit.R)
    T = np.asarray(fit.T)
    fit_ok = np.asarray(fit.ok)
    sets = []
    for h in range(n_hyp):
        if not (ok[h] and fit_ok[h]):
            continue
        onehot = np.zeros(len(valid), bool)
        onehot[[v1[h], v2[h], v3[h]]] = True
        possible = (phys[v1[h]] & phys[v2[h]] & phys[v3[h]] & valid) | \
            (onehot & valid)
        res = ((q @ R[h].T + T[h] - t) ** 2).sum(-1)
        inlier = possible & (res < sigma * sigma)
        filtered = inlier & (samp_deg >= MINIMAL)
        if filtered.sum() > MINIMAL:   # only these reach the clique check
            sets.append(filtered)
    return sets


@pytest.fixture(scope="module")
def scene_graphs():
    """Adjacency graphs + candidate sets from a REAL detection scene
    (2 trained objects, both present, plus realistic junk matches)."""
    from tod_tpu.db import InMemoryDb, insert_observation, load_models_for_objects
    from tod_tpu.models import TodTrainer
    from tod_tpu.models.fused import FusedDetectorConfig, pack_models, match_against_db
    from tod_tpu.ops.depth import depth_to_3d_sparse, to_metric_depth
    from tod_tpu.ops.image import rgb_to_gray
    from tod_tpu.ops.orb import orb_detect_and_compute
    from tod_tpu.utils.synthetic import (DEFAULT_K, SyntheticObject,
                                         compose_scene, facing_pose,
                                         turntable_observations)

    InMemoryDb.reset_shared()
    db = InMemoryDb.shared("cliq")
    objects = []
    hw = (240, 320)
    K = DEFAULT_K.copy()
    K[:2] //= 2
    for i in range(2):
        obj = SyntheticObject.make(f"cobj{i}", seed=300 + i)
        objects.append(obj)
        for obs in turntable_observations(obj, n_views=6,
                                          elevations_deg=(60.0,), hw=hw, K=K):
            insert_observation(db, obj.object_id, obs["frame_number"],
                               obs["image"], obs["depth"], obs["mask"],
                               obs["K"], obs["R"], obs["T"])
        TodTrainer("t", object_id=obj.object_id,
                   json_db=json.dumps({"type": "mem", "collection": "cliq"}),
                   json_feature_params=json.dumps(
                       {"type": "ORB", "n_features": 300})).process()
    models = load_models_for_objects(db, "all")
    # radius sized to the learned-pattern distance scale so the graphs carry
    # a realistic mix of true correspondences and junk
    cfg = FusedDetectorConfig(n_features=800, db_chunk=512, radius=72.0)
    mdb, _ = pack_models(models, 512)

    rng = np.random.default_rng(8)
    image, depth = compose_scene(
        objects, [facing_pose(rng, z=0.7, max_tilt=0.3, xy_extent=0.1),
                  facing_pose(rng, z=0.9, max_tilt=0.3, xy_extent=0.1)],
        hw=hw, K=K)
    gray = rgb_to_gray(jnp.asarray(image, jnp.float32))
    kps, desc = orb_detect_and_compute(gray, n_features=800)
    dist, rows = match_against_db(desc, mdb, cfg)
    m_valid = (rows >= 0) & (dist <= cfg.radius) & kps.valid[:, None]
    safe = jnp.maximum(rows, 0)
    obj_idx = jnp.where(m_valid, mdb.obj_of_row[safe], -1)
    train_pts = mdb.points[safe]
    depth_m = to_metric_depth(jnp.asarray(depth))
    query_pts = depth_to_3d_sparse(depth_m, jnp.asarray(K, jnp.float32),
                                   kps.xy)
    query_pts = jnp.where(kps.valid[:, None], query_pts, jnp.nan)
    clustered = cluster_matches(obj_idx, dist, m_valid, train_pts, query_pts,
                                kps.xy, jnp.arange(2, dtype=jnp.int32), 256)
    out = []
    for o in range(2):
        m = jax.tree.map(lambda x, o=o: x[o], clustered)
        graphs = fill_adjacency(m, jnp.asarray(models[o].span), 0.01)
        sets = _hypothesis_candidate_sets(jax.random.PRNGKey(17 + o), m,
                                          graphs, 0.01)
        out.append((np.asarray(graphs.sample), sets))
    return out


def test_greedy_agrees_with_exact_on_scene_graphs(scene_graphs):
    total, diverged, certified = 0, 0, 0
    for sample_adj, sets in scene_graphs:
        for cand in sets:
            g = greedy_certified(sample_adj, cand)
            e = exact_certified(sample_adj, cand)
            assert not (g and not e), "greedy over-certified (impossible)"
            total += 1
            certified += int(e)
            diverged += int(e and not g)
    assert total >= 50, f"too few candidate sets reached the check ({total})"
    assert certified > 0, "no certified hypotheses (bad setup)"
    rate = diverged / total
    assert rate <= 0.01, (
        f"greedy under-certified {diverged}/{total} = {rate:.1%} "
        "(> 1%: add an exact fallback path)")


def test_greedy_is_lower_bound_on_adversarial_graphs(rng):
    """Greedy can never over-certify, and on sparse random graphs with a
    planted 8-clique it must find it: the planted clique's members dominate
    the degree ranking the greedy follows."""
    n = 96
    for trial in range(20):
        p = [0.05, 0.15, 0.3][trial % 3]
        adj = rng.random((n, n)) < p
        adj = np.triu(adj, 1)
        members = rng.choice(n, 8, replace=False)
        if trial % 2 == 0:
            for a in range(8):
                for b in range(a + 1, 8):
                    adj[min(members[a], members[b]),
                        max(members[a], members[b])] = True
        adj = adj | adj.T
        cand = np.zeros(n, bool)
        cand[rng.choice(n, 48, replace=False)] = True
        cand[members] = trial % 2 == 0
        g = greedy_certified(adj, cand)
        e = exact_certified(adj, cand)
        assert not (g and not e), "greedy over-certified (impossible)"
        if trial % 2 == 0 and p <= 0.15:
            assert e, "planted clique not found by exact solver?!"
