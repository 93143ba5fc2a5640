"""Graph-constrained RANSAC with clique certification — vmapped on TPU.

TPU-native rebuild of the reference's pose engine:
  * ``RandomSampleConsensus::computeModel`` (src/common/ransac.h:80-143) —
    the sequential adaptive loop becomes a fixed batch of B hypotheses
    evaluated in parallel with post-hoc best-selection (SURVEY.md section 7
    "adaptive RANSAC termination": match detection behavior, not iteration
    counts);
  * ``SampleConsensusModelRegistrationGraph`` (sac_model_registration_graph.h)
    — rejection-sampled sample-adjacency 3-cliques become masked Gumbel
    categorical draws; candidate inliers are the common physical neighbors of
    the three samples (:177-186) plus the samples; the exact max-clique
    certificate (:202-265) becomes a vectorized greedy clique grown on the
    top-scoring hypotheses (a lower bound; the standalone exact C++
    MaxCliqueDyn lives in tod_tpu.native for API parity);
  * ``AdjacencyRansac::Ransac`` post-fit refinement + pose inversion
    (adjacency_ransac.cpp:235-309);
  * the multi-instance loop with query-keypoint invalidation
    (GuessGenerator.cpp:192-231, adjacency_ransac.cpp:94-123).

Deliberate deviations (documented):
  * the reference never sets the SAC distance threshold, leaving it DBL_MAX
    (sac.h:71) so its residual test is vacuous and inlier membership is purely
    graph-based; we default to the threshold the API intends
    (``sensor_error``) — set ``use_residual_test=False`` for bug-compatible
    behavior;
  * the clique minimal size is pinned to min(initial best=8, 7)=7 instead of
    growing with the best-so-far count (a pruning heuristic only);
  * only the top ``n_clique_checked`` hypotheses by inlier count are
    clique-certified; the rest can win at most min(n_inliers, 7).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from tod_tpu.geometry.adjacency import (
    AdjacencyGraphs,
    ObjectMatches,
    count_unique_query_indices,
    invalidate_query_indices,
)
from tod_tpu.geometry.transforms import (RigidFit, apply_rt, invert_pose,
                                         kabsch)

NEG_INF = -jnp.inf


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    n_hypotheses: int = 1024          # conf/detection.ork:40 uses 2500 seq. iters
    min_inliers: int = 8              # conf/detection.ork:41
    sensor_error: float = 0.01        # conf/detection.ork:42
    max_instances: int = 5            # bounded multi-instance loop
    clique_minimal_size: int = 7      # min(best_inlier_number_=8, 7)
    n_clique_checked: int = 64        # hypotheses that get the clique pass
    max_refine_iters: int = 8
    use_residual_test: bool = True
    # Sample triples proportionally to each vertex's 3-path count in the
    # sample-consistency graph (w = A^3 1): correct matches are mutually
    # consistent and dominate the dense core, so weighting concentrates
    # hypotheses there (measured 1.5-4x pure-triple rate on real scenes,
    # tools/diag_hypotheses.py H3). Same acceptance contract; the reference
    # samples uniformly (sac_model_registration_graph.h:141-168).
    weighted_sampling: bool = True
    # Refit the FINAL pose on the strict sigma^2 inlier set. The reference's
    # last refinement absorbs matches up to (2*sigma)^2 residual and fits the
    # pose on them (adjacency_ransac.cpp:296-303), which drags near-threshold
    # junk into the estimate; acceptance counting is unchanged (still the
    # grown set) — only the reported pose sharpens.
    tight_final_fit: bool = False
    # Hypothesis budget for instance rounds AFTER the first (0 = same as
    # n_hypotheses). The first round carries the full search; continuation
    # rounds only need to (a) find additional instances among the matches
    # the first round left valid and (b) retry a noisy miss — both need far
    # fewer draws. The acceptance contract (min_inliers unique keypoints +
    # clique certificate) is unchanged; this trims the reference's
    # pay-full-price-every-round shape (GuessGenerator.cpp:192-231) that the
    # round-2 profile identified as the top geometry cost.
    continuation_hypotheses: int = 0
    # Use a fixed-trip masked refinement loop instead of lax.while_loop.
    # Identical results (the while_loop is bounded by max_refine_iters and
    # the body is idempotent once converged); the static trip count is what
    # vmapped/batched serving needs — while_loop under vmap is the measured
    # lane-stall + pathological-compile source (PROGRESS.md round 2).
    fixed_refine_loop: bool = False


class RansacRound(NamedTuple):
    R: jax.Array          # (3,3) — object->camera (already inverted)
    T: jax.Array          # (3,)
    inliers: jax.Array    # (M,) bool — final inlier matches
    n_unique: jax.Array   # () int32 — unique query keypoints among inliers
    found: jax.Array      # () bool
    rms_residual: jax.Array   # () f32 — RMS 3D residual (m) over inliers
    clique_size: jax.Array    # () int32 — greedy sample-adjacency clique
                              # over the final inliers (capped at
                              # CLIQUE_STAT_STEPS)


CLIQUE_STAT_STEPS = 16  # growth budget for the per-pose clique statistic
                        # (the confidence signal, not the acceptance
                        # certificate — that stays clique > minimal)


class SeedPose(NamedTuple):
    """Optional extra tier-2 hypothesis from temporal tracking: the object's
    last ACCEPTED pose (output convention, object->camera — exactly what
    ObjectDetections stores). It enters the hypothesis pool as one more
    candidate and competes under the unchanged acceptance contract
    (residual inliers, clique certificate, min_inliers unique keypoints),
    so a stale or wrong seed can never be accepted on trust — it only
    removes per-frame sampling variance once an object has been found
    (the measured steady-state flicker source on weak textures)."""

    R: jax.Array    # (3,3) object->camera
    T: jax.Array    # (3,)
    ok: jax.Array   # () bool — False = no seed (pool unchanged in effect)


def _masked_gumbel_argmax(key, mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Uniform draw from each row's true entries: argmax of Gumbel noise."""
    g = jax.random.gumbel(key, mask.shape, dtype=jnp.float32)
    score = jnp.where(mask, g, NEG_INF)
    return jnp.argmax(score, axis=-1).astype(jnp.int32), mask.any(-1)


def _masked_weighted_argmax(key, mask: jax.Array,
                            logw: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Categorical draw proportional to exp(logw) over each row's true
    entries (Gumbel-max with log-weights)."""
    g = jax.random.gumbel(key, mask.shape, dtype=jnp.float32)
    score = jnp.where(mask, g + logw, NEG_INF)
    return jnp.argmax(score, axis=-1).astype(jnp.int32), mask.any(-1)


def consistency_log_weights(sample_adj: jax.Array,
                            valid: jax.Array) -> jax.Array:
    """log(1 + [A^3 1]_v): 3-path counts in the valid sample graph — a cheap
    power-iteration proxy for membership in the dense mutually-consistent
    core (three (M,M)x(M,1) MXU matvecs)."""
    a = (sample_adj & valid[:, None] & valid[None, :]).astype(jnp.float32)
    v = valid.astype(jnp.float32)[:, None]
    w = jnp.dot(a, jnp.dot(a, jnp.dot(a, v,
                                      preferred_element_type=jnp.float32),
                           preferred_element_type=jnp.float32),
                preferred_element_type=jnp.float32)
    return jnp.log1p(w[:, 0])


def sample_triples(key, sample_adj: jax.Array, valid: jax.Array, n: int,
                   logw: Optional[jax.Array] = None):
    """Draw n sample-adjacency 3-cliques (drawIndexSampleHelper semantics:
    v1 over valid, v2 over N(v1), v3 over N(v1) ∩ N(v2)); uniform draws, or
    ∝ exp(logw) when given (see :func:`consistency_log_weights`)."""
    k1, k2, k3 = jax.random.split(key, 3)
    m = valid.shape[0]
    lw = jnp.zeros((1, m), jnp.float32) if logw is None else logw[None, :]
    m1 = jnp.broadcast_to(valid, (n, m))
    v1, ok1 = _masked_weighted_argmax(k1, m1, lw)
    m2 = sample_adj[v1] & valid[None, :]
    v2, ok2 = _masked_weighted_argmax(k2, m2, lw)
    m3 = m2 & sample_adj[v2]
    v3, ok3 = _masked_weighted_argmax(k3, m3, lw)
    return (v1, v2, v3), ok1 & ok2 & ok3


def _greedy_clique_size(adj: jax.Array, cand: jax.Array, need: int) -> jax.Array:
    """Grow a clique greedily (max degree-within-candidates first) for ``need``
    steps. ``adj``: (M,M) bool; ``cand``: (B,M) bool. Returns clique sizes
    (B,) in [0, need]. Lower-bounds the max clique within each candidate set."""
    adj_f = adj.astype(jnp.bfloat16)

    def body(_, state):
        cand, size = state
        deg = jnp.dot(cand.astype(jnp.bfloat16), adj_f,
                      preferred_element_type=jnp.float32)      # (B,M)
        pick = jnp.argmax(jnp.where(cand, deg, -1.0), axis=-1)
        has = cand.any(-1)
        size = size + has.astype(jnp.int32)
        cand = cand & adj[pick]
        return cand, size

    # size-0 init derived from `cand` so its varying-manual-axes type matches
    # the body output under shard_map (check_vma)
    size0 = cand[:, 0].astype(jnp.int32) * 0
    _, size = jax.lax.fori_loop(0, need, body, (cand, size0))
    return size


def propose_and_count(key, matches: ObjectMatches, graphs: AdjacencyGraphs,
                      valid: jax.Array, b: int, sigma: float,
                      use_residual_test: bool = True,
                      weighted: bool = True):
    """Draw ``b`` graph-constrained triples, fit Horn poses, and count each
    hypothesis's inliers (common physical neighbors of the samples passing
    the residual test — sac_model_registration_graph.h:171-200 semantics).
    Returns ``(fit, inlier (B,M) bool, n_in (B,) int32)``. Shared by the full
    RANSAC round and the tier-1 presence scorer."""
    m_cap = valid.shape[0]
    q, t = matches.query_pts, matches.train_pts
    logw = (consistency_log_weights(graphs.sample, valid)
            if weighted else None)
    (v1, v2, v3), samp_ok = sample_triples(key, graphs.sample, valid, b,
                                           logw)

    idx3 = jnp.stack([v1, v2, v3], axis=1)                     # (B,3)
    q3 = q[idx3]                                               # (B,3,3)
    t3 = t[idx3]
    fit = kabsch(q3, t3, jnp.ones((b, 3), jnp.float32))

    onehot = (jax.nn.one_hot(v1, m_cap, dtype=bool)
              | jax.nn.one_hot(v2, m_cap, dtype=bool)
              | jax.nn.one_hot(v3, m_cap, dtype=bool))
    possible = (graphs.physical[v1] & graphs.physical[v2] & graphs.physical[v3]
                & valid[None, :]) | (onehot & valid[None, :])
    if use_residual_test:
        transformed = (jnp.einsum("bij,nj->bni", fit.R, q)
                       + fit.T[:, None, :])                    # (B,M,3)
        res = ((transformed - t[None]) ** 2).sum(-1)           # (B,M)
        possible = possible & (res < sigma * sigma)
    inlier = possible & (samp_ok & fit.ok)[:, None]
    n_in = inlier.sum(-1).astype(jnp.int32)                    # (B,)
    return fit, inlier, n_in


def presence_score(key, matches: ObjectMatches, graphs: AdjacencyGraphs,
                   n_hypotheses: int, sensor_error: float) -> jax.Array:
    """Tier-1 activation score: the best hypothesis inlier count over a small
    budget — a lean RANSAC (no clique certificate, no refinement, single
    round). Measures geometric pose support, the only reliable presence
    signal when descriptor distances are uninformative (diag_segmented.py:
    within-radius match counts do not separate present from absent)."""
    _, _, n_in = propose_and_count(key, matches, graphs, graphs.valid,
                                   n_hypotheses, sensor_error)
    return n_in.max()


def ransac_round(key, matches: ObjectMatches, graphs: AdjacencyGraphs,
                 valid: jax.Array, cfg: RansacConfig,
                 seed: Optional[SeedPose] = None) -> RansacRound:
    """One full RANSAC + refinement on the current valid-match mask.

    Returns the best pose in the reference's output convention
    (object/model frame -> camera frame, after inversion). ``seed``
    (optional) prepends one tracked-pose hypothesis to the pool — see
    :class:`SeedPose`; no extra RNG is consumed, and because the seed sits
    at index 0, score ties against sampled hypotheses resolve to the SEED
    (argmax picks the lowest index — the temporally-consistent choice).
    A disabled seed (``ok=False``) scores 0 and leaves results identical."""
    m_cap = valid.shape[0]
    q, t = matches.query_pts, matches.train_pts
    sigma = cfg.sensor_error
    b = cfg.n_hypotheses

    fit, inlier, n_in = propose_and_count(
        key, matches, graphs, valid, b, sigma,
        use_residual_test=cfg.use_residual_test,
        weighted=cfg.weighted_sampling)

    if seed is not None:
        # internal fit convention maps query (camera) -> training (object):
        # the stored output pose is its inverse
        r_s, t_s = invert_pose(seed.R, seed.T)
        res_s = ((apply_rt(r_s, t_s, q) - t) ** 2).sum(-1)     # (M,)
        in_0 = valid & (res_s < sigma * sigma) & seed.ok
        # polish: one strict-sigma refit before scoring. The stored pose is
        # a compromise over its frame's (possibly 4-sigma-grown) inlier set;
        # refitting on its own strict inliers re-centers it in the basin
        # (measured 0.26 cm from a 4-sigma-grown state pose,
        # tools/diag_seed_probe.py).
        fit_p = kabsch(q, t, in_0.astype(jnp.float32))
        r_p = jnp.where(fit_p.ok, fit_p.R, r_s)
        t_p = jnp.where(fit_p.ok, fit_p.T, t_s)
        res_p = ((apply_rt(r_p, t_p, q) - t) ** 2).sum(-1)
        in_s = valid & (res_p < sigma * sigma) & seed.ok
        # the seed goes FIRST in the pool: argmax resolves score ties to
        # the lowest index, so an equal-scoring random draw never steals
        # the round from the temporally-consistent hypothesis
        fit = RigidFit(R=jnp.concatenate([r_p[None], fit.R]),
                       T=jnp.concatenate([t_p[None], fit.T]),
                       ok=jnp.concatenate([seed.ok[None], fit.ok]))
        inlier = jnp.concatenate([in_s[None], inlier])
        n_in = jnp.concatenate(
            [in_s.sum()[None].astype(jnp.int32), n_in])
        b = b + 1

    # --- clique certification on the top hypotheses --------------------------
    minimal = cfg.clique_minimal_size
    h = min(cfg.n_clique_checked, b)
    top_n, top_idx = jax.lax.top_k(n_in, h)
    # the reference's pre-filter: inliers need >= minimal sample-neighbors
    samp_deg = (graphs.sample & valid[None, :]).sum(-1)        # (M,)
    top_inlier = inlier[top_idx]                               # (H,M)
    filtered = top_inlier & (samp_deg >= minimal)[None, :]
    clique_size = _greedy_clique_size(graphs.sample, filtered, minimal + 1)
    certified = clique_size > minimal                          # (H,)
    checked_score = jnp.where(top_n <= minimal, top_n,
                              jnp.where(certified, top_n, 0))
    # un-checked hypotheses can win at most min(n, minimal)
    base_score = jnp.minimum(n_in, minimal)
    score = base_score.at[top_idx].set(checked_score)

    if seed is not None:
        # Seed scoring floor: an UNCERTIFIED seed keeps min(n, minimal)
        # instead of 0. On weak textures the true pose's strict-sigma
        # support can have NO minimal-size clique at all (obj006: exact
        # max clique 6 over 10 true inliers, tools/diag_seed_probe.py) —
        # there, rounds are won by sub-minimal uncertified draws that
        # refinement then grows, a lottery the seed would always lose by
        # scoring 0. The floor lets it compete exactly like those draws;
        # ACCEPTANCE is unchanged (>= min_inliers unique keypoints after
        # refinement), and sampled-hypothesis scoring is untouched, so
        # stateless (unseeded) serving is bit-identical.
        seed_filtered = in_s & (samp_deg >= minimal)
        seed_csize = _greedy_clique_size(graphs.sample,
                                         seed_filtered[None],
                                         minimal + 1)[0]
        n_s = n_in[0]
        score = score.at[0].set(
            jnp.where((n_s <= minimal) | (seed_csize > minimal), n_s,
                      jnp.minimum(n_s, minimal)))

    best = jnp.argmax(score)
    best_score = score[best]
    found = best_score > 0
    best_inliers = inlier[best]
    r0, t0 = fit.R[best], fit.T[best]

    # --- refinement: optimize + absorb extra inliers (Ransac():266-303) ------
    def refine_cond(state):
        _, _, _, _, _, done, it = state
        return (~done) & (it < cfg.max_refine_iters)

    def refine_body(state):
        r_c, t_c, inl, thresh, do_final, _, it = state
        fit_c = kabsch(q, t, inl.astype(jnp.float32))
        r_n = jnp.where(fit_c.ok, fit_c.R, r_c)
        t_n = jnp.where(fit_c.ok, fit_c.T, t_c)
        res = ((apply_rt(r_n, t_n, q) - t) ** 2).sum(-1)
        extra = valid & ~inl & (res < thresh)
        inl_n = inl | extra
        no_extra = ~extra.any()
        done = do_final
        thresh_n = jnp.where(no_extra & ~do_final, thresh * 4.0, thresh)
        do_final_n = do_final | no_extra
        return r_n, t_n, inl_n, thresh_n, do_final_n, done, it + 1

    # thresh/flag inits derive from varying values so their varying-manual-
    # axes types match the body outputs under shard_map (check_vma)
    false0 = best_inliers.any() & False
    init = (r0, t0, best_inliers, jnp.float32(sigma * sigma) + 0.0 * t0[0],
            false0, false0, jnp.int32(0))
    if cfg.fixed_refine_loop:
        # static-trip masked equivalent of the while_loop: each trip computes
        # the update but keeps the old state once the exit condition held
        def refine_fori(_, state):
            new = refine_body(state)
            stop = ~refine_cond(state)
            return jax.tree.map(lambda a, b: jnp.where(stop, a, b),
                                state, new)

        r_f, t_f, inl_f, _, _, _, _ = jax.lax.fori_loop(
            0, cfg.max_refine_iters, refine_fori, init)
    else:
        r_f, t_f, inl_f, _, _, _, _ = jax.lax.while_loop(
            refine_cond, refine_body, init)

    if cfg.tight_final_fit:
        res_t = ((apply_rt(r_f, t_f, q) - t) ** 2).sum(-1)
        inl_t = valid & (res_t < sigma * sigma)
        fit_t = kabsch(q, t, inl_t.astype(jnp.float32))
        r_f = jnp.where(fit_t.ok, fit_t.R, r_f)
        t_f = jnp.where(fit_t.ok, fit_t.T, t_f)

    n_unique = count_unique_query_indices(matches.query_idx, inl_f & found)
    r_out, t_out = invert_pose(r_f, t_f)

    # --- per-pose quality statistics (confidence v2 components) -------------
    # RMS 3D residual of the final pose over its inlier set, and a greedy
    # sample-adjacency clique grown over the final inliers. Junk accepts
    # (refinement-grown sub-minimal draws) sit near the sigma residual
    # ceiling with shallow cliques; true poses sit at sub-mm residuals with
    # deep cliques — fused host-side into the serving confidence
    # (models/fused.py confidence_v2, measured in tools/diag_conf2.py).
    inl_fin = inl_f & found
    res_fin = ((apply_rt(r_f, t_f, q) - t) ** 2).sum(-1)
    n_fin = inl_fin.sum()
    rms = jnp.sqrt(jnp.where(inl_fin, res_fin, 0.0).sum()
                   / jnp.maximum(n_fin, 1))
    csize = _greedy_clique_size(graphs.sample, inl_fin[None],
                                CLIQUE_STAT_STEPS)[0]
    return RansacRound(
        R=jnp.where(found, r_out, jnp.eye(3)),
        T=jnp.where(found, t_out, jnp.zeros(3)),
        inliers=inl_fin,
        n_unique=jnp.where(found, n_unique, 0).astype(jnp.int32),
        found=found,
        rms_residual=jnp.where(found, rms, 0.0).astype(jnp.float32),
        clique_size=jnp.where(found, csize, 0).astype(jnp.int32))


class ObjectDetections(NamedTuple):
    """Fixed-capacity multi-instance detections for one object."""

    R: jax.Array         # (I,3,3) object->camera
    T: jax.Array         # (I,3)
    n_inliers: jax.Array  # (I,) int32 unique-keypoint inlier counts
    accepted: jax.Array  # (I,) bool
    rms_residual: jax.Array  # (I,) f32 — RMS 3D residual (m) of the pose
                             # over its inliers (0 where not found)
    clique_size: jax.Array   # (I,) int32 — greedy inlier clique statistic
                             # (capped at CLIQUE_STAT_STEPS; 0 = n/a)


def detect_object_instances(key, matches: ObjectMatches,
                            graphs: AdjacencyGraphs,
                            cfg: RansacConfig,
                            seed: Optional[SeedPose] = None
                            ) -> ObjectDetections:
    """The reference's repeated-RANSAC multi-instance loop
    (GuessGenerator.cpp:192-231): run RANSAC, accept the pose if it has at
    least ``min_inliers`` unique query keypoints, invalidate those keypoints'
    matches, repeat — bounded at ``max_instances``.

    Deviation (documented): the reference breaks the loop at the first
    round with too few inliers — sound there because each round is a full
    adaptive search (up to 2500+ iterations, ransac.h:80-143). Our rounds
    carry a FIXED parallel hypothesis budget, so a failed round can be
    sampling noise while a later round (fresh Gumbel draws) finds a valid
    certified pose; since the lax.scan always executes ``max_instances``
    rounds anyway, a failed round here masks only itself instead of
    blocking the rest — strictly better recall at identical cost, and any
    accepted pose still holds the reference's acceptance contract
    (>= min_inliers unique keypoints + clique certificate).

    ``seed`` (optional :class:`SeedPose`): tracked-pose hypothesis entering
    EVERY round — if a junk draw steals round 1, the winner's keypoints
    are invalidated and the seed re-enters round 2 against a cleaner
    store; once the seed's own instance is found, its keypoints are
    invalidated too and later seed entries score ~0 (no duplicates)."""

    def make_step(round_cfg):
        def step(valid, key_i):
            round_ = ransac_round(key_i, matches, graphs, valid, round_cfg,
                                  seed)
            accept = round_.found & (round_.n_unique >= cfg.min_inliers)
            valid_next = jnp.where(
                accept,
                invalidate_query_indices(valid, graphs.sample,
                                         matches.query_idx, round_.inliers),
                valid)
            out = (round_.R, round_.T, round_.n_unique, accept,
                   round_.rms_residual, round_.clique_size)
            return valid_next, out

        return step

    keys = jax.random.split(key, cfg.max_instances)
    cont = cfg.continuation_hypotheses
    if cont and cont < cfg.n_hypotheses and cfg.max_instances > 1:
        # full budget for the first round, lean budget for continuations
        valid1, out1 = make_step(cfg)(graphs.valid, keys[0])
        cont_cfg = dataclasses.replace(cfg, n_hypotheses=cont)
        _, out_rest = jax.lax.scan(make_step(cont_cfg), valid1, keys[1:])
        rs, ts, counts, accepted, rms, csize = (
            jnp.concatenate([a[None], b])
            for a, b in zip(out1, out_rest))
    else:
        _, (rs, ts, counts, accepted, rms, csize) = jax.lax.scan(
            make_step(cfg), graphs.valid, keys)
    return ObjectDetections(R=rs, T=ts, n_inliers=counts, accepted=accepted,
                            rms_residual=rms, clique_size=csize)
