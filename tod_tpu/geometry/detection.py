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
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from tod_tpu.geometry.adjacency import ObjectMatches, fill_adjacency
from tod_tpu.geometry.ransac import (
    ObjectDetections,
    RansacConfig,
    SeedPose,
    detect_object_instances,
    presence_score,
)


@dataclasses.dataclass(frozen=True)
class GuessConfig:
    """Static shape/algorithm knobs for the frame-level pose search."""

    ransac: RansacConfig = RansacConfig()
    max_matches_per_object: int = 512   # M: per-object match capacity
    object_batch: int = 8               # objects vmapped per lax.map step
    # Pose search runs only on the top-N objects by within-radius match
    # count: geometry cost stays bounded as the DB grows (a frame physically
    # contains few objects; the reference iterates every matched object,
    # GuessGenerator.cpp:170, which does not scale past tens of models).
    max_active_objects: int = 16

    @property
    def sensor_error(self) -> float:
        return self.ransac.sensor_error


def cluster_matches(obj_idx: jax.Array, dist: jax.Array, valid: jax.Array,
                    train_pts: jax.Array, query_pts: jax.Array,
                    query_xy: jax.Array, object_ids: jax.Array,
                    max_matches: int) -> ObjectMatches:
    """Group flat (Q,k) matches into per-object fixed-capacity stores.

    ``obj_idx``/``dist``/``valid``: (Q,k); ``train_pts``: (Q,k,3);
    ``query_pts``: (Q,3) 3D points of the query keypoints (NaN = invalid —
    ClusterPerObject's NaN skip, adjacency_ransac.cpp:187-190);
    ``query_xy``: (Q,2); ``object_ids``: (A,) int32 model indices to cluster
    (pass ``jnp.arange(n_objects)`` for all). Returns ObjectMatches with
    leading dim A.

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
    # rank-major, distance-minor: the stride must exceed every valid distance
    # (Hamming tops out at 256 but the L2/SIFT path does not), so compute it
    # in-graph from the masked distances.
    stride = jnp.where(valid_flat, dist_flat, 0.0).max() + 1.0
    priority = rank_flat * stride + dist_flat

    # a tiny frame can have fewer flat matches than the per-object capacity;
    # select what exists and pad the store up to the static capacity
    cap = min(max_matches, qk)
    pad = max_matches - cap

    def one_object(o):
        mask = valid_flat & (obj_flat == o) & (o >= 0)
        score = jnp.where(mask, -priority, -jnp.inf)
        top, sel = jax.lax.top_k(score, cap)
        ok = jnp.isfinite(top)
        kp = kp_of_flat[sel]
        out = ObjectMatches(
            query_pts=jnp.where(ok[:, None], query_pts[kp], 0.0),
            train_pts=jnp.where(ok[:, None], t_flat[sel], 0.0),
            query_idx=jnp.where(ok, kp, -1),
            query_xy=jnp.where(ok[:, None], query_xy[kp], 0.0),
            valid=ok)
        if pad:
            out = ObjectMatches(
                query_pts=jnp.concatenate(
                    [out.query_pts, jnp.zeros((pad, 3))]),
                train_pts=jnp.concatenate(
                    [out.train_pts, jnp.zeros((pad, 3))]),
                query_idx=jnp.concatenate(
                    [out.query_idx, jnp.full(pad, -1, jnp.int32)]),
                query_xy=jnp.concatenate(
                    [out.query_xy, jnp.zeros((pad, 2))]),
                valid=jnp.concatenate([out.valid, jnp.zeros(pad, bool)]))
        return out

    return jax.vmap(one_object)(jnp.asarray(object_ids, jnp.int32))


def detect_objects(key: jax.Array, matches: ObjectMatches, spans: jax.Array,
                   cfg: GuessConfig,
                   seeds: Optional[SeedPose] = None) -> ObjectDetections:
    """Adjacency fill + multi-instance graph-RANSAC for every object.

    ``matches``: ObjectMatches stacked with leading dim O; ``spans``: (O,);
    ``seeds`` (optional): SeedPose stacked (O, ...) — each object's tracked
    last-accepted pose entering round 1 as one extra hypothesis.
    Returns ObjectDetections stacked (O, I, ...).
    """
    n_objects = spans.shape[0]
    keys = jax.random.split(key, n_objects)

    if seeds is None:
        def per_object(args):
            key_o, m, span = args
            graphs = fill_adjacency(m, span, cfg.sensor_error)
            return detect_object_instances(key_o, m, graphs, cfg.ransac)

        return jax.lax.map(per_object, (keys, matches, spans),
                           batch_size=min(cfg.object_batch,
                                          max(n_objects, 1)))

    def per_object_seeded(args):
        key_o, m, span, seed = args
        graphs = fill_adjacency(m, span, cfg.sensor_error)
        return detect_object_instances(key_o, m, graphs, cfg.ransac, seed)

    return jax.lax.map(per_object_seeded, (keys, matches, spans, seeds),
                       batch_size=min(cfg.object_batch, max(n_objects, 1)))


def detect_frame_from_matches(
        key: jax.Array, obj_idx: jax.Array, dist: jax.Array,
        valid: jax.Array, train_pts: jax.Array, query_pts: jax.Array,
        query_xy: jax.Array, spans: jax.Array,
        cfg: GuessConfig) -> Tuple[ObjectMatches, ObjectDetections]:
    """cluster + detect in one jittable call (GuessGenerator::process).

    Returns detections with leading dim O (all objects); objects outside the
    top ``max_active_objects`` by match count carry accepted=False rows.
    """
    n_objects = spans.shape[0]
    n_active = min(cfg.max_active_objects, n_objects)

    if n_active < n_objects:
        # per-object valid-match counts -> the active set
        q_finite = jnp.isfinite(query_pts).all(-1)
        v = valid & q_finite[:, None]
        counts = jnp.zeros(n_objects, jnp.int32).at[
            jnp.maximum(obj_idx, 0).reshape(-1)].add(
                v.reshape(-1).astype(jnp.int32))
        top_counts, active = jax.lax.top_k(counts, n_active)
        active = jnp.where(top_counts > 0, active, -1)
    else:
        active = jnp.arange(n_objects, dtype=jnp.int32)

    clustered = cluster_matches(obj_idx, dist, valid, train_pts, query_pts,
                                query_xy, active,
                                cfg.max_matches_per_object)
    act_spans = spans[jnp.maximum(active, 0)]
    det = detect_objects(key, clustered, act_spans, cfg)

    if n_active == n_objects:
        return clustered, det

    return clustered, scatter_detections(det, active, n_objects)


def scatter_detections(det: ObjectDetections, active: jax.Array,
                       n_objects: int) -> ObjectDetections:
    """Scatter active-object results back to the full object axis; inactive
    slots (-1) target an out-of-bounds row and are dropped (never clobber
    row 0)."""
    n_inst = det.R.shape[1]
    safe = jnp.where(active >= 0, active, n_objects)
    acc = det.accepted & (active >= 0)[:, None]
    return ObjectDetections(
        R=jnp.zeros((n_objects, n_inst, 3, 3)).at[safe].set(
            det.R, mode="drop"),
        T=jnp.zeros((n_objects, n_inst, 3)).at[safe].set(det.T, mode="drop"),
        n_inliers=jnp.zeros((n_objects, n_inst), jnp.int32).at[safe].set(
            jnp.where(acc, det.n_inliers, 0), mode="drop"),
        accepted=jnp.zeros((n_objects, n_inst), bool).at[safe].set(
            acc, mode="drop"),
        rms_residual=jnp.zeros((n_objects, n_inst)).at[safe].set(
            jnp.where(acc, det.rms_residual, 0.0), mode="drop"),
        clique_size=jnp.zeros((n_objects, n_inst), jnp.int32).at[safe].set(
            jnp.where(acc, det.clique_size, 0), mode="drop"),
    )


# ---------------------------------------------------------------------------
# Segmented (per-object matching) pipeline — the serving path.
#
# Measured rationale (tools/diag_segmented.py, diag_activation*.py): on
# weakly-distinctive textures, descriptor distance carries almost no
# object-presence information (absent objects collect as many within-radius
# matches as present ones), so the global-kNN + match-count activation of the
# reference contract loses most true matches and activates near-randomly.
# The serving path instead matches per object (every object gets its own
# best row per keypoint) and activates by TIER-1 GEOMETRY: a lean RANSAC
# presence score per object, with the full multi-instance certified RANSAC
# (tier 2) running only on the activated set.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ActivationConfig:
    """Tier-1 presence scoring knobs."""

    m_cap: int = 256          # matches per object entering tier-1
    n_hypotheses: int = 256   # lean RANSAC budget per object
    object_batch: int = 20    # objects vmapped per lax.map step
    min_score: int = 4        # below this an object is never activated
    # Pre-screen width P: tier-1 lean RANSAC runs only on the top-P objects
    # by the cheap margin-mass statistic (prescreen_scores) instead of all O.
    # Tier-1 is the only stage whose cost is linear in the catalog size
    # (lean RANSAC per object), so this bounds serving cost as the DB grows;
    # 0 = screen everything (tier-1 on all objects).
    prescreen: int = 0
    prescreen_top: int = 64   # margins summed per object by prescreen_scores
    # Tier-2 slots guaranteed to score-qualified NON-forced candidates when
    # ``force_active`` slots exist. Without it, ``max_active_objects``
    # latched (force_active) objects saturate the activation cut and a
    # newly-explored object can NEVER reach tier-2 no matter its tier-1
    # score — the measured obj021 latch miss at the 1000-object frontier
    # (tools/diag_explore021.py: activates 10/10 against an empty tracked
    # slab, displaced by the junk-latch-filled production slab). The
    # reserve keeps the slab width (and tier-2 cost) UNCHANGED: when
    # forced + reserved exceed the cut, the weakest-scored forced slots
    # yield (junk latches score lowest, so they yield first).
    active_reserve: int = 4


MARGIN_ALPHA = 0.75     # cap priority = dist - alpha * cross-object level
                        # (alpha sweep in tools/diag_margin2.py: +47% correct
                        # matches inside a 256 cap at 0.75)

ACTIVE_BOOST = 1e6      # additive activation boost for forced/reserved
                        # slots: above any tier-1 score (inlier counts,
                        # <= m_cap) while keeping the score as tie-break


def build_object_stores(dist: jax.Array, rows: jax.Array, q_valid: jax.Array,
                        query_pts: jax.Array, query_xy: jax.Array,
                        points: jax.Array, obj_start: jax.Array,
                        sel: jax.Array, m_cap: int, radius: float,
                        level: Optional[jax.Array] = None) -> ObjectMatches:
    """Per-object fixed-capacity stores from per-(query, object) matches.

    ``dist``/``rows``: (Q, O) per-object nearest distance / row-in-object;
    ``sel``: (A,) object indices (-1 = empty slot). Keeps the ``m_cap`` best
    within ``radius`` per object, prioritized by cross-object MARGIN rather
    than raw distance: a correct match is distinctive for ITS object, so
    dist[q,o] sits well below q's distance level across other objects, while
    junk sits at the level — raw distance cannot tell them apart (measured:
    junk median 29 vs correct 25, tools/diag_correct.py). One match per
    keypoint by construction, so rank-priority is unnecessary.

    ``level``: precomputed per-query cross-object median (pass it when
    calling per-object in a loop so the (Q, O) median isn't recomputed)."""
    q_n = dist.shape[0]
    cap = min(m_cap, q_n)
    pad = m_cap - cap
    if level is None:
        level = jnp.median(dist, axis=1)                       # (Q,)

    def one(o):
        o_safe = jnp.maximum(o, 0)
        d = dist[:, o_safe]
        pri = d - MARGIN_ALPHA * level
        ok = (d <= radius) & q_valid & (o >= 0)
        top, kp = jax.lax.top_k(jnp.where(ok, -pri, -jnp.inf), cap)
        got = jnp.isfinite(top)
        g_row = obj_start[o_safe] + rows[kp, o_safe]
        out = ObjectMatches(
            query_pts=jnp.where(got[:, None], query_pts[kp], 0.0),
            train_pts=jnp.where(got[:, None], points[g_row], 0.0),
            query_idx=jnp.where(got, kp, -1),
            query_xy=jnp.where(got[:, None], query_xy[kp], 0.0),
            valid=got)
        if pad:
            out = ObjectMatches(
                query_pts=jnp.concatenate(
                    [out.query_pts, jnp.zeros((pad, 3))]),
                train_pts=jnp.concatenate(
                    [out.train_pts, jnp.zeros((pad, 3))]),
                query_idx=jnp.concatenate(
                    [out.query_idx, jnp.full(pad, -1, jnp.int32)]),
                query_xy=jnp.concatenate(
                    [out.query_xy, jnp.zeros((pad, 2))]),
                valid=jnp.concatenate([out.valid, jnp.zeros(pad, bool)]))
        return out

    return jax.vmap(one)(jnp.asarray(sel, jnp.int32))


def prescreen_scores(dist: jax.Array, level: jax.Array, q_valid: jax.Array,
                     radius: float, top: int) -> jax.Array:
    """Cheap O(Q*O) per-object presence proxy: the summed magnitude of the
    ``top`` most-negative cross-object margins among in-radius matches.

    Raw in-radius match COUNT is near-anti-correlated with presence on
    weak-texture objects (a present plane ranked 94/100 by count,
    tools/diag_mixed.py) — descriptor crowding again. The margin
    m[q,o] = d[q,o] − alpha·median_o' d[q,o'] is the same cross-object
    signal that fixed store priority (build_object_stores): correct matches
    are distinctive for THEIR object, so present objects accumulate a heavy
    negative-margin tail while junk sits at the level. Summing only the
    ``top`` strongest margins keeps broad junk mass from outscoring a small
    distinctive cluster (tools/diag_prescreen.py ranks the candidates)."""
    m = dist - MARGIN_ALPHA * level[:, None]                   # (Q, O)
    inr = (dist <= radius) & q_valid[:, None]
    neg = jnp.where(inr, jnp.maximum(-m, 0.0), 0.0)            # (Q, O)
    k = min(top, neg.shape[0])
    best, _ = jax.lax.top_k(neg.T, k)                          # (O, k)
    return best.sum(-1)


def activation_cut(scores: jax.Array, force_active: Optional[jax.Array],
                   n_active: int, act: ActivationConfig) -> jax.Array:
    """The tier-2 activation cut: top ``n_active`` object indices by tier-1
    score (-1 = inactive), with forced (tracked) slots and the non-forced
    reserve.

    Forced slots are boosted ABOVE every unforced score but keep their own
    score as a tie-break, so when boosted slots exceed the cut the
    weakest-scored forced ones yield first (junk latches score lowest).
    ``act.active_reserve`` additionally boosts the top-R score-QUALIFIED
    unforced candidates: a full tracked slab can then never displace a
    fresh discovery from tier-2 (the measured obj021 frontier miss —
    tools/diag_explore021.py). Unforced boosts keep the ``min_score``
    floor: the reserve admits evidence, not junk."""
    n_objects = scores.shape[0]
    if force_active is None:
        cut = scores
    else:
        boost = force_active
        r = min(act.active_reserve, n_active)
        if r > 0:
            nf = jnp.where(force_active, -jnp.inf,
                           scores.astype(jnp.float32))
            _, top_nf = jax.lax.top_k(nf, r)
            qual = (jnp.zeros(n_objects, bool).at[top_nf].set(True)
                    & (scores >= act.min_score) & ~force_active)
            boost = force_active | qual
        cut = jnp.where(boost, scores + jnp.float32(ACTIVE_BOOST), scores)
    top_scores, active = jax.lax.top_k(cut, n_active)
    return jnp.where(top_scores >= act.min_score, active, -1)


def detect_frame_segmented(
        key: jax.Array, dist: jax.Array, rows: jax.Array,
        q_valid: jax.Array, query_pts: jax.Array, query_xy: jax.Array,
        points: jax.Array, obj_start: jax.Array, spans: jax.Array,
        cfg: GuessConfig, act: ActivationConfig,
        radius: float,
        force: Optional[jax.Array] = None, n_forced: int = 0,
        force_active: Optional[jax.Array] = None,
        seeds: Optional[SeedPose] = None
) -> Tuple[jax.Array, ObjectDetections]:
    """Tier-1 presence scoring on ALL objects + tier-2 certified multi-
    instance RANSAC on the activated set. Returns ``(scores (O,),
    ObjectDetections (O, I, ...))``.

    ``seeds`` (optional SeedPose stacked on THIS object axis (O, ...)):
    tracked last-accepted poses entering each active object's first RANSAC
    round as one extra hypothesis (temporal pose persistence — removes
    per-frame sampling variance once found; acceptance contract unchanged).

    ``force`` (optional bool (O,)): objects that bypass the tier-1
    prescreen ranking (reserved coarse->fine slab slots — see
    ``reserved_force_mask``). They still compete in tier-1 itself; only
    the cheap-statistic screen is waived. ``n_forced`` (static) EXPANDS
    the tier-1 set by the reserved-slot count so forced objects never
    displace coarse candidates from the top-P budget (displacement
    measurably cost recall: 400-object explore arm 0.917 vs 0.958);
    empty reserved slots return their expansion slots to the ranking.

    ``force_active`` (optional bool (O,)): objects that bypass the tier-1
    ACTIVATION CUT as well — they always enter tier-2, whose acceptance
    (inlier geometry) decides. For TRACKED slots only: a recently-accepted
    object's persistence should ride stable tier-2 evidence, not per-frame
    tier-1 sampling variance (the measured flicker source on weak
    textures). Exploration slots must NOT set this (junk would waste
    tier-2 budget every frame)."""
    n_objects = spans.shape[0]
    key_act, key_det = jax.random.split(key)

    # ---- tier 1: lean presence scores -------------------------------------
    level = jnp.median(dist, axis=1)   # hoisted: shared by every store build
    n_pre = (min(act.prescreen + (n_forced if force is not None else 0),
                 n_objects)
             if act.prescreen > 0 else n_objects)
    if n_pre < n_objects:
        pre = prescreen_scores(dist, level, q_valid, radius,
                               act.prescreen_top)
        if force is not None:
            pre = jnp.where(force, jnp.inf, pre)
        _, pre_ids = jax.lax.top_k(pre, n_pre)
        pre_ids = pre_ids.astype(jnp.int32)
    else:
        pre_ids = jnp.arange(n_objects, dtype=jnp.int32)
    keys1 = jax.random.split(key_act, n_pre)

    def tier1(args):
        key_o, o = args
        m = build_object_stores(dist, rows, q_valid, query_pts, query_xy,
                                points, obj_start, o[None], act.m_cap,
                                radius, level)
        m = jax.tree.map(lambda x: x[0], m)
        graphs = fill_adjacency(m, spans[o], cfg.sensor_error)
        return presence_score(key_o, m, graphs, act.n_hypotheses,
                              cfg.sensor_error)

    scores = jax.lax.map(tier1, (keys1, pre_ids),
                         batch_size=min(act.object_batch, max(n_pre, 1)))
    if n_pre < n_objects:
        # un-screened objects carry score 0 (< min_score): never activated
        scores = jnp.zeros(n_objects, scores.dtype).at[pre_ids].set(scores)

    # ---- tier 2: full certified RANSAC on the activated set ----------------
    n_active = min(cfg.max_active_objects, n_objects)
    active = activation_cut(scores, force_active, n_active, act)

    stores = build_object_stores(dist, rows, q_valid, query_pts, query_xy,
                                 points, obj_start, active,
                                 cfg.max_matches_per_object, radius, level)
    act_spans = spans[jnp.maximum(active, 0)]
    act_seeds = None
    if seeds is not None:
        a_safe = jnp.maximum(active, 0)
        act_seeds = SeedPose(R=seeds.R[a_safe], T=seeds.T[a_safe],
                             ok=seeds.ok[a_safe] & (active >= 0))
    det = detect_objects(key_det, stores, act_spans, cfg, act_seeds)
    det = det._replace(accepted=det.accepted & (active >= 0)[:, None])
    # active is a permutation/subset of object ids (with -1 holes);
    # scatter handles both the subset and the full-permutation case
    return scores, scatter_detections(det, active, n_objects)


# ---------------------------------------------------------------------------
# Coarse->fine serving mode: screen the catalog on a stride-subsampled
# coarse sweep, then run the exact segmented match + two-tier geometry on
# only the selected objects (ops/pallas/segmented.py object_top1_gathered).
# Serving cost becomes linear in the FINE WIDTH instead of the catalog size.
# ---------------------------------------------------------------------------


def coarse_select(dist_c: jax.Array, q_valid: jax.Array, radius: float,
                  slack: float, width: int, top: int) -> jax.Array:
    """Object pre-selection from a coarse (stride-subsampled) sweep's
    (Q, O) distances: top ``width`` objects by the prescreen margin-mass
    statistic. Coarse top-1 distances are biased upward (the correct row
    may not be in the subsample), so the in-radius cut runs at
    ``radius + slack``."""
    level = jnp.median(dist_c, axis=1)
    pre = prescreen_scores(dist_c, level, q_valid, radius + slack, top)
    w = min(width, dist_c.shape[1])
    _, sel = jax.lax.top_k(pre, w)
    return sel.astype(jnp.int32)


AGE_NEVER = 1 << 20   # "never detected" init; update_age saturates here


def tracked_from_age(age: jax.Array, width: int, ttl: int,
                     needy: Optional[jax.Array] = None) -> jax.Array:
    """The ``width`` tracked object indices (-1 = empty slot).

    ``age[o]`` = frames since object ``o`` was last accepted (update_age);
    objects with ``age > ttl`` are not tracked. Temporal slab persistence
    for coarse->fine serving: a weak-texture object, once found, keeps a
    reserved fine-slab slot for ``ttl`` frames of misses instead of
    re-competing through the coarse statistic every frame.

    ``needy`` (bool (O,), optional): objects the coarse screen did NOT
    select last frame. They take PRIORITY over recency: a strong object
    the coarse statistic ranks anyway wastes its tracked slot (the
    merge just holes out the duplicate), and under capacity pressure the
    index tie-break evicted exactly the weak find the latch exists for
    (three age-0 objects, width 2: the two coarse-ranked boxes evicted
    the just-discovered plane)."""
    n = age.shape[0]
    w = min(width, n)
    a = jnp.minimum(age, ttl + 1)
    recency = (ttl + 1 - a).astype(jnp.int32)          # ttl+1 .. 0
    score = recency
    if needy is not None:
        score = recency + needy.astype(jnp.int32) * (ttl + 2)
    score = jnp.where(age <= ttl, score, -1)
    s, ids = jax.lax.top_k(score, w)
    return jnp.where(s >= 0, ids.astype(jnp.int32), -1)


def merge_tracked(sel_main: jax.Array, tracked: jax.Array) -> jax.Array:
    """Concatenate the coarse selection with tracked slots, holing out
    duplicates (a tracked object already selected coarse costs nothing —
    the gathered kernel skips -1 slots; detect_frame_gathered's scatter
    requires unique non-negative ids)."""
    dup = (tracked[:, None] == sel_main[None, :]).any(axis=1)
    return jnp.concatenate(
        [sel_main, jnp.where(dup | (tracked < 0), -1, tracked)])


def reserved_force_mask(sel: jax.Array, *reserved) -> jax.Array:
    """Boolean mask over slab slots whose object arrived via a RESERVED id
    list (tracked / exploration slots). These bypass the tier-1 prescreen
    ranking INSIDE the slab: the margin-mass statistic that excluded a
    weak-texture object from the coarse screen would otherwise exclude it
    again in tier-1, silently voiding exploration's bounded-latency
    contract (any present object reaches tier-1 within ceil(O/E) frames)
    and tracking's latch. Membership-based, not positional, so a reserved
    object that ``merge_tracked`` deduplicated into its coarse slot stays
    forced. ``None`` entries in ``reserved`` are skipped; -1 holes in both
    ``sel`` and the id lists never match."""
    ids = jnp.concatenate([jnp.where(r >= 0, r, -2)
                           for r in reserved if r is not None])
    return (sel[:, None] == ids[None, :]).any(axis=1)


def update_age(age: jax.Array, det: ObjectDetections,
               min_confidence: float = 0.0) -> jax.Array:
    """Advance the per-object frames-since-detected counter by one frame:
    0 where ``det`` accepted an instance, +1 (saturating) elsewhere.

    ``min_confidence`` gates the LATCH (not acceptance): only instances
    with at least that many unique inliers refresh the age. With the
    serving default of 0 every accepted pose latches — including the
    ~8-16-inlier junk accepts the ungated reference contract emits
    (bench precision 0.087 ungated), which fill the tracked slab and
    feed the force_active cut. A latch gate keeps tracked slots for
    confident finds; ``track_min_confidence`` in the detector config."""
    acc = det.accepted
    if min_confidence > 0:
        acc = acc & (det.n_inliers >= min_confidence)
    acc = acc.any(axis=1)
    return jnp.where(acc, 0, jnp.minimum(age, AGE_NEVER) + 1)


def tracked_needy(age: jax.Array, last_coarse_sel: jax.Array, width: int,
                  ttl: int) -> jax.Array:
    """:func:`tracked_from_age` with neediness from the PREVIOUS frame's
    coarse selection: objects the coarse screen already ranks in don't need
    a reserved slot (the merge holes out the duplicate), so under capacity
    pressure the slots go to the weak finds the latch exists for. Shared by
    the single-device and sharded streaming drivers (their per-stream
    results must stay bitwise-identical)."""
    safe = jnp.where(last_coarse_sel >= 0, last_coarse_sel, age.shape[0])
    needy = jnp.ones(age.shape[0], bool).at[safe].set(False, mode="drop")
    return tracked_from_age(age, width, ttl, needy)


def seeds_from_state(age: jax.Array, last_r: jax.Array, last_t: jax.Array,
                     ttl: int) -> SeedPose:
    """Tracked-pose seeds on the full object axis: an object detected
    within the last ``ttl`` frames re-enters tier-2 with its last ACCEPTED
    pose as one extra hypothesis (SeedPose semantics, geometry/ransac.py).
    Not limited to the tracked-slot width — any slab object with a live
    latch benefits. Shared by both streaming drivers."""
    return SeedPose(R=last_r, T=last_t, ok=age <= ttl)


def fold_best_pose(last_r: jax.Array, last_t: jax.Array,
                   det: ObjectDetections
                   ) -> Tuple[jax.Array, jax.Array]:
    """Fold one frame's detections into the last-accepted-pose state: per
    object, the accepted instance with the most inliers (unchanged where
    nothing was accepted). Shared by both streaming drivers (tracked-pose
    seeding state)."""
    score = jnp.where(det.accepted, det.n_inliers, -1)
    best = jnp.argmax(score, axis=1)
    o = jnp.arange(last_r.shape[0])
    acc = det.accepted.any(axis=1)
    return (jnp.where(acc[:, None, None], det.R[o, best], last_r),
            jnp.where(acc[:, None], det.T[o, best], last_t))


def detect_frame_gathered(
        key: jax.Array, dist: jax.Array, rows: jax.Array, sel: jax.Array,
        q_valid: jax.Array, query_pts: jax.Array, query_xy: jax.Array,
        points: jax.Array, obj_start: jax.Array, spans: jax.Array,
        cfg: GuessConfig, act: ActivationConfig, radius: float,
        force: Optional[jax.Array] = None, n_forced: int = 0,
        force_active: Optional[jax.Array] = None,
        seeds: Optional[SeedPose] = None
) -> Tuple[jax.Array, ObjectDetections]:
    """detect_frame_segmented over a gathered (Q, C) match slab whose
    columns are the objects ``sel`` (-1 = empty slot; their distances are
    HOLE_DIST, never within radius). Results are scattered back to the full
    object axis. ``force`` (bool (C,), optional) marks reserved slots that
    bypass the in-slab tier-1 prescreen; ``n_forced`` (static, the
    reserved-slot count) expands the tier-1 set so they never displace
    coarse candidates (``reserved_force_mask``); ``force_active`` (bool
    (C,), optional, TRACKED slots only) additionally bypasses the
    activation cut so latched objects ride tier-2 evidence; ``seeds``
    (optional SeedPose on the FULL object axis (O, ...)) threads tracked
    last-accepted poses into tier-2 (gathered to the slab here).
    Returns ``(scores (O,), ObjectDetections (O, I, ...))``."""
    n_objects = spans.shape[0]
    sel_safe = jnp.maximum(sel, 0)
    slab_seeds = None
    if seeds is not None:
        slab_seeds = SeedPose(R=seeds.R[sel_safe], T=seeds.T[sel_safe],
                              ok=seeds.ok[sel_safe] & (sel >= 0))
    scores_c, det_c = detect_frame_segmented(
        key, dist, rows, q_valid, query_pts, query_xy, points,
        obj_start[sel_safe], spans[sel_safe], cfg, act, radius, force,
        n_forced, force_active, slab_seeds)
    # drop-scatter so an empty slot can never clobber object 0's score
    safe = jnp.where(sel >= 0, sel, n_objects)
    scores = jnp.zeros(n_objects, scores_c.dtype).at[safe].set(
        scores_c, mode="drop")
    return scores, scatter_detections(det_c, sel, n_objects)
