"""FusedDetector: the whole detection forward pass as ONE jitted function.

This is the production/serving form of the detection pipeline — where the
reference schedules five ecto cells per frame (detector.py:64-110), the TPU
framework traces feature extraction, DB matching, clustering, adjacency and
multi-instance RANSAC into a single XLA program: no host round-trips between
stages, everything fused and static-shaped. The cell graph (TodDetector) and
this fused model share the exact same ops/geometry code, so their results
agree; the fused form is what bench.py and __graft_entry__ run.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tod_tpu.cells.types import PoseResult
from tod_tpu.db.models import TodModel
from tod_tpu.geometry.detection import (AGE_NEVER, ActivationConfig,
                                        GuessConfig, coarse_select,
                                        detect_frame_from_matches,
                                        detect_frame_gathered,
                                        detect_frame_segmented,
                                        fold_best_pose, merge_tracked,
                                        reserved_force_mask,
                                        seeds_from_state, tracked_from_age,
                                        tracked_needy, update_age)
from tod_tpu.geometry.ransac import (ObjectDetections, RansacConfig,
                                     SeedPose)
from tod_tpu.ops.depth import depth_to_3d_sparse, to_metric_depth
from tod_tpu.ops.image import rgb_to_gray
from tod_tpu.ops.matching import hamming_topk, pad_db
from tod_tpu.ops.orb import Keypoints, orb_detect_and_compute
from tod_tpu.ops.pallas.segmented import (SegmentedDb, max_chunks_per_object,
                                          object_top1, object_top1_gathered,
                                          pack_segmented, subsample_models)


@dataclasses.dataclass(frozen=True)
class FusedDetectorConfig:
    """Operating point. Defaults follow conf/detection.ork:26-42.

    ``pipeline`` selects the serving architecture:
      * ``"global"`` — the reference's matching contract: one global
        kNN(k)+radius search over all models, match-count activation
        (DescriptorMatcher.cpp:211-220 semantics on exact distances);
      * ``"segmented"`` — the TPU-native serving path: per-(query, object)
        nearest-row matching (ops/pallas/segmented.py), tier-1 geometric
        presence activation, tier-2 certified RANSAC (measured to keep 3-5x
        more correct matches per present object on weakly-distinctive
        textures, tools/diag_hypotheses.py).
    """

    n_features: int = 5000
    n_levels: int = 3
    scale_factor: float = 1.2
    fast_threshold: float = 20.0
    feature: str = "ORB"        # "ORB" (binary/Hamming) | "SIFT" (float/L2,
                                # served int8-quantized through the
                                # segmented pipeline — the detection.ros.ork
                                # SIFT path; requires pipeline="segmented",
                                # the cell graph covers global-kNN SIFT)
    subpixel: bool = False      # sub-pixel keypoint coords; only useful when
                                # the MODELS were also trained with subpixel
                                # (feature param, cells/trainer.py)
    k_matches: int = 5          # knnMatch k (DescriptorMatcher.cpp:211)
    radius: float = 35.0        # Hamming radius cut (conf/detection.ork:38)
    db_chunk: int = 16384
    matcher: str = "auto"       # "pallas" (fused kernel) | "xla" | "auto"
    guess: GuessConfig = GuessConfig(
        ransac=RansacConfig(n_hypotheses=1024, min_inliers=8,
                            sensor_error=0.01))
    pipeline: str = "global"    # "global" | "segmented"
    q_cap: int = 2048           # segmented: matched-keypoint budget (queries
                                # prioritized by valid 3D + response)
    bucket_grid: Optional[Tuple[int, int]] = None
                                # segmented: spatially-bucketed q_cap
                                # compaction — split the frame into
                                # (rows, cols) cells and keep corners
                                # round-robin by within-cell response rank,
                                # so corner-rich clutter (textured
                                # occluders) cannot starve scene objects
                                # of the query budget. None = plain global
                                # response ranking (the reference's cv2
                                # retainBest semantics, orb.cpp).
    activation: ActivationConfig = ActivationConfig()
    # Coarse->fine matching (segmented pipeline only): when ``coarse_stride``
    # > 0, a stride-subsampled companion DB is swept first (1/stride the
    # rows), the catalog is screened to the top ``fine_width`` objects by
    # the prescreen margin statistic, and the exact segmented match runs on
    # only those objects' rows (ops/pallas/segmented.py
    # object_top1_gathered). Match cost becomes
    # O(rows/stride + fine_width * rows/object) instead of O(rows) — the
    # single-chip lever for large catalogs (the full sweep is 68ms at 12.9M
    # rows). 0 = off (full exact sweep; the default and the bench
    # operating point at 100 objects).
    coarse_stride: int = 0
    fine_width: int = 128
    # Coarse-pass QUERY subsampling: the coarse sweep only RANKS objects
    # (prescreen margin mass over the slab selection), which does not need
    # every compacted query — the profile shows the coarse stage near the
    # matcher roofline (~5 ms of 2048 x 1M pairs at the 1000-object
    # frontier), so halving its queries buys real frame time. Selected
    # objects' fine columns stay bitwise-exact (the fine pass always uses
    # ALL queries). Use powers of two so the subsampled query count stays
    # a multiple of the kernel tile (q_cap pads to 512s). 1 = off.
    coarse_q_stride: int = 1
    # Temporal slab persistence (coarse->fine streaming only): reserve
    # ``track_width`` of the fine_width slots for the most-recently-
    # detected objects (kept for ``track_ttl`` frames past their last
    # acceptance), merged-deduped with the coarse top-(fine_width -
    # track_width). A weak-texture object, once found, stays in the exact
    # fine pass instead of re-competing through the coarse statistic every
    # frame of a 30 Hz loop — selection changes, per-object results stay
    # bitwise-exact. Tracked slots are forced through the in-slab tier-1
    # prescreen AND the activation cut (reserved_force_mask/force_active):
    # a latched object always reaches tier-2, whose inlier evidence — not
    # per-frame tier-1 sampling variance — decides whether the latch
    # persists. 0 = off (pure coarse ranking; the default). State
    # lives in the FusedDetector (per-object age vector); detect_batch_raw
    # and the sharded serving step ignore it (stateless programs).
    track_width: int = 0
    track_ttl: int = 2
    # Latch gate: only accepted instances with at least this many unique
    # inliers refresh the tracked age / seed state (update_age). 0 = every
    # accepted pose latches — which at the ungated reference contract
    # includes the ~8-16-inlier junk accepts (bench precision 0.087), so
    # the tracked slab fills with junk whose force_active slots saturated
    # the activation cut (the obj021 frontier miss) and feed the measured
    # 400-object soak flicker. Acceptance/reporting is unchanged; this
    # only decides what the temporal machinery holds on to. Default 16:
    # below every measured weak-texture TRUE accept (obj021 26-28, obj006
    # 22-27 unique inliers) and above the junk-secondary band (8-10,
    # tools/diag_explore021.py conf rows).
    track_min_confidence: float = 16.0
    # Exploration slots (coarse->fine streaming only): reserve
    # ``explore_width`` fine-slab slots that cycle deterministically through
    # the catalog — frame t fine-matches objects (t*E + i) mod O besides the
    # coarse selection — so ANY present object, however badly the coarse
    # statistic ranks its texture, reaches the exact fine pass within
    # ceil(O / E) frames. Pair with ``track_width``: once discovered, the
    # object latches into a reserved tracked slot. This converts the
    # catalog-relative screen exclusion (a weak texture whose margin-mass
    # rank falls outside fine_width at large catalogs, PROGRESS.md) from a
    # PERMANENT miss into a bounded-latency one, at the cost of E slab
    # slots. Reserved (tracked + explored) slots also BYPASS the in-slab
    # tier-1 prescreen (reserved_force_mask): the same margin-mass
    # statistic that coarse-excluded the object would otherwise screen it
    # out again inside the slab. The tier-1 set EXPANDS by the reserved
    # count (prescreen + track_width + explore_width objects scored), so
    # forced slots never displace coarse candidates from the top-P budget.
    # Stateful/streaming-only like track_width: detect_batch_raw and
    # the sharded serving step ignore it. 0 = off (the default).
    explore_width: int = 0
    # Hot catalog updates (segmented pipeline): pad the catalog to
    # ``catalog_capacity`` object slots (empty models) and reserve
    # ``reserve_rows`` poisoned rows per slot at pack time. With both set,
    # update_models() re-packs within the SAME array shapes, so every
    # compiled program is reused — an object swap costs one upload, not a
    # recompile. 0 = pack exactly (update_models still works; a shape
    # change just recompiles on next dispatch).
    catalog_capacity: int = 0
    reserve_rows: int = 0
    coarse_slack: Optional[float] = None
                                # coarse in-radius cut at radius + slack:
                                # subsampled top-1 distances are biased up.
                                # None = feature default (16 Hamming units
                                # for ORB, 0.15 L2 units for SIFT)
    min_confidence: float = 0.0
                                # serving-side acceptance gate: drop poses
                                # whose inlier count is below this AFTER
                                # detection (the RANSAC min_inliers contract
                                # is unchanged). The bench's confidence-gate
                                # curve shows conf>=24 reaches ~0.96
                                # precision at unchanged-to--0.04 recall;
                                # 0 = report everything (reference parity).
    min_quality: float = 0.0
                                # serving-side gate on the FUSED confidence
                                # (confidence_v2: inliers + 16*clique).
                                # Measured: >= ~156 reaches recall 1.000 /
                                # precision 1.000 on the bench workload
                                # where the inlier gate peaks at
                                # 0.958/0.920. 0 = off.

    def use_pallas(self) -> bool:
        if self.matcher == "auto":
            return jax.default_backend() != "cpu"
        return self.matcher == "pallas"

    @property
    def resolved_coarse_slack(self) -> float:
        """coarse_slack in the feature's distance units (None = default)."""
        if self.coarse_slack is not None:
            return self.coarse_slack
        return 0.15 if self.feature == "SIFT" else 16.0


class ModelDb(NamedTuple):
    """Device-resident packed model database (sharding-friendly pytree)."""

    descriptors: jax.Array   # (N_pad, 32) uint8
    bits_t: jax.Array        # (256, N_pad) int8 — fused-kernel operand
    popcounts: jax.Array     # (1, N_pad) int32
    points: jax.Array        # (N_pad, 3) float32
    obj_of_row: jax.Array    # (N_pad,) int32 (-1 for padding)
    n_valid: jax.Array       # () int32
    spans: jax.Array         # (O,) float32


def pack_models(models: Sequence[TodModel], chunk: int) -> Tuple[ModelDb, List[str]]:
    from tod_tpu.ops.pallas.hamming import pack_db_bits

    if models:
        desc = np.concatenate([m.descriptors for m in models])
        pts = np.concatenate([m.points for m in models]).astype(np.float32)
        obj = np.concatenate([np.full(m.n_points, i, np.int32)
                              for i, m in enumerate(models)])
        spans = np.asarray([m.span for m in models], np.float32)
    else:
        desc = np.zeros((0, 32), np.uint8)
        pts = np.zeros((0, 3), np.float32)
        obj = np.zeros(0, np.int32)
        spans = np.zeros(0, np.float32)
    padded, n = pad_db(desc, chunk)
    n_pad = len(padded) - n
    if len(padded):
        bits_t, pop = pack_db_bits(jnp.asarray(padded), jnp.int8)
    else:
        bits_t = jnp.zeros((256, 0), jnp.int8)
        pop = jnp.zeros((1, 0), jnp.int32)
    db = ModelDb(
        descriptors=jnp.asarray(padded),
        bits_t=bits_t,
        popcounts=pop,
        points=jnp.asarray(np.concatenate([pts, np.zeros((n_pad, 3),
                                                         np.float32)])),
        obj_of_row=jnp.asarray(np.concatenate([obj, np.full(n_pad, -1,
                                                            np.int32)])),
        n_valid=jnp.asarray(n, jnp.int32),
        spans=jnp.asarray(spans))
    return db, [m.object_id for m in models]


def match_against_db(desc: jax.Array, db: ModelDb,
                     cfg: FusedDetectorConfig) -> Tuple[jax.Array, jax.Array]:
    """Top-k matching via the fused Pallas kernel (TPU) or the XLA
    streaming matcher (CPU/tests). Both are exact."""
    n_rows = db.descriptors.shape[0]
    if n_rows == 0:
        # empty DB: all-invalid matches (mirrors DescriptorMatcher.process)
        q = desc.shape[0]
        return (jnp.full((q, cfg.k_matches), 1e9, jnp.float32),
                jnp.full((q, cfg.k_matches), -1, jnp.int32))
    if cfg.use_pallas():
        from tod_tpu.ops.pallas.hamming import (DB_CHUNK, Q_TILE,
                                                hamming_topk_fused)

        # largest kernel chunk that divides the (padded) DB row count; tiny
        # DBs that fit no chunk fall back to the XLA matcher
        db_chunk = next((c for c in (DB_CHUNK, 4096, 2048, 1024, 512, 256)
                         if n_rows % c == 0), None)
        if db_chunk is not None:
            q = desc.shape[0]
            pad = (-q) % Q_TILE
            if pad:
                desc = jnp.concatenate(
                    [desc, jnp.zeros((pad, 32), jnp.uint8)])
            dist, rows = hamming_topk_fused(desc, db.bits_t, db.popcounts,
                                            db.n_valid, k=cfg.k_matches,
                                            radius=cfg.radius,
                                            db_chunk=db_chunk)
            return dist[:q], rows[:q]
    return hamming_topk(desc, db.descriptors, db.n_valid,
                        k=cfg.k_matches, chunk=min(cfg.db_chunk, n_rows))


def detect_frame(key: jax.Array, gray: jax.Array, depth: jax.Array,
                 K: jax.Array, db: ModelDb,
                 cfg: FusedDetectorConfig) -> Tuple[Keypoints, ObjectDetections]:
    """The fused forward pass: RGB-D frame + model DB -> poses."""
    kps, desc = orb_detect_and_compute(
        gray, n_features=cfg.n_features, n_levels=cfg.n_levels,
        scale_factor=cfg.scale_factor, fast_threshold=cfg.fast_threshold,
        subpixel=cfg.subpixel)

    dist, rows = match_against_db(desc, db, cfg)
    m_valid = (rows >= 0) & (dist <= cfg.radius) & kps.valid[:, None]
    safe_rows = jnp.maximum(rows, 0)
    obj_idx = jnp.where(m_valid, db.obj_of_row[safe_rows], -1)
    train_pts = db.points[safe_rows]

    depth_m = to_metric_depth(depth)
    query_pts = depth_to_3d_sparse(depth_m, K, kps.xy)
    query_pts = jnp.where(kps.valid[:, None], query_pts, jnp.nan)

    _, detections = detect_frame_from_matches(
        key, obj_idx, dist, m_valid, train_pts, query_pts, kps.xy,
        db.spans, cfg.guess)
    return kps, detections


CLIQUE_WEIGHT = 16.0    # measured on CONF2_ROWS.json (tools/diag_conf2.py
                        # grid): w=16 maximizes the true/junk margin —
                        # weakest true accept 167 vs strongest junk 145,
                        # per-scene margins all positive (22-160)


def confidence_v2(n_inliers: float, rms_residual: float, clique_size: int,
                  sensor_error: float) -> float:
    """Fused serving confidence: inlier count + weighted inlier-clique
    depth.

    The inlier count alone is one-dimensional — at the shipped gate 24 the
    bench measures 0.958 recall / 0.920 precision because a minority of
    junk accepts reach 24-46 grown inliers. Junk poses are
    refinement-grown sub-minimal draws whose mutual-consistency clique
    stays shallow (measured max 8 over 262 junk accepts,
    CONF2_ROWS.json) while true poses grow 9-16 cliques — the clique
    statistic is the separator the inlier count lacks. The RMS residual
    also separates in aggregate (junk p50 9.4 mm vs true 2.4 mm) but the
    WEAKEST true accepts carry 9-12 mm residuals, so a residual penalty
    would erode exactly the weak-texture margin the gate must keep; it is
    reported on PoseResult for users but deliberately not fused.
    Measured operating point: quality >= ~156 (the true/junk midpoint)
    reaches recall 1.000 / precision 1.000 on the bench workload where
    the v1 inlier gate peaks at 0.958/0.920. Host-side on purpose: the
    constants are tunable without recompiling."""
    del rms_residual, sensor_error  # reported, not fused (see docstring)
    return float(n_inliers) + CLIQUE_WEIGHT * float(clique_size)


def _empty_detections(n_objects: int, cfg: FusedDetectorConfig) -> ObjectDetections:
    """All-empty detections for degenerate inputs (e.g. an empty model DB)."""
    n_inst = cfg.guess.ransac.max_instances
    return ObjectDetections(
        R=jnp.zeros((n_objects, n_inst, 3, 3)),
        T=jnp.zeros((n_objects, n_inst, 3)),
        n_inliers=jnp.zeros((n_objects, n_inst), jnp.int32),
        accepted=jnp.zeros((n_objects, n_inst), bool),
        rms_residual=jnp.zeros((n_objects, n_inst)),
        clique_size=jnp.zeros((n_objects, n_inst), jnp.int32))


@functools.lru_cache(maxsize=4)
def _jitted_detect(cfg: FusedDetectorConfig):
    return jax.jit(functools.partial(detect_frame, cfg=cfg))


# ---------------------------------------------------------------------------
# Staged execution: three chained XLA programs.
#
# Empirically, fusing the whole frame into ONE program halves the matcher's
# throughput (XLA's scheduling around the Pallas custom-call loses the
# kernel's pipelining when ORB intermediates share the program). Three
# chained async dispatches cost microseconds and keep every stage at its
# standalone speed (measured: 76ms fused vs 36ms chained for orb+match).
# ---------------------------------------------------------------------------


def _stage_features(gray, depth, K, cfg: FusedDetectorConfig):
    kps, desc = orb_detect_and_compute(
        gray, n_features=cfg.n_features, n_levels=cfg.n_levels,
        scale_factor=cfg.scale_factor, fast_threshold=cfg.fast_threshold,
        subpixel=cfg.subpixel)
    depth_m = to_metric_depth(depth)
    query_pts = depth_to_3d_sparse(depth_m, K, kps.xy)
    query_pts = jnp.where(kps.valid[:, None], query_pts, jnp.nan)
    return kps, desc, query_pts


class GeomDb(NamedTuple):
    """The geometry stage's slice of the model DB (separable from the
    matcher operands so pipeline parallelism can place it on its own
    device, parallel/pipeline.py)."""

    points: jax.Array       # (N_pad, 3)
    obj_of_row: jax.Array   # (N_pad,)
    spans: jax.Array        # (O,)


def _stage_geometry(key, kps_xy, kps_valid, dist, rows, query_pts,
                    geom: GeomDb, cfg: FusedDetectorConfig):
    m_valid = (rows >= 0) & (dist <= cfg.radius) & kps_valid[:, None]
    safe_rows = jnp.maximum(rows, 0)
    obj_idx = jnp.where(m_valid, geom.obj_of_row[safe_rows], -1)
    train_pts = geom.points[safe_rows]
    _, detections = detect_frame_from_matches(
        key, obj_idx, dist, m_valid, train_pts, query_pts, kps_xy,
        geom.spans, cfg.guess)
    return detections


def geom_db(db: ModelDb) -> GeomDb:
    return GeomDb(points=db.points, obj_of_row=db.obj_of_row, spans=db.spans)


# ---------------------------------------------------------------------------
# Segmented serving path (pipeline="segmented"): per-object matching +
# two-tier geometry. See FusedDetectorConfig docstring and
# geometry/detection.py detect_frame_segmented.
# ---------------------------------------------------------------------------


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def bucketed_scores(xy, response, finite, hw, grid):
    """Spatially-bucketed compaction scores: order corners by within-cell
    response rank first (cell round-robin), response second. Every cell's
    best corners survive a top-k cut before ANY cell's (r+1)-th, so
    localized corner-rich clutter (textured occluders) cannot monopolize
    the query budget. Returns per-keypoint selection scores whose
    descending order is (rank asc, response desc); non-finite keypoints
    get -inf."""
    gh, gw = grid
    h, w = hw
    cy = jnp.clip((xy[:, 1] * gh) // h, 0, gh - 1)
    cx = jnp.clip((xy[:, 0] * gw) // w, 0, gw - 1)
    cell = (cy * gw + cx).astype(jnp.int32)
    base = jnp.where(finite, response, -jnp.inf)
    order = jnp.lexsort((-base, cell))        # cell asc, response desc
    n = base.shape[0]
    pos = jnp.arange(n)
    sc = cell[order]
    is_start = jnp.concatenate([jnp.ones(1, bool), sc[1:] != sc[:-1]])
    seg_start = jax.lax.cummax(jnp.where(is_start, pos, 0))
    rank = jnp.zeros(n, jnp.int32).at[order].set(
        (pos - seg_start).astype(jnp.int32))
    resp01 = jnp.clip(
        response / (jnp.max(jnp.where(finite, response, 0.0)) + 1e-9),
        0.0, 1.0)
    return jnp.where(finite, resp01 - rank.astype(jnp.float32), -jnp.inf)


def _stage_features_compact(gray, depth, K, cfg: FusedDetectorConfig):
    """Features + 3D + query compaction: keep the ``q_cap`` highest-response
    keypoints that have valid 3D (matching cost scales with queries, and
    matches without 3D are discarded by the geometry anyway —
    ClusterPerObject's NaN skip, adjacency_ransac.cpp:187-190)."""
    if cfg.feature == "SIFT":
        from tod_tpu.ops.pallas.segmented_l2 import quantize_descriptors
        from tod_tpu.ops.sift import sift_detect_and_compute

        kps, desc = sift_detect_and_compute(
            gray, n_features=cfg.n_features, n_levels=cfg.n_levels,
            scale_factor=cfg.scale_factor,
            fast_threshold=cfg.fast_threshold)
        desc = quantize_descriptors(desc)
    else:
        kps, desc = orb_detect_and_compute(
            gray, n_features=cfg.n_features, n_levels=cfg.n_levels,
            scale_factor=cfg.scale_factor, fast_threshold=cfg.fast_threshold,
            subpixel=cfg.subpixel)
    depth_m = to_metric_depth(depth)
    query_pts = depth_to_3d_sparse(depth_m, K, kps.xy)
    finite = jnp.isfinite(query_pts).all(-1) & kps.valid

    k = min(cfg.q_cap, cfg.n_features)
    score = jnp.where(finite, kps.response, -jnp.inf)
    if cfg.bucket_grid is not None:
        score = bucketed_scores(kps.xy, kps.response, finite, gray.shape,
                                cfg.bucket_grid)
    _, sel = jax.lax.top_k(score, k)
    ok = finite[sel]
    pad = _round_up(k, 512) - k

    def padded(x, fill=0):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]) if pad else x

    xy = padded(kps.xy[sel])
    qp = padded(jnp.where(ok[:, None], query_pts[sel], jnp.nan), jnp.nan)
    dsc = padded(jnp.where(ok[:, None], desc[sel],
                           jnp.zeros((), desc.dtype)))
    okp = padded(ok)
    return xy, qp, dsc, okp


def _stage_geometry_segmented(key, xy, qp, ok, dist_qo, rows_qo,
                              points, obj_start, spans,
                              cfg: FusedDetectorConfig):
    return detect_frame_segmented(
        key, dist_qo, rows_qo, ok, qp, xy, points, obj_start, spans,
        cfg.guess, cfg.activation, cfg.radius)[1]


def _stage_coarse_select(dsc, ok, cdb, tracked=None, explore=None, *,
                         cfg: FusedDetectorConfig):
    if cfg.coarse_q_stride > 1:
        # ranking-only query subsample (see FusedDetectorConfig): the
        # fine pass downstream still sees every query
        dsc = dsc[::cfg.coarse_q_stride]
        ok = ok[::cfg.coarse_q_stride]
    if isinstance(cdb, SegmentedDb):
        dist_c, _ = object_top1(dsc, cdb)
    else:
        from tod_tpu.ops.pallas.segmented_l2 import object_top1_l2
        dist_c, _ = object_top1_l2(dsc, cdb)
    width = cfg.fine_width \
        - (cfg.track_width if tracked is not None else 0) \
        - (cfg.explore_width if explore is not None else 0)
    sel = coarse_select(dist_c, ok, cfg.radius, cfg.resolved_coarse_slack,
                        width, cfg.activation.prescreen_top)
    if tracked is not None:
        sel = merge_tracked(sel, tracked)
    if explore is not None:
        # explore ids are unique by construction (host-side rotation);
        # merge_tracked holes out any already selected coarse/tracked
        sel = merge_tracked(sel, explore)
    force = force_act = None
    if tracked is not None or explore is not None:
        # reserved-slot objects bypass the in-slab tier-1 prescreen: the
        # same margin-mass statistic that coarse-excluded them would
        # otherwise screen them out AGAIN inside the slab. Computed on the
        # MERGED selection, so a reserved object deduplicated into its
        # coarse slot stays forced (reserved_force_mask).
        force = reserved_force_mask(sel, tracked, explore)
    if tracked is not None:
        # TRACKED objects additionally bypass the activation cut: a
        # latched object's persistence rides tier-2 inlier evidence, not
        # per-frame tier-1 sampling variance (the measured flicker source)
        force_act = reserved_force_mask(sel, tracked)
    return sel, force, force_act


def _stage_geometry_gathered(key, xy, qp, ok, dist_qc, rows_qc, sel,
                             points, obj_start, spans, force=None,
                             force_active=None, seeds=None, *,
                             cfg: FusedDetectorConfig):
    return detect_frame_gathered(
        key, dist_qc, rows_qc, sel, ok, qp, xy, points, obj_start, spans,
        cfg.guess, cfg.activation, cfg.radius, force,
        cfg.track_width + cfg.explore_width, force_active, seeds)[1]


_jit_tracked = jax.jit(tracked_from_age, static_argnums=(1, 2))
_jit_age = jax.jit(update_age, static_argnums=(2,))


_jit_seeds = functools.partial(jax.jit, static_argnums=(3,))(
    seeds_from_state)


# shared streaming-state bodies (geometry/detection.py): both drivers'
# per-stream results must stay bitwise-identical, so the fold/selection
# logic lives in ONE place and is only jitted/vmapped here
_jit_update_pose = jax.jit(fold_best_pose)


_jit_tracked_needy = functools.partial(jax.jit, static_argnums=(2, 3))(
    tracked_needy)


@functools.lru_cache(maxsize=4)
def _jitted_segmented_stages(cfg: FusedDetectorConfig):
    s1 = jax.jit(functools.partial(_stage_features_compact, cfg=cfg))
    if cfg.feature == "SIFT":
        from tod_tpu.ops.pallas.segmented_l2 import object_top1_l2
        s2 = jax.jit(object_top1_l2)
    else:
        s2 = jax.jit(object_top1)
    s3 = jax.jit(functools.partial(_stage_geometry_segmented, cfg=cfg))
    return s1, s2, s3


@functools.lru_cache(maxsize=4)
def _jitted_stages(cfg: FusedDetectorConfig):
    s1 = jax.jit(functools.partial(_stage_features, cfg=cfg))
    s2 = jax.jit(functools.partial(match_against_db, cfg=cfg))
    s3 = jax.jit(functools.partial(_stage_geometry, cfg=cfg))
    return s1, s2, s3


class FusedDetector:
    """Convenience wrapper: load models once, detect many frames."""

    def __init__(self, models: Sequence[TodModel],
                 config: Optional[FusedDetectorConfig] = None,
                 seed: int = 0):
        self.config = config or FusedDetectorConfig()
        self.segmented = self.config.pipeline == "segmented"
        if self.config.feature == "SIFT" and not self.segmented:
            raise ValueError(
                "FusedDetector serves SIFT/L2 through the segmented "
                "pipeline only (pipeline='segmented'); the TodDetector "
                "cell graph covers the global-kNN SIFT contract")
        if self.config.track_width or self.config.explore_width:
            if self.config.coarse_stride <= 0:
                raise ValueError(
                    "track_width/explore_width reserve coarse->fine slab "
                    "slots; they require coarse_stride > 0 (the full exact "
                    "sweep already scores every object)")
            reserved = self.config.track_width + self.config.explore_width
            if reserved >= self.config.fine_width:
                raise ValueError(
                    f"track_width + explore_width ({reserved}) must leave "
                    f"coarse slots: fine_width is "
                    f"{self.config.fine_width}")
        if self.segmented:
            self._stages = _jitted_segmented_stages(self.config)
            self._coarse = None
            self._coarse_max_chunks = 0
            self._pack_catalog(models)
        else:
            self.db, self.object_ids = pack_models(models,
                                                   self.config.db_chunk)
            self._stages = _jitted_stages(self.config)
            self._coarse = None  # coarse->fine is a segmented-path mode
                                 # (detect_batch_raw also runs the full
                                 # exact sweep: coarse->fine is a perf
                                 # mode, not a semantics change)
        self._key = jax.random.PRNGKey(seed)

    def _pack_catalog(self, models: Sequence[TodModel]) -> None:
        """Pack (or re-pack) the segmented model DB, honoring the configured
        catalog capacity / per-slot row reservation (empty pad slots never
        match and are never reported)."""
        cfg = self.config
        models = list(models)
        if cfg.catalog_capacity > len(models):
            empty_desc = np.zeros(
                (0, 128 if cfg.feature == "SIFT" else 32),
                np.float32 if cfg.feature == "SIFT" else np.uint8)
            models += [TodModel("", empty_desc, np.zeros((0, 3), np.float32))
                       for _ in range(cfg.catalog_capacity - len(models))]
        if cfg.feature == "SIFT":
            from tod_tpu.ops.pallas.segmented_l2 import pack_segmented_l2
            self.sdb = pack_segmented_l2(models,
                                         reserve_rows=cfg.reserve_rows)
        else:
            self.sdb = pack_segmented(models, reserve_rows=cfg.reserve_rows)
        self.object_ids = [m.object_id for m in models]
        # temporal tracking state: frames since each object slot was last
        # accepted (slab persistence, cfg.track_width). Catalog re-packs
        # reset it — slot indices may mean different objects now.
        self._age = jnp.full(max(len(models), 1), AGE_NEVER, jnp.int32)
        self._explore_pos = 0  # rotation cursor for cfg.explore_width slots
        self._last_coarse_sel = None  # previous frame's coarse slab slots
        # last ACCEPTED pose per object slot (tracked-pose seeding,
        # cfg.track_width): re-packs reset it with the age state above
        n_slots = max(len(models), 1)
        self._last_R = jnp.zeros((n_slots, 3, 3), jnp.float32)
        self._last_T = jnp.zeros((n_slots, 3), jnp.float32)
        if cfg.coarse_stride > 0 and models:
            c_reserve = -(-cfg.reserve_rows // cfg.coarse_stride)
            sub = subsample_models(models, cfg.coarse_stride)
            # chunk the coarse DB to the SUBSAMPLED segment length: the
            # full-DB chunk (4096, tuned for 16k+-row segments) pads every
            # ~rows/stride-row coarse segment up to 4096, which made the
            # coarse sweep cost stride-INDEPENDENT (measured: stride 8 ==
            # stride 16 FPS at 1000 objects; PROFILE_FRONTIER.json shows
            # the padded coarse select as the slowest serving stage)
            med_rows = int(np.median([max(m.n_points, 1) for m in sub]))
            c_chunk = next((c for c in (512, 1024, 2048, 4096)
                            if c >= med_rows), 4096)
            if cfg.feature == "SIFT":
                from tod_tpu.ops.pallas.segmented_l2 import (
                    max_chunks_per_object_f, object_top1_l2_gathered,
                    pack_segmented_l2)
                self.cdb = pack_segmented_l2(sub, db_chunk=c_chunk,
                                             reserve_rows=c_reserve)
                gathered = object_top1_l2_gathered
                max_chunks = max_chunks_per_object_f(self.sdb)
            else:
                self.cdb = pack_segmented(sub, db_chunk=c_chunk,
                                          reserve_rows=c_reserve)
                gathered = object_top1_gathered
                max_chunks = max_chunks_per_object(self.sdb)
            # a larger-than-needed static grid is correct (padding steps
            # fold into the trash lane), so growing catalogs only re-jit
            # the gathered stage when an object actually exceeds the
            # largest chunk count seen so far
            if self._coarse is None \
                    or max_chunks > self._coarse_max_chunks:
                self._coarse_max_chunks = max(max_chunks,
                                              self._coarse_max_chunks)
                self._coarse = (
                    jax.jit(functools.partial(_stage_coarse_select,
                                              cfg=cfg)),
                    jax.jit(functools.partial(
                        gathered, max_chunks=self._coarse_max_chunks)),
                    jax.jit(functools.partial(_stage_geometry_gathered,
                                              cfg=cfg)),
                )

    def update_models(self, models: Sequence[TodModel]) -> None:
        """Hot catalog update for the serving (segmented) pipeline: re-pack
        and swap the model DB without touching the jitted stages — the
        runtime analog of the reference matcher's model re-load on
        parameter change (DescriptorMatcher.cpp:61-129), minus the pause.

        When the detector was built with ``catalog_capacity`` /
        ``reserve_rows`` and the new catalog fits (same slot count, every
        object within the reservation), the re-packed arrays have identical
        shapes, every compiled program is reused, and the swap costs one
        host->device upload. A catalog that outgrows its reservation still
        works — the shape change just recompiles on next dispatch."""
        if not self.segmented:
            raise ValueError("update_models is a segmented-pipeline API; "
                             "rebuild the FusedDetector for the global-kNN "
                             "path")
        self._pack_catalog(models)

    def _explore_ids(self) -> jax.Array:
        """Next ``explore_width`` catalog indices of the deterministic
        rotation (host-side cursor; -1-padded when the catalog is smaller
        than the reservation). Each call advances one frame. Rotates over
        REAL slots only: ``catalog_capacity`` padding slots (empty object
        ids) can never match, and a forced tier-1 entry spent on one would
        both waste lean-RANSAC budget and stretch the documented ceil(O/E)
        discovery bound toward ceil(capacity/E)."""
        real = np.asarray([i for i, oid in enumerate(self.object_ids)
                           if oid], np.int32)
        n = len(real)
        e = self.config.explore_width
        if e >= n:
            ids = np.concatenate([real, np.full(e - n, -1, np.int32)])
        else:
            pos = (self._explore_pos + np.arange(e)) % n
            ids = real[pos]
            self._explore_pos = int((self._explore_pos + e) % n)
        return jnp.asarray(ids)

    def prepare_frame(self, image: np.ndarray, depth: np.ndarray,
                      K: np.ndarray):
        """Upload one frame to the device once (gray f32, depth, K)."""
        img = jnp.asarray(np.asarray(image), jnp.float32)
        gray = rgb_to_gray(img) if img.ndim == 3 else img
        return gray, jnp.asarray(np.asarray(depth)), jnp.asarray(
            np.asarray(K, np.float32))

    def detect_raw(self, image, depth, K) -> Tuple[Keypoints, ObjectDetections]:
        """Device-level API (returns stacked jax arrays; no host sync).
        Accepts numpy frames or pre-uploaded device arrays (prepare_frame)."""
        if isinstance(image, jax.Array) and image.ndim == 2:
            gray, depth_j, K_j = image, depth, K
        else:
            gray, depth_j, K_j = self.prepare_frame(image, depth, K)
        self._key, sub = jax.random.split(self._key)
        s1, s2, s3 = self._stages
        if self.segmented:
            xy, qp, dsc, ok = s1(gray, depth_j, K_j)
            if not self.object_ids:
                return None, _empty_detections(0, self.config)
            if self._coarse is not None:
                c1, c2, c3 = self._coarse
                track = self.config.track_width > 0
                explore = self.config.explore_width > 0
                tracked = None
                if track:
                    tracked = (_jit_tracked_needy(
                        self._age, self._last_coarse_sel,
                        self.config.track_width, self.config.track_ttl)
                        if self._last_coarse_sel is not None else
                        _jit_tracked(self._age, self.config.track_width,
                                     self.config.track_ttl))
                if track or explore:
                    sel, force, force_act = c1(
                        dsc, ok, self.cdb, tracked,
                        self._explore_ids() if explore else None)
                else:
                    sel, force, force_act = c1(dsc, ok, self.cdb)
                if track:
                    # coarse-slot prefix only: an object held in the slab
                    # by its RESERVED slot still needs one next frame. The
                    # prefix is the CLAMPED coarse width (coarse_select
                    # returns min(width, catalog) slots) — slicing by the
                    # un-clamped fine_width - reserved would leak the
                    # reserved slots into last_coarse_sel on catalogs
                    # smaller than the slab, marking latched objects
                    # not-needy.
                    n_coarse = min(
                        self.config.fine_width - self.config.track_width
                        - (self.config.explore_width if explore else 0),
                        len(self.object_ids))
                    self._last_coarse_sel = sel[:n_coarse]
                seeds = (_jit_seeds(self._age, self._last_R, self._last_T,
                                    self.config.track_ttl)
                         if track else None)
                dist, rows = c2(dsc, self.sdb, sel)
                det = c3(sub, xy, qp, ok, dist, rows, sel, self.sdb.points,
                         self.sdb.obj_start, self.sdb.spans, force,
                         force_act, seeds)
                if track:
                    self._age = _jit_age(self._age, det,
                                         self.config.track_min_confidence)
                    self._last_R, self._last_T = _jit_update_pose(
                        self._last_R, self._last_T, det)
                return None, det
            dist, rows = s2(dsc, self.sdb)
            det = s3(sub, xy, qp, ok, dist, rows, self.sdb.points,
                     self.sdb.obj_start, self.sdb.spans)
            return None, det
        kps, desc, query_pts = s1(gray, depth_j, K_j)
        if not self.object_ids:  # empty DB: nothing to match against
            return kps, _empty_detections(0, self.config)
        dist, rows = s2(desc, self.db)
        det = s3(sub, kps.xy, kps.valid, dist, rows, query_pts,
                 geom_db(self.db))
        return kps, det

    @functools.lru_cache(maxsize=2)
    def _batched_stages(self):
        # batched serving runs the geometry under vmap, where the refinement
        # while_loop is the measured lane-stall + pathological-compile source
        # (round-2: 19-minute compiles); the masked fixed-trip form is
        # result-identical and compiles like any static loop
        cfg = dataclasses.replace(
            self.config,
            guess=dataclasses.replace(
                self.config.guess,
                ransac=dataclasses.replace(self.config.guess.ransac,
                                           fixed_refine_loop=True)))
        if self.segmented:
            s1 = jax.jit(jax.vmap(
                functools.partial(_stage_features_compact, cfg=cfg)))
            if cfg.feature == "SIFT":
                from tod_tpu.ops.pallas.segmented_l2 import object_top1_l2
                top1 = object_top1_l2
            else:
                top1 = object_top1
            # the Pallas kernel is not vmappable; fold the batch into the
            # query axis (results are per-query independent)
            def match_b(dsc_b, sdb):
                b, qn, d_dim = dsc_b.shape
                d, r = top1(dsc_b.reshape(b * qn, d_dim), sdb)
                return (d.reshape(b, qn, -1), r.reshape(b, qn, -1))
            s2 = jax.jit(match_b)
            s3 = jax.jit(jax.vmap(
                functools.partial(_stage_geometry_segmented, cfg=cfg),
                in_axes=(0, 0, 0, 0, 0, 0, None, None, None)))
            return s1, s2, s3
        s1 = jax.jit(jax.vmap(functools.partial(_stage_features, cfg=cfg)))
        s2 = jax.jit(jax.vmap(functools.partial(match_against_db, cfg=cfg),
                              in_axes=(0, None)))
        s3 = jax.jit(jax.vmap(functools.partial(_stage_geometry, cfg=cfg),
                              in_axes=(0, 0, 0, 0, 0, 0, None)))
        return s1, s2, s3

    def detect_batch_raw(self, grays, depths, Ks):
        """Batched device-level API: (B,H,W) device arrays in, stacked
        (B, O, I, ...) detections out."""
        s1, s2, s3 = self._batched_stages()
        b = grays.shape[0]
        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, b)
        if self.segmented:
            xy, qp, dsc, ok = s1(grays, depths, Ks)
            if not self.object_ids:
                return None, jax.tree.map(
                    lambda x: jnp.broadcast_to(x[None], (b,) + x.shape),
                    _empty_detections(0, self.config))
            dist, rows = s2(dsc, self.sdb)
            det = s3(keys, xy, qp, ok, dist, rows, self.sdb.points,
                     self.sdb.obj_start, self.sdb.spans)
            return None, det
        kps, desc, query_pts = s1(grays, depths, Ks)
        if not self.object_ids:  # empty DB: nothing to match against
            return kps, jax.tree.map(
                lambda x: jnp.broadcast_to(x[None], (b,) + x.shape),
                _empty_detections(0, self.config))
        dist, rows = s2(desc, self.db)
        det = s3(keys, kps.xy, kps.valid, dist, rows, query_pts,
                 geom_db(self.db))
        return kps, det

    def detect(self, image: np.ndarray, depth: np.ndarray,
               K: np.ndarray) -> List[PoseResult]:
        from tod_tpu.utils.transfer import fetch_arrays

        _, det = self.detect_raw(image, depth, K)
        # ONE packed download: per-array device_get costs a full tunnel RTT
        # each (~100 ms of pure latency for the four arrays — measured in
        # tools/diag_cf_stages.py)
        det_r, det_t, det_n, det_acc, det_rms, det_cs = fetch_arrays(
            det.R, det.T, det.n_inliers, det.accepted,
            det.rms_residual, det.clique_size)
        sigma = self.config.guess.sensor_error
        results: List[PoseResult] = []
        for o, object_id in enumerate(self.object_ids):
            for inst in range(det_acc.shape[1]):
                if not det_acc[o, inst] or \
                        det_n[o, inst] < self.config.min_confidence:
                    continue
                quality = confidence_v2(
                    float(det_n[o, inst]), float(det_rms[o, inst]),
                    int(det_cs[o, inst]), sigma)
                if quality < self.config.min_quality:
                    continue
                results.append(PoseResult(
                    R=det_r[o, inst], T=det_t[o, inst],
                    object_id=object_id,
                    confidence=float(det_n[o, inst]),
                    rms_residual=float(det_rms[o, inst]),
                    clique_size=int(det_cs[o, inst]),
                    quality=quality))
        return results
