"""Object-sharded segmented matching: the multi-chip form of the serving
matcher (ops/pallas/segmented.py).

Sharding layout: the OBJECT axis of the model DB is distributed across the
'db' mesh axis — each device packs a SegmentedDb of its own object subset
(whole objects only, so the per-object reduction never crosses devices).
Every device runs the per-(query, object) kernel against its local objects;
one all_gather over ICI assembles the (Q, O_total) result. Unlike the
row-sharded global matcher (parallel/matching.py), no top-k merge is needed:
per-object results are disjoint by construction — the collective is a pure
concatenation, exact by construction.

Queries may additionally be sharded along 'data' (frames), giving the 2D
form: each device owns a (frame-block x object-shard) tile.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tod_tpu.db.models import TodModel
from tod_tpu.ops.pallas.segmented import (DB_CHUNK, PAD_POP, SegmentedDb,
                                          object_top1, pack_segmented)
from tod_tpu.ops.pallas.segmented_l2 import (PAD_NORM, SegmentedDbF,
                                             object_top1_l2,
                                             pack_segmented_l2)


def _top1_for(sdb):
    """Matcher dispatch on the packed-DB pytree type: Hamming (SegmentedDb)
    or int8-quantized L2 (SegmentedDbF, the SIFT serving path)."""
    return object_top1_l2 if isinstance(sdb, SegmentedDbF) else object_top1


def pack_segmented_sharded(models: Sequence[TodModel], n_shards: int,
                           db_chunk: int = DB_CHUNK
                           ) -> Tuple[SegmentedDb, List[str]]:
    """Pack models into ``n_shards`` equal-shape SegmentedDbs stacked on a
    leading shard axis (shard s owns objects s, s+n_shards, ... round-robin;
    short shards are padded with empty objects whose rows never match).

    Returns ``(stacked SegmentedDb with leading dim n_shards, object_ids in
    concatenated shard-major order — the object axis of the gathered
    (Q, O) result)``. Padding slots (short shards) appear as ``None`` in the
    id list; their rows never match (PAD_POP sentinel), so consumers can
    either filter by ``id is None`` or ignore them (their distances are
    +inf-like)."""
    per = [list(models[s::n_shards]) for s in range(n_shards)]
    o_max = max((len(p) for p in per), default=0)
    pad_slots = [[False] * len(p) + [True] * (o_max - len(p)) for p in per]
    n_rows_max = 0
    packed = []
    for p in per:
        while len(p) < o_max:
            p.append(TodModel("", np.zeros((0, 32), np.uint8),
                              np.zeros((0, 3), np.float32)))
        db = pack_segmented(p, db_chunk)
        packed.append(db)
        n_rows_max = max(n_rows_max, db.bits_t.shape[1])

    def pad_rows(db: SegmentedDb) -> SegmentedDb:
        n = db.bits_t.shape[1]
        extra = n_rows_max - n
        if not extra:
            return db
        return SegmentedDb(
            bits_t=jnp.concatenate(
                [db.bits_t, jnp.zeros((256, extra), db.bits_t.dtype)], 1),
            pop=jnp.concatenate(
                [db.pop, jnp.full((1, extra), PAD_POP, db.pop.dtype)], 1),
            points=jnp.concatenate(
                [db.points, jnp.zeros((extra, 3), jnp.float32)]),
            obj_start=db.obj_start,
            n_rows=db.n_rows,
            spans=db.spans,
            chunk_obj=jnp.concatenate(
                [db.chunk_obj,
                 jnp.zeros(extra // db_chunk, jnp.int32)]),
            chunk_base=jnp.concatenate(
                [db.chunk_base,
                 jnp.zeros(extra // db_chunk, jnp.int32)]))

    packed = [pad_rows(db) for db in packed]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *packed)
    ids = [None if is_pad else m.object_id
           for p, pads in zip(per, pad_slots)
           for m, is_pad in zip(p, pads)]
    return stacked, ids


def pack_segmented_l2_sharded(models: Sequence[TodModel], n_shards: int,
                              db_chunk: Optional[int] = None
                              ) -> Tuple[SegmentedDbF, List[str]]:
    """:func:`pack_segmented_sharded` for float-descriptor models (the
    SIFT/L2 serving path): same round-robin whole-object layout, stacked
    SegmentedDbF with a leading shard axis; padding rows carry PAD_NORM so
    they never win a nearest-row reduction."""
    from tod_tpu.ops.pallas.segmented_l2 import DB_CHUNK as L2_DB_CHUNK

    if db_chunk is None:
        db_chunk = L2_DB_CHUNK
    dim = models[0].descriptors.shape[1] if models else 128
    per = [list(models[s::n_shards]) for s in range(n_shards)]
    o_max = max((len(p) for p in per), default=0)
    pad_slots = [[False] * len(p) + [True] * (o_max - len(p)) for p in per]
    n_rows_max = 0
    packed = []
    for p in per:
        while len(p) < o_max:
            p.append(TodModel("", np.zeros((0, dim), np.float32),
                              np.zeros((0, 3), np.float32)))
        db = pack_segmented_l2(p, db_chunk)
        packed.append(db)
        n_rows_max = max(n_rows_max, db.vecs_t.shape[1])

    def pad_rows(db: SegmentedDbF) -> SegmentedDbF:
        extra = n_rows_max - db.vecs_t.shape[1]
        if not extra:
            return db
        return SegmentedDbF(
            vecs_t=jnp.concatenate(
                [db.vecs_t, jnp.zeros((dim, extra), db.vecs_t.dtype)], 1),
            norm_sq=jnp.concatenate(
                [db.norm_sq,
                 jnp.full((1, extra), PAD_NORM, db.norm_sq.dtype)], 1),
            points=jnp.concatenate(
                [db.points, jnp.zeros((extra, 3), jnp.float32)]),
            obj_start=db.obj_start,
            n_rows=db.n_rows,
            spans=db.spans,
            chunk_obj=jnp.concatenate(
                [db.chunk_obj, jnp.zeros(extra // db_chunk, jnp.int32)]),
            chunk_base=jnp.concatenate(
                [db.chunk_base, jnp.zeros(extra // db_chunk, jnp.int32)]))

    packed = [pad_rows(db) for db in packed]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *packed)
    ids = [None if is_pad else m.object_id
           for p, pads in zip(per, pad_slots)
           for m, is_pad in zip(p, pads)]
    return stacked, ids


def stacked_max_chunks(sdb_st) -> int:
    """Largest per-object chunk count across the shards of a stacked
    SegmentedDb — the static grid operand for the gathered fine kernel
    under shard_map (one program serves every shard, so the max rules)."""
    starts = np.asarray(jax.device_get(sdb_st.obj_start))      # (S, O)
    total = int(sdb_st.chunk_obj.shape[1])
    rows_arr = (sdb_st.bits_t if isinstance(sdb_st, SegmentedDb)
                else sdb_st.vecs_t)
    db_chunk = int(rows_arr.shape[2]) // total
    out = 0
    for s in range(starts.shape[0]):
        bounds = np.concatenate([starts[s] // db_chunk, [total]])
        out = max(out, int(np.max(np.diff(bounds))))
    return out


def serving_step_sharded(mesh: Mesh, cfg, fine_max_chunks: int = 0):
    """The multi-chip segmented SERVING step (VERDICT r2 item 6): one
    shard_map program covering matching + tier-1 activation + tier-2
    certified RANSAC.

    Layout over the ('data', 'db') mesh:
      * frames (and their compacted queries) sharded over 'data';
      * matcher operands (the heavy descriptor bit-planes of the stacked
        SegmentedDb) sharded by OBJECT over 'db' — each device matches its
        own object subset, one all_gather assembles the (Q, O_total) result;
      * tier-1 activation object-sharded over 'db': each device presence-
        scores its own objects (the per-object lean RANSAC is the expensive
        part); scores all_gather over ICI, global top-k picks the actives;
      * tier-2 active-set sharded over 'db': each device runs the certified
        multi-instance RANSAC on n_active/n_db of the activated objects
        against REPLICATED lightweight geometry arrays (points are 12 B/row
        vs 288 B/row for the matcher bit-planes, so replicating them is the
        right trade), then detections all_gather + scatter to the full
        object axis.

    Exactness: bitwise-identical to detect_frame_segmented on a single
    device over the same shard-major object order (parity test in
    tests/test_parallel.py).

    ``cfg``: FusedDetectorConfig with pipeline="segmented". Returns a jitted
    ``fn(keys (B,), xy (B,Qp,2), qp (B,Qp,3), ok (B,Qp), dsc (B,Qp,32),
    sdb_stacked) -> ObjectDetections (B, O_total, I, ...)`` requiring B
    divisible by n_data and min(max_active_objects, O_total) divisible by
    n_db.

    Coarse→fine (``cfg.coarse_stride > 0``, Hamming or L2 DBs): the returned
    fn takes an extra trailing ``cdb_stacked`` (the stride-subsampled
    companion, packed with the SAME shard split), and ``fine_max_chunks``
    must be ``stacked_max_chunks(sdb_stacked)``. Each shard coarse-sweeps
    its own objects; the gathered (Q, O) coarse result picks the global
    top-``fine_width`` slab; each shard fine-matches the selected objects
    it owns with the gathered kernel; a pmin of packed (dist, row) keys
    over 'db' assembles the exact slab; tier-1/tier-2 then run on slab
    SLOTS sharded positionally over 'db' — bitwise-identical to the
    single-device coarse→fine path (parity test), with ``fine_width`` and
    ``min(prescreen, fine_width)`` required to divide n_db.

    Streaming slab slots: when ``cfg.track_width`` / ``cfg.explore_width``
    are set (coarse→fine only), the fn takes matching trailing per-frame
    id arrays ``tracked (B, track_width)`` / ``explore (B, explore_width)``
    (int32, -1 = empty) after the DB operand(s); the driver computes them
    exactly as the single-device streaming loop does (``tracked_from_age``
    on its age state; the deterministic exploration rotation), and the
    slab construction is bit-identical to ``_stage_coarse_select``.
    With ``track_width > 0`` the fn takes three MORE trailing operands —
    ``seed_R (B, O_total, 3, 3)``, ``seed_T (B, O_total, 3)``,
    ``seed_ok (B, O_total)``: the driver's last-accepted-pose state
    (tracked-pose seeding, geometry/ransac.py SeedPose) — and returns
    ``(detections, last_coarse_sel (B, fine_width - reserved))`` so the
    driver can feed needy-first tracked eviction next frame.
    :class:`tod_tpu.parallel.serving.ShardedServingDetector` wraps all of
    this host state.
    """
    from tod_tpu.geometry.adjacency import fill_adjacency
    from tod_tpu.geometry.detection import (build_object_stores,
                                            coarse_select, merge_tracked,
                                            prescreen_scores,
                                            reserved_force_mask,
                                            scatter_detections)
    from tod_tpu.geometry.ransac import (ObjectDetections, SeedPose,
                                         detect_object_instances,
                                         presence_score)
    from tod_tpu.ops.pallas.segmented import (ROW_BITS, ROW_MASK,
                                              object_top1_gathered)

    act = cfg.activation
    guess = cfg.guess
    n_db = mesh.shape["db"]
    coarse = getattr(cfg, "coarse_stride", 0) > 0
    if coarse and fine_max_chunks <= 0:
        raise ValueError("coarse_stride > 0 requires fine_max_chunks="
                         "stacked_max_chunks(sdb_stacked)")
    # Streaming slab slots (coarse->fine only): when the config reserves
    # tracked and/or exploration slots, the returned fn takes matching
    # trailing per-frame id arrays — ``tracked (B, track_width)`` and/or
    # ``explore (B, explore_width)`` int32, -1 = empty slot — AFTER the
    # DB operand(s). The driver supplies them exactly as the single-device
    # streaming loop does (tracked_from_age on its age state; the
    # deterministic exploration rotation), and the step reproduces
    # _stage_coarse_select's construction bit-for-bit: coarse top
    # (fine_width - reserved), then merge tracked, then merge explore.
    n_track = getattr(cfg, "track_width", 0) if coarse else 0
    n_explore = getattr(cfg, "explore_width", 0) if coarse else 0
    if (getattr(cfg, "track_width", 0) or getattr(cfg, "explore_width", 0)) \
            and not coarse:
        raise ValueError("track_width/explore_width are coarse->fine slab "
                         "features; they require coarse_stride > 0")
    # Tracked-pose seeding (cfg.track_width > 0): the fn takes THREE more
    # trailing per-frame operands after tracked/explore — seed_R
    # (B, O_total, 3, 3), seed_T (B, O_total, 3), seed_ok (B, O_total) —
    # the driver's last-accepted-pose state on the full object axis,
    # exactly what the single-device streaming loop feeds _jit_seeds.

    def local(keys, xy, qp, ok, dsc, sdb_st, *rest):
        sdb = jax.tree.map(lambda x: x[0], sdb_st)       # this device's shard
        rest = list(rest)
        cdb = (jax.tree.map(lambda x: x[0], rest.pop(0)) if coarse else None)
        tracked_b = rest.pop(0) if n_track else None
        explore_b = rest.pop(0) if n_explore else None
        seeds_b = (SeedPose(R=rest.pop(0), T=rest.pop(0), ok=rest.pop(0))
                   if n_track else None)
        s = jax.lax.axis_index("db")
        o_local = sdb.spans.shape[0]
        r_shard = sdb.points.shape[0]
        n_objects = o_local * n_db
        # the object axis tier-1/tier-2 operate on: the full catalog, or —
        # in coarse->fine mode — the selected slab (coarse top-k clamps to
        # the catalog size; reserved streaming slots are appended after)
        axis_n = (min(cfg.fine_width - n_track - n_explore, n_objects)
                  + n_track + n_explore) if coarse else n_objects
        if coarse:
            assert axis_n % n_db == 0, \
                f"fine_width ({axis_n}) must divide by n_db ({n_db})"
        n_active = min(guess.max_active_objects, axis_n)
        assert n_active % n_db == 0, \
            f"max_active_objects ({n_active}) must divide by n_db ({n_db})"
        per_dev = n_active // n_db

        # replicated full-DB geometry (shard-major object order); global row
        # of (shard s, local row r) = s * r_shard + r
        points_full = jax.lax.all_gather(sdb.points, "db", axis=0, tiled=True)
        obj_start_full = jax.lax.all_gather(sdb.obj_start + s * r_shard,
                                            "db", axis=0, tiled=True)
        spans_full = jax.lax.all_gather(sdb.spans, "db", axis=0, tiled=True)

        def per_frame(key, xy_f, qp_f, ok_f, dsc_f, tracked_f, explore_f,
                      seeds_f):
            if coarse:
                # coarse sweep over this shard's subsampled objects; the
                # gathered (Q, O) result is identical on every device, so
                # the top-fine_width selection is too. The ranking-only
                # query subsample (cfg.coarse_q_stride) matches
                # _stage_coarse_select exactly, keeping single-vs-sharded
                # selections bitwise-identical
                q_s = getattr(cfg, "coarse_q_stride", 1)
                dsc_c = dsc_f[::q_s] if q_s > 1 else dsc_f
                ok_c = ok_f[::q_s] if q_s > 1 else ok_f
                dc_loc, _ = _top1_for(cdb)(dsc_c, cdb, vary=("data", "db"))
                dc = jax.lax.all_gather(dc_loc, "db", axis=1, tiled=True)
                sel = coarse_select(dc, ok_c, cfg.radius,
                                    cfg.resolved_coarse_slack,
                                    cfg.fine_width - n_track - n_explore,
                                    act.prescreen_top)
                # streaming slots, merged in _stage_coarse_select's exact
                # order (the P("data") spec replicates each frame's slot ids
                # over 'db', so the dedup against the coarse selection is
                # identical on every shard)
                if tracked_f is not None:
                    sel = merge_tracked(sel, tracked_f)
                if explore_f is not None:
                    sel = merge_tracked(sel, explore_f)
                # reserved-slot objects bypass the in-slab tier-1 prescreen;
                # TRACKED objects additionally bypass the activation cut
                # (same construction as _stage_coarse_select, so the forced
                # pre_ids/actives below stay bitwise-identical to
                # single-device)
                force = (reserved_force_mask(sel, tracked_f, explore_f)
                         if (tracked_f is not None or explore_f is not None)
                         else None)
                force_act = (reserved_force_mask(sel, tracked_f)
                             if tracked_f is not None else None)
                # fine pass: each shard exact-matches the selected objects
                # it owns (global axis is shard-major: owner = id // o_local)
                own = (sel // o_local) == s
                sel_local = jnp.where(own, sel % o_local, -1).astype(
                    jnp.int32)
                # disjoint columns across shards (each object has ONE
                # owner): unowned slots carry hole values, so a pmin/psum
                # merge over 'db' assembles the exact (Q, C) slab
                if isinstance(sdb, SegmentedDbF):
                    from tod_tpu.ops.pallas.segmented_l2 import (
                        object_top1_l2_gathered)
                    df, rf = object_top1_l2_gathered(dsc_f, sdb, sel_local,
                                                     fine_max_chunks,
                                                     vary=("data", "db"))
                    d = jax.lax.pmin(df, "db")   # holes are huge L2 values
                    r = jax.lax.psum(jnp.where(own[None, :], rf, 0), "db")
                else:
                    df, rf = object_top1_gathered(dsc_f, sdb, sel_local,
                                                  fine_max_chunks,
                                                  vary=("data", "db"))
                    keyz = (df.astype(jnp.int32) << ROW_BITS) | rf
                    keyz = jax.lax.pmin(keyz, "db")
                    d = (keyz >> ROW_BITS).astype(jnp.float32)
                    r = keyz & ROW_MASK
            else:
                force = force_act = None
                d_loc, r_loc = _top1_for(sdb)(dsc_f, sdb,
                                              vary=("data", "db"))
                d = jax.lax.all_gather(d_loc, "db", axis=1, tiled=True)
                r = jax.lax.all_gather(r_loc, "db", axis=1, tiled=True)
            key_act, key_det = jax.random.split(key)
            level = jnp.median(d, axis=1)
            if coarse:
                axis_obj_start = obj_start_full[sel]
                axis_spans = spans_full[sel]
            else:
                axis_obj_start = obj_start_full
                axis_spans = spans_full

            # ---- tier 1, sharded over 'db' --------------------------------
            # after the (Q, O) all_gather every device can score ANY object
            # (stores come from the replicated points/obj_start), so with a
            # pre-screen each device takes a positional slice of the global
            # top-P id list — bitwise-identical to the single-device path's
            # key/id assignment; without one, it scores its own shard.
            def tier1(args):
                key_o, o = args
                m = build_object_stores(d, r, ok_f, qp_f, xy_f, points_full,
                                        axis_obj_start, o[None], act.m_cap,
                                        cfg.radius, level)
                m = jax.tree.map(lambda x: x[0], m)
                graphs = fill_adjacency(m, axis_spans[o], guess.sensor_error)
                return presence_score(key_o, m, graphs, act.n_hypotheses,
                                      guess.sensor_error)

            # reserved slots expand the tier-1 set (forced objects never
            # displace coarse candidates) — same formula as the
            # single-device _stage_geometry_gathered for bitwise parity
            n_pre = (min(act.prescreen + n_track + n_explore, axis_n)
                     if act.prescreen > 0 else axis_n)
            if n_pre < axis_n:
                assert n_pre % n_db == 0, \
                    f"prescreen + reserved slots ({n_pre}) must divide " \
                    f"by n_db ({n_db})"
                per_dev_pre = n_pre // n_db
                pre = prescreen_scores(d, level, ok_f, cfg.radius,
                                       act.prescreen_top)
                if force is not None:
                    pre = jnp.where(force, jnp.inf, pre)
                _, pre_ids = jax.lax.top_k(pre, n_pre)
                pre_ids = pre_ids.astype(jnp.int32)
                my_ids = jax.lax.dynamic_slice_in_dim(
                    pre_ids, s * per_dev_pre, per_dev_pre)
                keys1 = jax.lax.dynamic_slice_in_dim(
                    jax.random.split(key_act, n_pre), s * per_dev_pre,
                    per_dev_pre)
                scores_loc = jax.lax.map(
                    tier1, (keys1, my_ids),
                    batch_size=min(act.object_batch, max(per_dev_pre, 1)))
                scores_pre = jax.lax.all_gather(scores_loc, "db", axis=0,
                                                tiled=True)
                scores = jnp.zeros(axis_n, scores_pre.dtype).at[
                    pre_ids].set(scores_pre)
            else:
                ax_local = axis_n // n_db
                keys1 = jax.lax.dynamic_slice_in_dim(
                    jax.random.split(key_act, axis_n), s * ax_local,
                    ax_local)
                local_ids = s * ax_local + jnp.arange(ax_local,
                                                      dtype=jnp.int32)
                scores_loc = jax.lax.map(
                    tier1, (keys1, local_ids),
                    batch_size=min(act.object_batch, max(ax_local, 1)))
                scores = jax.lax.all_gather(scores_loc, "db", axis=0,
                                            tiled=True)

            cut = (scores if force_act is None
                   else jnp.where(force_act, jnp.inf, scores))
            top_scores, active = jax.lax.top_k(cut, n_active)
            active = jnp.where(top_scores >= act.min_score, active, -1)

            # ---- tier 2 on THIS device's slice of the active set ----------
            my_active = jax.lax.dynamic_slice_in_dim(active, s * per_dev,
                                                     per_dev)
            stores = build_object_stores(d, r, ok_f, qp_f, xy_f, points_full,
                                         axis_obj_start, my_active,
                                         guess.max_matches_per_object,
                                         cfg.radius, level)
            act_spans = axis_spans[jnp.maximum(my_active, 0)]
            keys2 = jax.lax.dynamic_slice_in_dim(
                jax.random.split(key_det, n_active), s * per_dev, per_dev)
            my_seeds = None
            if seeds_f is not None:
                # same two-step gather the single-device path does:
                # full object axis -> slab slots (coarse mode) -> actives
                if coarse:
                    axis_seeds = SeedPose(
                        R=seeds_f.R[jnp.maximum(sel, 0)],
                        T=seeds_f.T[jnp.maximum(sel, 0)],
                        ok=seeds_f.ok[jnp.maximum(sel, 0)] & (sel >= 0))
                else:
                    axis_seeds = seeds_f
                a_safe = jnp.maximum(my_active, 0)
                my_seeds = SeedPose(
                    R=axis_seeds.R[a_safe], T=axis_seeds.T[a_safe],
                    ok=axis_seeds.ok[a_safe] & (my_active >= 0))

            def per_object(args):
                if my_seeds is not None:
                    key_o, m, span, seed = args
                    graphs = fill_adjacency(m, span, guess.sensor_error)
                    return detect_object_instances(key_o, m, graphs,
                                                   guess.ransac, seed)
                key_o, m, span = args
                graphs = fill_adjacency(m, span, guess.sensor_error)
                return detect_object_instances(key_o, m, graphs, guess.ransac)

            operands = ((keys2, stores, act_spans) if my_seeds is None
                        else (keys2, stores, act_spans, my_seeds))
            det = jax.lax.map(
                per_object, operands,
                batch_size=min(guess.object_batch, max(per_dev, 1)))
            det = det._replace(
                accepted=det.accepted & (my_active >= 0)[:, None])
            det_all = jax.tree.map(
                lambda x: jax.lax.all_gather(x, "db", axis=0, tiled=True),
                det)
            out = scatter_detections(det_all, active, axis_n)
            if coarse:
                # slab slots -> full object axis (same second scatter the
                # single-device gathered path does)
                out = scatter_detections(out, sel, n_objects)
            if n_track:
                # the coarse-slot PREFIX of the slab: the driver's
                # needy-first tracked eviction needs last frame's coarse
                # selection (same prefix FusedDetector keeps). Use the
                # CLAMPED slab size, not fine_width: with a catalog smaller
                # than fine_width - reserved, coarse_select returned fewer
                # slots and slicing fine_width's worth would be a trace-time
                # error (the single-device driver's sel[:n_coarse] clamps
                # implicitly via Python slicing).
                n_coarse = axis_n - n_track - n_explore
                return out, jax.lax.dynamic_slice_in_dim(sel, 0, n_coarse)
            return out

        det = jax.vmap(per_frame,
                       in_axes=(0, 0, 0, 0, 0,
                                0 if n_track else None,
                                0 if n_explore else None,
                                SeedPose(0, 0, 0) if n_track else None))(
            keys, xy, qp, ok, dsc, tracked_b, explore_b, seeds_b)
        # all 'db' devices now hold identical values; replicate type-safely
        first = (jax.lax.axis_index("db") == 0)

        def repl(x):
            if x.dtype == jnp.bool_:
                return jax.lax.psum(
                    jnp.where(first, x.astype(jnp.int32), 0), "db") > 0
            return jax.lax.psum(jnp.where(first, x, jnp.zeros_like(x)), "db")

        return jax.tree.map(repl, det)

    in_specs = (P("data"), P("data"), P("data"), P("data"), P("data"),
                P("db")) + ((P("db"),) if coarse else ()) \
        + ((P("data"),) if n_track else ()) \
        + ((P("data"),) if n_explore else ()) \
        + ((P("data"), P("data"), P("data")) if n_track else ())
    out_tree = (ObjectDetections(0, 0, 0, 0, 0, 0), 0) if n_track \
        else ObjectDetections(0, 0, 0, 0, 0, 0)
    fn = shard_map(
        local, mesh=mesh, in_specs=in_specs,
        out_specs=jax.tree.map(lambda _: P("data"), out_tree))
    return jax.jit(fn)


def sharded_object_top1(mesh: Mesh, query_u8: jax.Array,
                        sdb_stacked: SegmentedDb
                        ) -> Tuple[jax.Array, jax.Array]:
    """Per-(query, object) nearest rows across an object-sharded DB.

    ``query_u8``: (Q, 32) uint8 Hamming — or (Q, 128) int8 quantized-L2
    when ``sdb_stacked`` is a SegmentedDbF — sharded over 'data' (Q
    divisible by the data axis); ``sdb_stacked``: SegmentedDb(F) with
    leading shard axis == size of 'db'. Returns (Q, O_total) dist/row in
    shard-major object order — bitwise equal to the single-device kernel on
    the same object order."""
    n_db = mesh.shape["db"]
    assert jax.tree.leaves(sdb_stacked)[0].shape[0] == n_db, \
        "shard count != db axis"

    def local(q, sdb):
        sdb = jax.tree.map(lambda x: x[0], sdb)           # drop shard dim
        d, r = _top1_for(sdb)(q, sdb, vary=("data", "db"))
        # concatenation over 'db' assembles the full object axis; all devices
        # then hold identical values, but all_gather does not clear the
        # varying-across-mesh type — finish with a psum of shard 0's values
        # (type-safe replication, same trick as parallel/matching.py)
        d = jax.lax.all_gather(d, "db", axis=1, tiled=True)
        r = jax.lax.all_gather(r, "db", axis=1, tiled=True)
        first = (jax.lax.axis_index("db") == 0)
        return (jax.lax.psum(jnp.where(first, d, 0.0), "db"),
                jax.lax.psum(jnp.where(first, r, 0), "db"))

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("data", None), P("db")),
        out_specs=(P("data", None), P("data", None)))
    return fn(query_u8, sdb_stacked)
