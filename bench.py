#!/usr/bin/env python
"""Headline benchmark: 640x480 RGB-D detection FPS against a 100-object DB.

Mirrors the BASELINE.md north star: >= 30 FPS 640x480 RGB-D detection against
a 100-object database on one TPU chip. The DB is built honestly: 100 DISTINCT
synthetic textured objects, each trained through the actual training pipeline
(12-view multi-ring turntable captures at two distances), ~2M served
descriptors after load-time recompression — so both
the matcher and the geometry stage see realistic descriptor statistics.
Detection quality is measured as recall@2cm over scenes that cycle through
the whole object set (BASELINE.md tracked metric).

Prints ONE JSON line:
  {"metric": "detection_fps_640x480_100obj", "value": ..., "unit": "fps",
   "vs_baseline": value / 30.0, "recall_at_2cm": ...}
plus secondary metrics (matcher throughput vs the multithreaded CPU
brute-force baseline) on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


# the default synthetic capture plan (widened in round 4: a second far
# distance ring + a low elevation ring) and the default load-time model
# recompression.  The widened plan alone diluted weak-texture margins
# (newdef-100: obj021 missed, range bins -1 placement vs the distance-only
# study) — mild recompression (hamming<=16 AND 3D<=5mm collapses the
# near-duplicate multi-ring rows) recovers recall 1.000 AND +3 FPS at the
# headline (SWEEP_R4C newdef-rc16x5: 45.6 FPS / 1.000 vs 42.3 / 0.958
# uncompressed), so the pair ships as the default.
DEFAULT_TRAIN_DIST = "0.8,1.6"
DEFAULT_TRAIN_ELEV = "85,60,35,15"
DEFAULT_RECOMPRESS = "16x5"


def wait_for_devices(window: Optional[float] = None, delay: float = 20.0):
    """The TPU tunnel backend can refuse connections for a while (observed
    up to ~1h) after a previous client disconnects; retry initialization
    until it comes up. Two distinct failure modes (both observed):

    - ``jax.devices()`` RAISES (Unavailable): sleep and retry in-process.
    - ``jax.devices()`` HANGS forever inside PJRT client init: no in-process
      retry can recover (the half-open client is a singleton), but a FRESH
      process connects fine once the server frees up — so after
      ``BENCH_INIT_HANG`` seconds (default 180) we re-exec this script,
      bounded by BENCH_REEXEC to avoid a restart loop.
    """
    import threading

    import jax

    window = float(os.environ.get("BENCH_INIT_WINDOW", window or 1800.0))
    hang_s = float(os.environ.get("BENCH_INIT_HANG", "180"))
    n_reexec = int(os.environ.get("BENCH_REEXEC", "0"))
    if n_reexec:
        # Fresh process after a hung-client re-exec: give the single-client
        # server a quiet window before reconnecting — reconnecting
        # immediately re-wedges it (observed on the v5e tunnel).
        quiet = 90.0 * n_reexec
        log(f"post-re-exec quiet window: {quiet:.0f}s")
        time.sleep(quiet)
    deadline = time.time() + window
    attempt = 0
    while True:
        attempt += 1
        box = {}

        def _try():
            try:
                box["devices"] = jax.devices()
            except Exception as e:  # noqa: BLE001 — logged and retried
                box["error"] = e

        th = threading.Thread(target=_try, daemon=True)
        th.start()
        th.join(hang_s)
        if "devices" in box:
            return box["devices"]
        if th.is_alive():
            # Hung client init: unrecoverable in-process. Re-exec once the
            # budget allows; otherwise keep waiting on the same call.
            n_reexec = int(os.environ.get("BENCH_REEXEC", "0"))
            if n_reexec < 5:
                log(f"device init hung >{hang_s:.0f}s; re-exec "
                    f"({n_reexec + 1}/5) for a fresh PJRT client")
                os.environ["BENCH_REEXEC"] = str(n_reexec + 1)
                sys.stdout.flush()
                sys.stderr.flush()
                # exec immediately — it closes this process's half-open
                # (cloexec) sockets, freeing the single-client server; the
                # fresh process then waits out a quiet window (below)
                # before reconnecting.
                os.execv(sys.executable, [sys.executable] + sys.argv)
            th.join(max(0.0, deadline - time.time()))
            if "devices" in box:
                return box["devices"]
            raise RuntimeError("TPU device init hung past the retry window")
        if time.time() >= deadline:
            raise RuntimeError(
                f"TPU backend unavailable for {window:.0f}s: {box['error']}")
        log(f"backend init retry {attempt}: {box['error']}")
        try:
            jax.clear_backends()
        except Exception:
            pass
        time.sleep(delay)


def make_obj(i: int):
    """The bench catalog's object ``i`` (shared with tools/bench_oracle.py
    so the oracle's 'same workload' claim holds by construction: both
    engines build objects from THIS function, keyed only on the index and
    BENCH_SHAPES)."""
    from tod_tpu.utils.synthetic import (SyntheticBox, SyntheticCylinder,
                                         SyntheticObject)

    # BENCH_SHAPES=mixed (default: plane/box/cylinder cycling — the
    # reference's actual 3D domain) or plane (rounds-1/2-comparable)
    shapes = os.environ.get("BENCH_SHAPES", "mixed")
    oid = f"obj{i:03d}"
    if shapes != "mixed" or i % 3 == 0:
        return SyntheticObject.make(oid, seed=100 + i)
    if i % 3 == 1:
        return SyntheticBox.make(oid, seed=100 + i, size_m=(0.2, 0.15, 0.1))
    return SyntheticCylinder.make(oid, seed=100 + i, radius_m=0.08,
                                  height_m=0.2)


def build_db(n_objects: int, seed: int = 0):
    """Train ``n_objects`` DISTINCT textured objects through the real
    training pipeline (honest DB: real descriptor statistics in both the
    matcher and the geometry stage — no perturbed-copy decoys).

    Trained models are cached under BENCH_DB_CACHE (default: .bench_cache/
    next to this script) so repeat runs skip the ~10-minute 100-object
    training preamble; set BENCH_DB_CACHE= (empty) to force live training.
    The JAX persistent compilation cache is deliberately NOT enabled: the
    tunnel compile service hangs when it is configured (memory/axon notes).
    """
    from tod_tpu.db import InMemoryDb, insert_observation, load_models_for_objects
    from tod_tpu.models import TodTrainer
    from tod_tpu.utils.synthetic import turntable_observations

    shapes = os.environ.get("BENCH_SHAPES", "mixed")

    cache_dir = os.environ.get(
        "BENCH_DB_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache"))
    dedup = int(os.environ.get("BENCH_DEDUP", "8"))
    subpixel = os.environ.get("BENCH_SUBPIXEL", "") == "1"
    feature = os.environ.get("BENCH_FEATURE", "ORB")
    # BENCH_TRAIN_DIST: capture distances; each beyond the first adds one
    # 12-view ring (multi-scale training). ORB's pyramid only covers
    # ~scale^levels (~1.4x at the 3-level operating point) of appearance
    # shrink, so single-distance training bounds far-range detection
    # (STRESS_POSE_td0.8-1.6.json: 1.5-2.0 m recall 0.42-0.75 single-dist
    # vs 0.83-0.92 with the far ring). Default: the WIDENED plan
    # (VERDICT r3 item 4); BENCH_TRAIN_DIST=0.8 restores the narrow
    # rounds-1..3 plan (and its cache keys).
    train_dists = [float(v) for v in
                   os.environ.get("BENCH_TRAIN_DIST", DEFAULT_TRAIN_DIST).split(",")]
    # BENCH_TRAIN_ELEV: turntable elevation rings (deg above the horizon).
    # Viewing tilt past 90 - min(elev) is outside the captured cone
    # (STRESS_POSE_te85-60-35-15.json: the 15-deg ring drops 75-deg-tilt
    # median error 1.2 -> 0.4 mm); the low ring covers oblique viewing the
    # same way the far distance ring covers range. Default: 4 rings.
    train_elevs = tuple(
        float(v) for v in
        os.environ.get("BENCH_TRAIN_ELEV", DEFAULT_TRAIN_ELEV).split(","))
    cache = None
    if cache_dir:
        sp = "_sp" if subpixel else ""
        ft = "" if feature == "ORB" else f"_{feature.lower()}"
        if train_dists != [0.8]:
            ft += "_td" + "-".join(f"{d:g}" for d in train_dists)
        if train_elevs != (85.0, 60.0, 35.0):
            ft += "_te" + "-".join(f"{e:g}" for e in train_elevs)
        cache = os.path.join(cache_dir,
                             f"db_n{n_objects}_s{seed}_d{dedup}_{shapes}"
                             f"{sp}{ft}.npz")
        hit = cache if os.path.exists(cache) else None
        if hit is None and os.path.isdir(cache_dir):
            # object i depends only on (i, seed, shapes, feature params), so
            # any LARGER cached DB with the same params contains this one as
            # an exact prefix — slice it instead of retraining
            import re as _re

            pat = _re.compile(rf"db_n(\d+)_s{seed}_d{dedup}_{shapes}"
                              rf"{sp}{ft}\.npz$")
            bigger = sorted(int(m.group(1)) for f in os.listdir(cache_dir)
                            if (m := pat.match(f))
                            and int(m.group(1)) > n_objects)
            if bigger:
                hit = os.path.join(
                    cache_dir, f"db_n{bigger[0]}_s{seed}_d{dedup}_{shapes}"
                               f"{sp}{ft}.npz")
        if hit:
            from tod_tpu.db.models import TodModel

            objects = [make_obj(i) for i in range(n_objects)]
            # recompressed-DB cache: the 16x5 dedup pass over a 16M-row
            # catalog costs ~14 min of host CPU; the result depends only
            # on (source cache, spec), so cache it beside the source
            spec = os.environ.get("BENCH_RECOMPRESS", DEFAULT_RECOMPRESS)
            rc_hit = (hit[:-4] + f"_rc{spec}_n{n_objects}.npz"
                      if spec and spec.lower() not in ("off", "none", "0")
                      else None)
            if rc_hit and os.path.exists(rc_hit) \
                    and os.path.getmtime(rc_hit) >= os.path.getmtime(hit):
                data = np.load(rc_hit)
                models = [TodModel(f"obj{i:03d}", data[f"d{i}"],
                                   data[f"p{i}"])
                          for i in range(n_objects)]
                log(f"loaded {n_objects} recompressed models from "
                    f"{rc_hit}")
                return objects, models
            data = np.load(hit)
            models = [TodModel(f"obj{i:03d}", data[f"d{i}"], data[f"p{i}"])
                      for i in range(n_objects)]
            log(f"loaded {n_objects} cached models from {hit}")
            models = _recompress(models)
            if rc_hit and models and models[0].descriptors.dtype == np.uint8:
                np.savez(rc_hit,
                         **{f"d{i}": m.descriptors
                            for i, m in enumerate(models)},
                         **{f"p{i}": m.points for i, m in enumerate(models)})
                log(f"cached recompressed models to {rc_hit}")
            return objects, models

    # object i's model depends only on (i, seed, shapes, feature params) —
    # a smaller cached DB with the same params is an exact prefix, so seed
    # from the largest one and train only the remainder (makes the 1000-
    # object stretch DB a ~600-object incremental build, not a full one)
    warm: dict[int, tuple] = {}
    if cache:
        import re as _re

        pat = _re.compile(rf"db_n(\d+)_s{seed}_d{dedup}_{shapes}"
                          rf"{sp}{ft}\.npz$")
        sizes = sorted(
            (int(m.group(1)) for f in (os.listdir(cache_dir)
                                       if os.path.isdir(cache_dir) else [])
             if (m := pat.match(f)) and int(m.group(1)) < n_objects),
            reverse=True)
        if sizes:
            data = np.load(os.path.join(
                cache_dir, f"db_n{sizes[0]}_s{seed}_d{dedup}_{shapes}"
                           f"{sp}{ft}.npz"))
            warm = {i: (data[f"d{i}"], data[f"p{i}"])
                    for i in range(sizes[0])}
            log(f"seeding {len(warm)} models from the n={sizes[0]} cache")

    InMemoryDb.reset_shared()
    db = InMemoryDb.shared("bench")
    objects = []
    warm_models = []
    t0 = time.time()
    trainer = None
    for i in range(n_objects):
        obj = make_obj(i)
        objects.append(obj)
        if i in warm:
            from tod_tpu.db.models import TodModel

            warm_models.append(TodModel(obj.object_id, *warm[i]))
            continue
        # 12 views x 3 elevation rings = 36 views, the reference's turntable
        # capture scale (SURVEY.md section 3.1 "~36 views"); the near-frontal
        # ring matters — detection-time poses are mostly frontal
        all_obs = list(turntable_observations(
            obj, n_views=12, elevations_deg=train_elevs,
            distance=train_dists[0]))
        for extra_d in train_dists[1:]:
            ring = turntable_observations(obj, n_views=12,
                                          elevations_deg=(60.0,),
                                          distance=extra_d)
            for o in ring:
                o["frame_number"] += len(all_obs)
            all_obs += ring
        obs_ids = [
            insert_observation(db, obj.object_id, obs["frame_number"],
                               obs["image"], obs["depth"], obs["mask"],
                               obs["K"], obs["R"], obs["T"])
            for obs in all_obs]
        trainer = TodTrainer(
            "trainer", object_id=obj.object_id,
            json_db=json.dumps({"type": "mem", "collection": "bench"}),
            json_feature_params=json.dumps(
                {"type": feature, "n_features": 600}
                | ({"subpixel": subpixel} if feature == "ORB" else {})),
            dedup_hamming=dedup)
        trainer.process()
        # observations are only needed during this object's training;
        # dropping them keeps the 100-object DB build within host memory
        for doc_id in obs_ids:
            db.delete(doc_id)
        if i in (0, n_objects - 1) or (i + 1) % 20 == 0:
            log(f"  trained {i + 1}/{n_objects} objects "
                f"({time.time()-t0:.1f}s)")
        # milestone snapshots: long incremental builds (1000-object DB is
        # ~600 objects of training) survive a tunnel wedge — a restarted
        # build seeds from the last snapshot instead of starting over
        if cache and (i + 1) % 200 == 0 and (i + 1) < n_objects \
                and i + 1 > len(warm):
            done = {m.object_id: m
                    for m in load_models_for_objects(db, "all")}
            done.update({m.object_id: m for m in warm_models})
            snap_models = [done[o.object_id] for o in objects]
            snap = os.path.join(cache_dir,
                                f"db_n{i + 1}_s{seed}_d{dedup}_{shapes}"
                                f"{sp}{ft}.npz")
            os.makedirs(cache_dir, exist_ok=True)
            np.savez(snap, **{f"d{j}": m.descriptors for j, m in
                              enumerate(snap_models)},
                     **{f"p{j}": m.points for j, m in
                        enumerate(snap_models)})
            log(f"  snapshot {i + 1} models -> {snap}")
    models = load_models_for_objects(db, "all")
    models = {m.object_id: m for m in models}
    models.update({m.object_id: m for m in warm_models})
    models = [models[o.object_id] for o in objects]  # stable object order
    pts = [m.n_points for m in models]
    log(f"trained {len(models)} distinct models in {time.time()-t0:.1f}s, "
        f"points/model min={min(pts)} median={sorted(pts)[len(pts)//2]} "
        f"max={max(pts)}")
    if cache:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez(cache, **{f"d{i}": m.descriptors for i, m in
                           enumerate(models)},
                 **{f"p{i}": m.points for i, m in enumerate(models)})
        log(f"cached models to {cache}")
    return objects, _recompress(models)


def _recompress(models):
    """BENCH_RECOMPRESS='HAMxMM' (e.g. 24x10): extra dedup pass over the
    loaded models — Hamming <= HAM AND 3D <= MM millimeters collapses to the
    first row. A/Bs stronger DB compression (the matcher + tier-1 costs are
    linear in rows) without retraining the cached DB; dedup is per-model and
    order-preserving, so a second pass composes with the train-time one."""
    spec = os.environ.get("BENCH_RECOMPRESS", DEFAULT_RECOMPRESS)
    if not spec or spec.lower() in ("off", "none", "0"):
        return models
    if models and models[0].descriptors.dtype != np.uint8:
        log("recompress skipped: Hamming dedup applies to binary "
            "descriptors only (float/SIFT DB)")
        return models
    from tod_tpu.db.models import TodModel
    from tod_tpu.ops.compress import compress_model

    ham, mm = (int(v) for v in spec.lower().split("x"))
    before = sum(m.n_points for m in models)
    out = []
    for m in models:
        d, p = compress_model(m.descriptors, m.points, ham, mm / 1000.0)
        out.append(TodModel(m.object_id, d, p))
    after = sum(m.n_points for m in out)
    log(f"recompressed (hamming<={ham}, point<={mm}mm): "
        f"{before} -> {after} rows ({after/before:.3f})")
    return out


# sensor-noise presets for BENCH_NOISE (applied identically to both engines
# via build_scenes; see tod_tpu.utils.synthetic.degrade_frame)
NOISE_PRESETS = {
    "kinect": dict(rgb_sigma=6.0, depth_sigma_mm=3.0, depth_dropout=0.05,
                   n_occluders=0),
    "hard": dict(rgb_sigma=10.0, depth_sigma_mm=5.0, depth_dropout=0.10,
                 n_occluders=2),
}


def build_scenes(objects, n_scenes: int):
    """The bench's detection workload: ``n_scenes`` scenes of 3 objects each,
    cycling through the whole object set (shared by bench.py and
    tools/bench_oracle.py so both engines score the SAME placements).
    BENCH_NOISE=kinect|hard degrades every frame with the structured-light
    sensor model (same frames for both engines; clean by default).
    BENCH_DUP=1 places TWO INSTANCES of the scene's first object (slots 0
    and 1 share the object at different poses) — the multi-instance
    repeated-RANSAC workload (GuessGenerator.cpp:192-231 semantics: one
    keypoint feeds at most one detection, so the second instance must be
    found from the matches the first left valid).
    Returns [(image, depth_u16, [(object_id, R, T), ...]), ...]."""
    from tod_tpu.utils.synthetic import (SyntheticObject, compose_scene,
                                         degrade_frame, facing_pose,
                                         presenting_pose)

    noise = os.environ.get("BENCH_NOISE", "")
    if noise and noise not in NOISE_PRESETS:
        raise SystemExit(f"unknown BENCH_NOISE={noise!r}; "
                         f"options: {sorted(NOISE_PRESETS)}")
    dup = os.environ.get("BENCH_DUP", "") == "1"
    rng = np.random.default_rng(7)
    scenes = []
    for s in range(n_scenes):
        trio = [objects[(3 * s + j) % len(objects)] for j in range(3)]
        if dup:
            trio[1] = trio[0]
        # planes are two-sided (facing_pose); solids must present their
        # trained (+z turntable-top) side to the camera
        poses = [facing_pose(rng, z=z) if isinstance(o, SyntheticObject)
                 else presenting_pose(rng, z=z)
                 for o, z in zip(trio, (0.75, 0.9, 1.05))]
        poses[0][1][0] = -0.22
        poses[1][1][0] = 0.02
        poses[2][1][0] = 0.24
        image, depth = compose_scene(trio, poses)
        if noise:
            image, depth = degrade_frame(
                image, depth, np.random.default_rng(1000 + s),
                **NOISE_PRESETS[noise])
        gt = [(o.object_id, R, T) for o, (R, T) in zip(trio, poses)]
        scenes.append((image, depth, gt))
    return scenes


def build_config(n_features: int):
    """The bench's serving operating point, overridable via BENCH_* env
    knobs (shared with tools/diag_mixed.py so diagnosis sees exactly the
    benched configuration)."""
    from tod_tpu.geometry.detection import ActivationConfig, GuessConfig
    from tod_tpu.geometry.ransac import RansacConfig
    from tod_tpu.models import FusedDetectorConfig

    # BENCH_FEATURE=SIFT serves the float/L2 path (detection.ros.ork's
    # pipeline) through the segmented kernel; radius is in unit-norm L2
    # descriptor units there, not Hamming bits
    feature = os.environ.get("BENCH_FEATURE", "ORB")
    default_radius = "50" if feature == "ORB" else "0.9"
    return FusedDetectorConfig(
        n_features=n_features,
        feature=feature,
        # both-sides sub-pixel A/B (BENCH_SUBPIXEL=1 trains AND detects with
        # fractional keypoint coords; default off = reference-parity ints)
        subpixel=(os.environ.get("BENCH_SUBPIXEL", "") == "1"
                  and feature == "ORB"),
        pipeline=os.environ.get("BENCH_PIPELINE", "segmented"),
        q_cap=int(os.environ.get("BENCH_QCAP", "2048")),
        # BENCH_BUCKET=RxC: spatially-bucketed q_cap compaction. Default ON
        # (6x8): identical recall/FPS on clean scenes, +0.04 recall under
        # occluder clutter (BENCH_NOISE=hard A/B, PROGRESS.md round 3).
        # BENCH_BUCKET=off disables (plain response ranking).
        bucket_grid=(None if os.environ.get("BENCH_BUCKET") == "off" else
                     tuple(int(v) for v in os.environ.get(
                         "BENCH_BUCKET", "6x8").split("x"))),
        radius=float(os.environ.get("BENCH_RADIUS", default_radius)),
        k_matches=int(os.environ.get("BENCH_K", "8")),
        # BENCH_COARSE=S enables coarse->fine matching: screen the catalog
        # on a stride-S subsampled sweep, run the exact segmented match on
        # only the top BENCH_FINE objects. The single-chip lever at large
        # catalogs (the full sweep is linear in total rows). 0 = off.
        coarse_stride=int(os.environ.get("BENCH_COARSE", "0")),
        fine_width=int(os.environ.get("BENCH_FINE", "128")),
        # BENCH_COARSE_Q: coarse-pass query subsampling (ranking-only;
        # power of two). The coarse sweep runs near the matcher roofline
        # at large catalogs, and object RANKING does not need every query.
        coarse_q_stride=int(os.environ.get("BENCH_COARSE_Q", "1")),
        # BENCH_TRACK / BENCH_EXPLORE: reserve that many fine-slab slots
        # for tracked (recently-accepted) and exploration (deterministic
        # catalog rotation) objects — the stateful streaming serving mode
        # (conf/detection.serving.ork track_width/explore_width). The
        # streaming FPS loop drives the full state machinery; the one-shot
        # recall pass sees each scene once and so understates the
        # steady-state recall this mode exists for (tools/exp_explore.py
        # measures that).
        track_width=int(os.environ.get("BENCH_TRACK", "0")),
        explore_width=int(os.environ.get("BENCH_EXPLORE", "0")),
        track_ttl=int(os.environ.get("BENCH_TTL", "2")),
        # BENCH_TRACK_CONF: latch gate — only accepts with >= this many
        # unique inliers refresh the tracked/seed state (junk accepts at
        # 8-16 inliers must not fill the tracked slab; measured true weak
        # accepts sit at 22-28, tools/diag_explore021.py)
        track_min_confidence=float(os.environ.get("BENCH_TRACK_CONF", "16")),
        activation=ActivationConfig(
            m_cap=int(os.environ.get("BENCH_ACT_CAP", "192")),
            # tier-1 128 hypotheses suffice under the prescreen (SWEEP_R4A
            # acthyp-128: recall 1.000) — part of the shrunk-budget default
            n_hypotheses=int(os.environ.get("BENCH_ACT_HYP", "128")),
            object_batch=20,
            # BENCH_PRESCREEN=P bounds tier-1 (the one linear-in-catalog
            # stage) to the top-P objects by margin mass; 0 = score all.
            # Default 32 (faster AND higher recall at every measured DB
            # size <= 400 — screening score-junk out of tier-1 also
            # unblocks weak-texture activations), growing ~O/12 beyond:
            # at 800 objects P=64 recovered 2 activation misses at
            # identical FPS (PROGRESS.md scaling table)
            prescreen=int(os.environ.get(
                "BENCH_PRESCREEN",
                str(max(32, int(os.environ.get("BENCH_OBJECTS", "100"))
                        // 12)))),
            # BENCH_ACT_RESERVE: tier-2 slots guaranteed to score-qualified
            # non-tracked candidates when tracked force-active slots exist
            # (a junk-latch-filled slab displaced obj021 from tier-2 at the
            # 1000-object frontier; 0 restores the saturating cut)
            active_reserve=int(os.environ.get("BENCH_ACT_RESERVE", "4"))),
        guess=GuessConfig(
            # tier-2 budgets re-sized under the P=32 prescreen (SWEEP_R4A
            # combo point: 768/192 -> 512/128 holds recall 1.000 and gains
            # ~4 FPS at the 100-object point; junk that used to need the
            # budget headroom is screened out before RANSAC ever sees it)
            ransac=RansacConfig(
                n_hypotheses=int(os.environ.get("BENCH_HYP", "512")),
                continuation_hypotheses=int(
                    os.environ.get("BENCH_CONT", "128")),
                min_inliers=8, max_instances=3, tight_final_fit=True),
            # M=384 beats 512 on BOTH axes with margin-ordered caps (junk
            # tail drops faster than correct): recall .917 @ 34 FPS
            max_matches_per_object=int(os.environ.get("BENCH_M", "384")),
            object_batch=8,
            max_active_objects=int(os.environ.get("BENCH_ACTIVE", "16"))))


def main():
    n_objects = int(os.environ.get("BENCH_OBJECTS", "100"))
    n_frames = int(os.environ.get("BENCH_FRAMES", "30"))
    n_features = int(os.environ.get("BENCH_FEATURES", "5000"))

    import jax
    try:
        log(f"devices: {wait_for_devices()}")
    except RuntimeError as e:
        # Unrecoverable tunnel outage: fail HONESTLY but informatively —
        # value 0 says "nothing was measured in this run"; last_measured
        # carries the most recent successful run's JSON (written below) so
        # the record still points at real, clearly-labeled numbers.
        last_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_LAST.json")
        feature = os.environ.get("BENCH_FEATURE", "ORB")
        out = {"metric": (f"detection_fps_640x480_{n_objects}obj"
                          + ("" if feature == "ORB"
                             else f"_{feature.lower()}")),
               "value": 0.0, "unit": "fps", "vs_baseline": 0.0,
               "error": f"TPU unavailable: {e}"}
        if os.path.exists(last_path):
            with open(last_path) as f:
                out["last_measured"] = json.load(f)
        print(json.dumps(out), flush=True)
        return

    from tod_tpu.models import FusedDetector
    from tod_tpu.utils.synthetic import DEFAULT_K

    objects, all_models = build_db(n_objects)
    n_desc = sum(m.n_points for m in all_models)
    log(f"database: {len(all_models)} objects, {n_desc} descriptors")

    # compiled-Pallas parity gate: the fused Mosaic kernel must match the
    # XLA matcher EXACTLY on this hardware before any FPS is reported
    # (tests run the kernel interpreted on CPU; this is the real thing)
    if jax.default_backend() != "cpu" \
            and all_models[0].descriptors.dtype != np.uint8:
        # float/SIFT DB: gate the L2 segmented kernel instead (the only
        # Pallas kernel the L2 serving path dispatches)
        import jax.numpy as jnp
        from tod_tpu.ops.pallas.segmented_l2 import (object_top1_l2_fused,
                                                     object_top1_l2_xla,
                                                     pack_segmented_l2,
                                                     quantize_descriptors)

        sdb_g = pack_segmented_l2(all_models[:8])
        rng_p = np.random.default_rng(3)
        qf = rng_p.random((512, 128)).astype(np.float32)
        qf /= np.linalg.norm(qf, axis=1, keepdims=True)
        qi = quantize_descriptors(jnp.asarray(qf))
        dg_f, ig_f = jax.jit(object_top1_l2_fused)(qi, sdb_g)
        dg_x, ig_x = jax.jit(object_top1_l2_xla)(qi, sdb_g)
        if not ((np.asarray(dg_f) == np.asarray(dg_x)).all()
                and (np.asarray(ig_f) == np.asarray(ig_x)).all()):
            raise AssertionError("segmented L2 Pallas kernel diverges from "
                                 "the XLA reference on this hardware")
        log("pallas parity gate: segmented L2 kernel exact vs XLA ✓")

        if int(os.environ.get("BENCH_COARSE", "0")) > 0:
            from tod_tpu.ops.pallas.segmented_l2 import (
                max_chunks_per_object_f, object_top1_l2_gathered_fused,
                object_top1_l2_gathered_xla)

            sel_g = jnp.asarray(np.array([5, 2, -1, 7, 0], np.int32))
            maxc = max_chunks_per_object_f(sdb_g)
            dh_f, ih_f = jax.jit(lambda qq: object_top1_l2_gathered_fused(
                qq, sdb_g, sel_g, maxc))(qi)
            dh_x, ih_x = jax.jit(lambda qq: object_top1_l2_gathered_xla(
                qq, sdb_g, sel_g))(qi)
            if not ((np.asarray(dh_f) == np.asarray(dh_x)).all()
                    and (np.asarray(ih_f) == np.asarray(ih_x)).all()):
                raise AssertionError("gathered L2 kernel diverges from the "
                                     "XLA reference on this hardware")
            log("pallas parity gate: gathered (coarse->fine) L2 kernel "
                "exact vs XLA ✓")

    if jax.default_backend() != "cpu" \
            and all_models[0].descriptors.dtype == np.uint8:
        from tod_tpu.ops.matching import hamming_topk, pad_db
        from tod_tpu.ops.pallas.hamming import (hamming_topk_fused,
                                                pack_db_bits, pad_queries)
        import jax.numpy as jnp

        rng_p = np.random.default_rng(3)
        # fixed 512-row query block (multiple of 128) regardless of how many
        # descriptors the first model actually has
        q0 = all_models[0].descriptors[:256]
        qs = np.concatenate([q0, rng_p.integers(0, 256, (512 - len(q0), 32),
                                                np.uint8)])
        db_p, nv = pad_db(np.concatenate(
            [m.descriptors for m in all_models[:8]]).astype(np.uint8), 2048)
        bits_t, pop = pack_db_bits(jnp.asarray(db_p), jnp.int8)
        qp, qn = pad_queries(qs)
        d_f, i_f = hamming_topk_fused(jnp.asarray(qp), bits_t, pop, nv,
                                      k=5, radius=35.0, db_chunk=2048)
        d_x, i_x = hamming_topk(jnp.asarray(qs), jnp.asarray(db_p), nv,
                                k=5, chunk=2048)
        keep = np.asarray(d_x) <= 35.0
        ok_d = (np.asarray(d_f)[:qn] == np.where(keep, np.asarray(d_x),
                                                 1e9)).all()
        ok_i = (np.asarray(i_f)[:qn] == np.where(keep, np.asarray(i_x),
                                                 -1)).all()
        if not (ok_d and ok_i):
            raise AssertionError("fused Pallas kernel diverges from the XLA "
                                 "matcher on this hardware")
        log("pallas parity gate: compiled fused kernel exact vs XLA ✓")

        # segmented kernel gate: compiled per-object top-1 vs XLA reference
        from tod_tpu.ops.pallas.segmented import (object_top1_fused,
                                                  object_top1_xla,
                                                  pack_segmented)

        sdb_g = pack_segmented(all_models[:8])
        qg = jnp.asarray(qs)
        dg_f, ig_f = jax.jit(object_top1_fused)(qg, sdb_g)
        dg_x, ig_x = jax.jit(object_top1_xla)(qg, sdb_g)
        if not ((np.asarray(dg_f) == np.asarray(dg_x)).all()
                and (np.asarray(ig_f) == np.asarray(ig_x)).all()):
            raise AssertionError("segmented Pallas kernel diverges from the "
                                 "XLA reference on this hardware")
        log("pallas parity gate: segmented per-object kernel exact vs XLA ✓")

        if int(os.environ.get("BENCH_COARSE", "0")) > 0:
            # coarse->fine mode also dispatches the gathered kernel: gate it
            from tod_tpu.ops.pallas.segmented import (
                max_chunks_per_object, object_top1_gathered_fused,
                object_top1_gathered_xla)

            sel_g = jnp.asarray(np.array([5, 2, -1, 7, 0], np.int32))
            maxc = max_chunks_per_object(sdb_g)
            dh_f, ih_f = jax.jit(lambda qq: object_top1_gathered_fused(
                qq, sdb_g, sel_g, maxc))(qg)
            dh_x, ih_x = jax.jit(lambda qq: object_top1_gathered_xla(
                qq, sdb_g, sel_g))(qg)
            if not ((np.asarray(dh_f) == np.asarray(dh_x)).all()
                    and (np.asarray(ih_f) == np.asarray(ih_x)).all()):
                raise AssertionError("gathered segmented kernel diverges "
                                     "from the XLA reference on this "
                                     "hardware")
            log("pallas parity gate: gathered (coarse->fine) kernel exact "
                "vs XLA ✓")

    # Serving pipeline: per-object segmented matching + tier-1 geometric
    # activation (tools/diag_* measurements: global kNN keeps only 12-16
    # correct unique keypoints per present object vs 49-72 per-object, and
    # match-count activation is near-random on weakly-distinctive textures).
    # radius 50 per tools/exp_recall3.py; min_inliers 8 per
    # conf/detection.ork:41.
    cfg = build_config(n_features)
    det = FusedDetector(all_models, cfg)

    # pre-render scenes of 3 objects each, cycling through the whole DB so
    # recall samples many distinct objects (not a favorable fixed trio)
    n_scenes = int(os.environ.get("BENCH_SCENES", "8"))
    scenes = build_scenes(objects, n_scenes)
    log(f"{n_scenes} scenes rendered")

    # pre-upload frames to the device (serving keeps frames device-resident;
    # the measured quantity is the on-chip pipeline, not PCIe/tunnel uploads)
    device_scenes = [det.prepare_frame(img, dep, DEFAULT_K)
                     for img, dep, _ in scenes]

    # detection quality: recall@2cm over every ground-truth placement
    # (BASELINE.md tracked metric "pose recall@2cm")
    t0 = time.time()
    hits, misses, rot_errs = 0, [], []
    n_accepted, n_true_pos = 0, 0
    scene_results = []
    for image, depth, gt in scenes:
        found = det.detect(image, depth, DEFAULT_K)
        scene_results.append((found, gt))
        by_id = {}
        for r in found:
            by_id.setdefault(r.object_id, []).append(r)
        # precision: an accepted pose is TRUE iff within 2cm of a same-id
        # ground-truth placement in this scene (recall alone hides junk
        # poses a downstream grasp planner would act on)
        n_accepted += len(found)
        for r in found:
            if any(oid == r.object_id
                   and float(np.linalg.norm(r.T - gt_T)) <= 0.02
                   for oid, _, gt_T in gt):
                n_true_pos += 1
        for oid, gt_R, gt_T in gt:
            best, best_dt = None, 1e9
            for r in by_id.get(oid, []):
                dt = float(np.linalg.norm(r.T - gt_T))
                if dt < best_dt:
                    best, best_dt = r, dt
            if best is not None and best_dt <= 0.02:
                hits += 1
                tr = (np.trace(best.R @ gt_R.T) - 1.0) / 2.0
                rot_errs.append(float(np.degrees(
                    np.arccos(min(1.0, max(-1.0, tr))))))
            else:
                misses.append((oid, round(best_dt, 4)
                               if best is not None else None))
    n_placed = 3 * n_scenes
    recall = hits / n_placed
    log(f"recall@2cm: {hits}/{n_placed} = {recall:.3f} "
        f"(median rot err {np.median(rot_errs):.2f} deg)"
        if rot_errs else f"recall@2cm: {hits}/{n_placed}")
    if misses:
        log(f"missed placements: {misses}")
    precision = n_true_pos / n_accepted if n_accepted else 0.0
    log(f"precision: {n_true_pos}/{n_accepted} accepted poses within 2cm "
        f"of a same-id placement = {precision:.3f}")
    # operating curve: gate accepts on pose confidence (= inlier count)
    # post-hoc — what a serving deployment would threshold on
    curve = {}
    for th in (8, 12, 16, 20, 24, 32):
        tp = acc = h = 0
        for found, gt in scene_results:
            kept = [r for r in found if r.confidence >= th]
            acc += len(kept)
            for r in kept:
                if any(oid == r.object_id
                       and float(np.linalg.norm(r.T - gt_T)) <= 0.02
                       for oid, _, gt_T in gt):
                    tp += 1
            for oid, _, gt_T in gt:
                if any(r.object_id == oid
                       and float(np.linalg.norm(r.T - gt_T)) <= 0.02
                       for r in kept):
                    h += 1
        curve[th] = (round(h / n_placed, 4),
                     round(tp / acc, 4) if acc else 1.0)
    log("confidence-gate curve (min_conf: recall, precision): "
        + ", ".join(f"{t}: {r:.3f}/{p:.3f}" for t, (r, p) in curve.items()))
    # second headline row at the conf/detection.serving.ork default gate
    # (min_confidence: 24) — the deployment operating point, reported next
    # to the ungated reference-parity row (VERDICT r3 item 2)
    gate = int(os.environ.get("BENCH_GATE", "24"))
    g_rec, g_prec = curve.get(gate, (None, None))
    if g_rec is not None:
        log(f"gated headline v1 (min_confidence={gate}): recall "
            f"{g_rec:.3f} / precision {g_prec:.3f} — the serving.ork "
            "ships the fused min_quality gate (curve below)")
    # quality (confidence v2) curve: the fused statistic (inliers weighted
    # by pose sharpness + inlier-clique depth, models/fused.py
    # confidence_v2) separates 24+-inlier junk from true poses that the
    # one-dimensional inlier gate cannot (tools/diag_conf2.py measurement)
    q_curve = {}
    q_vals = sorted({round(r.quality) for found, _ in scene_results
                     for r in found})
    for th in q_vals[::max(1, len(q_vals) // 16)]:
        tp = acc = h = 0
        for found, gt in scene_results:
            kept = [r for r in found if r.quality >= th]
            acc += len(kept)
            for r in kept:
                if any(oid == r.object_id
                       and float(np.linalg.norm(r.T - gt_T)) <= 0.02
                       for oid, _, gt_T in gt):
                    tp += 1
            for oid, _, gt_T in gt:
                if any(r.object_id == oid
                       and float(np.linalg.norm(r.T - gt_T)) <= 0.02
                       for r in kept):
                    h += 1
        q_curve[th] = (round(h / n_placed, 4),
                       round(tp / acc, 4) if acc else 1.0)
    if q_curve:
        log("quality-gate curve v2 (min_quality: recall, precision): "
            + ", ".join(f"{t}: {r:.3f}/{p:.3f}"
                        for t, (r, p) in q_curve.items()))
        # best v2 operating point: highest precision among gates that keep
        # recall >= the v1 gated headline's recall
        floor = g_rec if g_rec is not None else recall
        cands = [(p, r, t) for t, (r, p) in q_curve.items() if r >= floor]
        if cands:
            bp, br, bt = max(cands)
            log(f"best v2 gate at recall >= {floor:.3f}: min_quality {bt} "
                f"-> recall {br:.3f} / precision {bp:.3f}")
    log(f"(recall pass incl. compile: {time.time()-t0:.1f}s)")

    # batched throughput — OPT-IN (BENCH_BATCH>=2): streaming wins anyway
    # (vmapped while_loop lane stalls), and the batched segmented geometry
    # program has compiled for up to ~19 MINUTES on a cold compile server —
    # not worth the risk in unattended runs.
    import jax
    import jax.numpy as jnp

    fps_batch = 0.0
    batch = int(os.environ.get("BENCH_BATCH", "0"))
    if batch >= 2:
        grays = jnp.stack([device_scenes[i % len(device_scenes)][0]
                           for i in range(batch)])
        depths = jnp.stack([device_scenes[i % len(device_scenes)][1]
                            for i in range(batch)])
        Ks = jnp.stack([device_scenes[i % len(device_scenes)][2]
                        for i in range(batch)])
        t0 = time.time()
        _, out = det.detect_batch_raw(grays, depths, Ks)
        np.asarray(jax.device_get(out.accepted))  # hard sync
        log(f"compile+first batch: {time.time()-t0:.1f}s")

        t0 = time.time()
        iters = max(1, n_frames // batch)
        for _ in range(iters):
            _, out = det.detect_batch_raw(grays, depths, Ks)
        np.asarray(jax.device_get(out.accepted))  # hard sync via download
        dt = time.time() - t0
        fps_batch = iters * batch / dt
        log(f"{iters * batch} frames (batch={batch}) in {dt:.2f}s "
            f"-> {fps_batch:.2f} FPS")

    # streaming mode: per-frame staged dispatches, async-pipelined
    _, out = det.detect_raw(*device_scenes[0])
    np.asarray(jax.device_get(out.accepted))
    t0 = time.time()
    for f in range(n_frames):
        _, out = det.detect_raw(*device_scenes[f % len(device_scenes)])
    np.asarray(jax.device_get(out.accepted))
    dt = time.time() - t0
    fps_stream = n_frames / dt
    log(f"{n_frames} frames (streaming) in {dt:.2f}s -> {fps_stream:.2f} FPS")
    fps = max(fps_batch, fps_stream)

    # per-frame LATENCY: one frame dispatched, hard-synced before the next —
    # what an interactive 30 Hz camera loop feels (VERDICT r2 item 5).
    # Through the axon tunnel every sync pays the ~25-30 ms RTT, which an
    # on-device caller would not; reported as-is (no RTT subtraction).
    # Measured through the FULL detect() API — including the packed
    # one-download result extraction (utils/transfer.py) and host
    # PoseResult construction — not a bare sync on one output array, so
    # the number is what a caller of the public API actually waits.
    det.detect(*device_scenes[0])
    lat = []
    for f in range(min(n_frames, 20)):
        t0 = time.time()
        det.detect(*device_scenes[f % len(device_scenes)])
        lat.append(time.time() - t0)
    lat_ms = np.asarray(lat) * 1000.0
    lat_p50, lat_p95 = np.percentile(lat_ms, [50, 95])
    # measure the pure sync overhead (trivial dispatch + tiny download):
    # the floor any hard-synced number pays through the tunnel; an
    # on-device caller pays ~0, so latency - sync_overhead estimates the
    # interactive rate production hardware would see. The downloaded array
    # must be FRESH each rep — jax caches a fetched array host-side
    # (_npy_value), so re-fetching the same array measures a dict lookup,
    # not the tunnel round trip.
    sync = []
    tiny_fn = jax.jit(lambda x, i: x.astype(jnp.int32).sum() + i)
    np.asarray(jax.device_get(tiny_fn(out.accepted, 0)))  # warm compile
    for i in range(10):
        t0 = time.time()
        np.asarray(jax.device_get(tiny_fn(out.accepted, i)))
        sync.append(time.time() - t0)
    sync_ms = float(np.percentile(np.asarray(sync) * 1000.0, 50))
    log(f"per-frame latency: p50 {lat_p50:.1f} ms / p95 {lat_p95:.1f} ms "
        f"(hard sync per frame; measured sync overhead {sync_ms:.1f} ms "
        f"is tunnel RTT an on-device caller would not pay)")

    # secondary: matcher-only throughput vs CPU brute force (the global
    # exact-kNN matcher, independent of the serving pipeline choice;
    # Hamming-only — the L2 path's kernel is gated above instead)
    try:
        if all_models[0].descriptors.dtype != np.uint8:
            raise RuntimeError("float DB (Hamming matcher n/a)")
        import jax.numpy as jnp
        from tod_tpu.native import hamming_knn_cpu
        from tod_tpu.models.fused import match_against_db, pack_models
        from tod_tpu.ops.pallas.hamming import pad_queries

        gdb = (det.db if not det.segmented
               else pack_models(all_models, cfg.db_chunk)[0])
        q = np.random.default_rng(1).integers(
            0, 256, (n_features, 32), dtype=np.uint8)
        qp, _ = pad_queries(q)
        jq = jnp.asarray(qp)
        # db passed as an ARGUMENT: closing over it bakes 300+MB of
        # constants into the HLO and the tunnel rejects the upload (413)
        fn = jax.jit(lambda a, db: match_against_db(a, db, cfg))
        float(fn(jq, gdb)[0].sum())  # hard sync (block_until_ready lies)
        t0 = time.time()
        reps = 10
        for _ in range(reps):
            d, _ = fn(jq, gdb)
        float(d.sum())
        tpu_rate = reps * len(qp) * n_desc / (time.time() - t0)

        n_cpu_db = min(n_desc, 100_000)
        db_cpu = np.asarray(jax.device_get(gdb.descriptors))[:n_cpu_db]
        t0 = time.time()
        hamming_knn_cpu(q[:1024], db_cpu, k=5)
        cpu_rate = 1024 * n_cpu_db / (time.time() - t0)
        log(f"matcher: TPU {tpu_rate/1e9:.2f} G pairs/s vs CPU "
            f"{cpu_rate/1e9:.3f} G pairs/s -> {tpu_rate/cpu_rate:.1f}x")
    except Exception as e:  # secondary metric must not break the bench
        log(f"matcher comparison skipped: {e}")

    out = {
        "metric": (f"detection_fps_640x480_{n_objects}obj"
                   + ("" if cfg.feature == "ORB"
                      else f"_{cfg.feature.lower()}")),
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 4),
        "recall_at_2cm": round(recall, 4),
        "precision_at_2cm": round(precision, 4),
        "confidence_curve": {str(t): list(v) for t, v in curve.items()},
        "quality_curve_v2": {str(t): list(v) for t, v in q_curve.items()},
        "latency_ms_p50": round(float(lat_p50), 2),
        "latency_ms_p95": round(float(lat_p95), 2),
        "sync_overhead_ms": round(sync_ms, 2),
        "shapes": os.environ.get("BENCH_SHAPES", "mixed"),
    }
    if g_rec is not None:
        out["gated"] = {"min_confidence": gate, "recall_at_2cm": g_rec,
                        "precision_at_2cm": g_prec}
    if os.environ.get("BENCH_NOISE"):
        out["noise"] = os.environ["BENCH_NOISE"]
    if os.environ.get("BENCH_DUP") == "1":
        out["dup_instances"] = True   # multi-instance workload variant
    # reference-semantics CPU baseline over the same workload, if the oracle
    # bench has been run (tools/bench_oracle.py; VERDICT r2 item 1)
    oracle_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "ORACLE_BENCH.json")
    if os.path.exists(oracle_path):
        with open(oracle_path) as f:
            oracle = json.load(f)
        if (oracle.get("n_objects") == n_objects
                and oracle.get("shapes", "plane") == out["shapes"]
                and oracle.get("noise", "") ==
                os.environ.get("BENCH_NOISE", "")
                and os.environ.get("BENCH_DUP") != "1"):
            out["oracle_recall_at_2cm"] = oracle.get("recall_at_2cm")
            out["oracle_cpu_fps"] = oracle.get("cpu_fps")
            if oracle.get("precision_at_2cm") is not None:
                out["oracle_precision_at_2cm"] = oracle["precision_at_2cm"]
                oc = oracle.get("confidence_curve", {})
                if str(gate) in oc:
                    out["oracle_gated"] = {
                        "min_confidence": gate,
                        "recall_at_2cm": oc[str(gate)][0],
                        "precision_at_2cm": oc[str(gate)][1]}
    # measured SIFT/L2 serving numbers over the same workload, if the SIFT
    # bench has been run (BENCH_FEATURE=SIFT writes SIFT_BENCH.json)
    sift_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "SIFT_BENCH.json")
    if cfg.feature == "ORB" and os.path.exists(sift_path):
        with open(sift_path) as f:
            sift = json.load(f)
        if (sift.get("metric")
                == f"detection_fps_640x480_{n_objects}obj_sift"
                and sift.get("shapes") == out["shapes"]):
            out["sift_fps"] = sift.get("value")
            out["sift_recall_at_2cm"] = sift.get("recall_at_2cm")
    print(json.dumps(out), flush=True)
    # durable record of the most recent successful measurement (read back
    # by the tunnel-outage fallback above)
    last_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_LAST.json")
    with open(last_path, "w") as f:
        json.dump(dict(out, measured_at=time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                                      time.gmtime())), f)
    if cfg.feature == "SIFT":
        with open(sift_path, "w") as f:
            json.dump(out, f)


if __name__ == "__main__":
    main()
