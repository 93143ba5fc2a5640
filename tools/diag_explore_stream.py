"""Streaming replay of the explore arm with per-frame obj021 instrumentation.

tools/diag_explore021.py shows obj021 at 1000 objects activating 10/10 keys
when handed an exploration slot, yet exp_explore's end-to-end arm never
sees it (first_seen null, rounds 3-4).  This replays the exact exp_explore
stream on the scene that places obj021 and, on the frames where the
exploration rotation covers it, recomputes the staged pipeline with the
SAME rng key the streaming loop is about to consume — so the tier-1
score/rank/acceptance printed here are bit-identical to what the loop's
frame computed, not a fresh-key approximation.

Env: BENCH_OBJECTS (1000), EXPLORE_STRIDE/WIDTH/E/T (16/64/16/16 — the
frontier config), BENCH_* knobs as bench.build_config, N_REPEATS streams
(default 3, distinct detector seeds).  TPU by default (DIAG_PLATFORM=cpu
for host).  Run post-queue: one TPU client at a time.
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np  # noqa: E402

import jax  # noqa: E402

if os.environ.get("DIAG_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["DIAG_PLATFORM"])

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from tod_tpu.geometry.detection import AGE_NEVER, detect_frame_gathered  # noqa: E402
from tod_tpu.models import FusedDetector  # noqa: E402
from tod_tpu.utils.synthetic import DEFAULT_K  # noqa: E402


def main():
    if not os.environ.get("DIAG_PLATFORM"):
        bench.log(f"devices: {bench.wait_for_devices()}")
    n_objects = int(os.environ.get("BENCH_OBJECTS", "1000"))
    target_oid = os.environ.get("DIAG_OBJECT", "obj021")
    stride = int(os.environ.get("EXPLORE_STRIDE", "16"))
    width = int(os.environ.get("EXPLORE_WIDTH", "64"))
    e_width = int(os.environ.get("EXPLORE_E", "16"))
    t_width = int(os.environ.get("EXPLORE_T", "16"))
    n_repeats = int(os.environ.get("N_REPEATS", "3"))
    objects, models = bench.build_db(n_objects)
    base = bench.build_config(int(os.environ.get("BENCH_FEATURES", "5000")))
    cfg = dataclasses.replace(base, coarse_stride=stride, fine_width=width,
                              explore_width=e_width, track_width=t_width)
    oid_to_idx = {m.object_id: i for i, m in enumerate(models)}
    target = oid_to_idx[target_oid]
    scene_idx = target // 3
    scenes = bench.build_scenes(objects, scene_idx + 1)
    image, depth, gt = scenes[scene_idx]
    gt_ids = [oid for oid, _, _ in gt]
    gt_T = next(T for oid, _R, T in gt if oid == target_oid)
    cycle = -(-n_objects // e_width)
    n_stream = cycle + 3
    min_score = cfg.activation.min_score
    n_active = cfg.guess.max_active_objects

    det = FusedDetector(models, cfg)
    frame = det.prepare_frame(image, depth, DEFAULT_K)
    s1, _, _ = det._stages
    c1, c2, _c3 = det._coarse
    xy, qp, dsc, ok = s1(*frame)

    def geom_fn(k, dist, rows, sel, force, fact, seeds):
        return detect_frame_gathered(
            k, dist, rows, sel, ok, qp, xy, det.sdb.points,
            det.sdb.obj_start, det.sdb.spans, cfg.guess, cfg.activation,
            cfg.radius, force, t_width + e_width, fact, seeds)

    geom = jax.jit(geom_fn)

    for rep in range(n_repeats):
        det._key = jax.random.key(123 + rep)
        det._age = jnp.full_like(det._age, AGE_NEVER)
        det._explore_pos = 0
        det._last_coarse_sel = None
        print(f"--- stream {rep} (seed {123 + rep}) ---", flush=True)
        seen = {}
        for t in range(n_stream):
            pos = det._explore_pos
            explored = [(pos + i) % n_objects for i in range(e_width)]
            probe = target in explored
            if probe:
                # replay this frame's staged pipeline with the key the
                # loop is ABOUT to consume (split without mutating)
                _, sub = jax.random.split(det._key)
                # _explore_ids() advances the rotation cursor — snapshot
                # and restore so the loop's own call sees the same window
                explore_ids = det._explore_ids()
                det._explore_pos = pos
                from tod_tpu.models.fused import (_jit_tracked,
                                                  _jit_tracked_needy)
                trk = (_jit_tracked_needy(det._age, det._last_coarse_sel,
                                          t_width, cfg.track_ttl)
                       if det._last_coarse_sel is not None else
                       _jit_tracked(det._age, t_width, cfg.track_ttl))
                sel, force, fact = c1(dsc, ok, det.cdb, trk, explore_ids)
                dist, rows = c2(dsc, det.sdb, sel)
                from tod_tpu.models.fused import _jit_seeds
                seeds = _jit_seeds(det._age, det._last_R, det._last_T,
                                   cfg.track_ttl)
                scores, detn = geom(sub, dist, rows, sel, force, fact,
                                    seeds)
                s_np = np.asarray(scores)
                rank = int((s_np > s_np[target]).sum())
                sel_np = np.asarray(sel)
                in_slab = bool((sel_np == target).any())
                acc = np.asarray(detn.accepted[target]).astype(bool)
                terr = (np.linalg.norm(
                    np.asarray(detn.T[target])[acc] - gt_T, axis=-1)
                    if acc.any() else np.asarray([]))
                print(f"  t={t}: obj021 explored; in_slab={in_slab} "
                      f"t1={int(s_np[target])} rank={rank} "
                      f"(min {min_score}, top {n_active}) "
                      f"replay accepted={int(acc.sum())} "
                      f"terr={np.round(terr, 4).tolist()}", flush=True)
            found = det.detect(*frame)
            ids = {r.object_id for r in found}
            for g_oid, _gR, gtT in gt:
                if any(r.object_id == g_oid
                       and float(np.linalg.norm(r.T - gtT)) <= 0.02
                       for r in found):
                    seen.setdefault(g_oid, t)
            if probe:
                hit = any(r.object_id == target_oid
                          and float(np.linalg.norm(r.T - gt_T)) <= 0.02
                          for r in found)
                print(f"        loop frame result: found {sorted(ids & set(gt_ids))} "
                      f"target hit2cm={hit}", flush=True)
        print(f"  first_seen: {[(oid, seen.get(oid)) for oid in gt_ids]}",
              flush=True)


if __name__ == "__main__":
    main()
