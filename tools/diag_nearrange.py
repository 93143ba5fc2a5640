"""Why did the widened default give up the near-range stress bins?

STRESS_POSE.json at the shipped default (widened 2-distance/4-ring plan +
16x5 recompression): recall 0.833 at z=0.5 m and z=1.0 m vs 0.917-1.0 on
the classic narrow plan. This reproduces those exact bins on CPU
(stress_pose geometry: tilt 15 deg, bin-cycled objects, deterministic
azimuths), finds the missing placements, and stages each miss through the
pipeline: tier-1 prescreen rank, tier-1 score vs the activation cut,
tier-2 accept + pose error — then A/Bs the same placements against the
classic-plan DB to separate plan-induced dilution from placement
difficulty.

Usage: python tools/diag_nearrange.py          (CPU)
  DIAG_Z=0.5,1.0   bins to run (default)
  DIAG_AB=1        also run the classic-plan DB A/B (default 1)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("DIAG_PLATFORM", "cpu"))

import bench  # noqa: E402
from stress_pose import stress_pose  # noqa: E402

Z_BINS = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75, 2.0)


def run_bins(objects, models, zs, per_bin, label):
    import dataclasses

    from tod_tpu.models import FusedDetector
    from tod_tpu.utils.synthetic import DEFAULT_K, compose_scene

    cfg = bench.build_config(int(os.environ.get("BENCH_FEATURES", "5000")))
    det = FusedDetector(models, cfg)
    n = len(models)
    misses = []
    for z in zs:
        bi = Z_BINS.index(z)
        picks = [((6 + bi) * per_bin + j) % n for j in range(per_bin)]
        hits = 0
        for j, oi in enumerate(picks):
            obj = objects[oi]
            az = 2 * np.pi * j / len(picks)
            R, T = stress_pose(obj, 15.0, z, az)
            image, depth = compose_scene([obj], [(R, T)])
            found = det.detect(image, depth, DEFAULT_K)
            dts = [float(np.linalg.norm(r.T - T)) for r in found
                   if r.object_id == obj.object_id]
            hit = bool(dts) and min(dts) <= 0.02
            hits += hit
            if not hit:
                misses.append((z, oi, az, min(dts) if dts else None))
                bench.log(f"  [{label}] z={z} MISS {obj.object_id} "
                          f"(az {np.degrees(az):.0f} deg, best dt "
                          f"{min(dts):.4f})" if dts else
                          f"  [{label}] z={z} MISS {obj.object_id} "
                          f"(az {np.degrees(az):.0f} deg, no accept)")
        bench.log(f"[{label}] z={z}: {hits}/{per_bin}")
    return det, cfg, misses


def stage_trace(det, cfg, objects, misses):
    """Tier-by-tier trace of each missed placement."""
    from tod_tpu.geometry.detection import (detect_frame_segmented,
                                            prescreen_scores)
    from tod_tpu.utils.synthetic import DEFAULT_K, compose_scene
    import jax.numpy as jnp

    s1, s2, _s3 = det._stages
    for z, oi, az, best_dt in misses:
        obj = objects[oi]
        R, T = stress_pose(obj, 15.0, z, az)
        image, depth = compose_scene([obj], [(R, T)])
        gray, depth_j, K_j = det.prepare_frame(image, depth, DEFAULT_K)
        xy, qp, dsc, ok = s1(gray, depth_j, K_j)
        dist, rows = s2(dsc, det.sdb)
        d_np = np.asarray(dist)
        ok_np = np.asarray(ok)
        target = oi
        within = ((d_np[:, target] <= cfg.radius) & ok_np).sum()
        level = np.median(d_np, axis=1)
        pre = np.asarray(prescreen_scores(
            jnp.asarray(d_np), jnp.asarray(level), jnp.asarray(ok_np),
            cfg.radius, cfg.activation.prescreen_top))
        p_rank = int((pre > pre[target]).sum())
        scores, detn = jax.jit(
            lambda k: detect_frame_segmented(
                k, dist, rows, ok, qp, xy, det.sdb.points,
                det.sdb.obj_start, det.sdb.spans, cfg.guess,
                cfg.activation, cfg.radius))(jax.random.key(7))
        s_np = np.asarray(scores)
        t_rank = int((s_np > s_np[target]).sum())
        acc = np.asarray(detn.accepted[target]).astype(bool)
        dts = (np.linalg.norm(np.asarray(detn.T[target])[acc] - T, axis=-1)
               if acc.any() else np.asarray([]))
        bench.log(f"  trace z={z} {obj.object_id}: in-radius {within} "
                  f"prescreen rank {p_rank}/{cfg.activation.prescreen} "
                  f"t1 score {int(s_np[target])} rank {t_rank} "
                  f"(min {cfg.activation.min_score}, top "
                  f"{cfg.guess.max_active_objects}) accepts "
                  f"{int(acc.sum())} dts {np.round(dts, 4).tolist()}")


def main():
    zs = [float(v) for v in os.environ.get("DIAG_Z", "0.5,1.0").split(",")]
    per_bin = int(os.environ.get("STRESS_PER_BIN", "12"))
    n = int(os.environ.get("BENCH_OBJECTS", "100"))

    objects, models = bench.build_db(n)
    det, cfg, misses = run_bins(objects, models, zs, per_bin, "default")
    bench.log(f"default-plan misses: {[(z, objects[oi].object_id)
                                       for z, oi, _a, _d in misses]}")
    stage_trace(det, cfg, objects, misses)

    if os.environ.get("DIAG_AB", "1") == "1" and misses:
        os.environ["BENCH_TRAIN_DIST"] = "0.8"
        os.environ["BENCH_TRAIN_ELEV"] = "85,60,35"
        objects_c, models_c = bench.build_db(n)
        from tod_tpu.models import FusedDetector
        from tod_tpu.utils.synthetic import DEFAULT_K, compose_scene
        det_c = FusedDetector(models_c, bench.build_config(
            int(os.environ.get("BENCH_FEATURES", "5000"))))
        for z, oi, az, _dt in misses:
            obj = objects_c[oi]
            R, T = stress_pose(obj, 15.0, z, az)
            image, depth = compose_scene([obj], [(R, T)])
            found = det_c.detect(image, depth, DEFAULT_K)
            dts = [float(np.linalg.norm(r.T - T)) for r in found
                   if r.object_id == obj.object_id]
            hit = bool(dts) and min(dts) <= 0.02
            bench.log(f"  [classic] z={z} {obj.object_id}: "
                      f"{'HIT' if hit else 'MISS'} "
                      f"(best dt {min(dts):.4f})" if dts else
                      f"  [classic] z={z} {obj.object_id}: no accept")


if __name__ == "__main__":
    main()
