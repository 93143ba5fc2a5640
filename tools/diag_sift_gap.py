"""Why does the SIFT path miss obj015/obj021 where ORB finds them?

The SIFT serving bench (widened default plan) measures 0.917 vs ORB's
1.000 on the same scenes; the two misses are weak-texture planes. This
stages BOTH engines through the same placements on CPU and prints the
per-tier numbers side by side — in-radius matches, prescreen margin-mass
rank, tier-1 presence score vs the activation cut, tier-2 accepts — so
the gap is attributed to a specific stage (descriptor property vs
pipeline tuning; VERDICT r4 task 6's A/B).

Usage: python tools/diag_sift_gap.py           (CPU)
  DIAG_OBJECTS=obj015,obj021   placements to trace (default)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("DIAG_PLATFORM", "cpu"))

import bench  # noqa: E402


def trace(feature: str, targets):
    import jax.numpy as jnp

    from tod_tpu.geometry.detection import (detect_frame_segmented,
                                            prescreen_scores)
    from tod_tpu.models import FusedDetector
    from tod_tpu.utils.synthetic import DEFAULT_K

    os.environ["BENCH_FEATURE"] = feature
    n = int(os.environ.get("BENCH_OBJECTS", "100"))
    objects, models = bench.build_db(n)
    cfg = bench.build_config(int(os.environ.get("BENCH_FEATURES", "5000")))
    det = FusedDetector(models, cfg)
    scenes = bench.build_scenes(objects, 8)
    oid_to_idx = {m.object_id: i for i, m in enumerate(models)}
    s1, s2, _s3 = det._stages
    for oid in targets:
        target = oid_to_idx[oid]
        image, depth, gt = scenes[target // 3]
        gt_T = next(T for o, _R, T in gt if o == oid)
        gray, depth_j, K_j = det.prepare_frame(image, depth, DEFAULT_K)
        xy, qp, dsc, ok = s1(gray, depth_j, K_j)
        dist, rows = s2(dsc, det.sdb)
        d_np = np.asarray(dist)
        ok_np = np.asarray(ok)
        within = int(((d_np[:, target] <= cfg.radius) & ok_np).sum())
        level = np.median(d_np, axis=1)
        pre = np.asarray(prescreen_scores(
            jnp.asarray(d_np), jnp.asarray(level), jnp.asarray(ok_np),
            cfg.radius, cfg.activation.prescreen_top))
        p_rank = int((pre > pre[target]).sum())
        scores, detn = jax.jit(
            lambda k: detect_frame_segmented(
                k, dist, rows, ok, qp, xy, det.sdb.points,
                det.sdb.obj_start, det.sdb.spans, cfg.guess,
                cfg.activation, cfg.radius))(jax.random.key(3))
        s_np = np.asarray(scores)
        t_rank = int((s_np > s_np[target]).sum())
        acc = np.asarray(detn.accepted[target]).astype(bool)
        dts = (np.linalg.norm(np.asarray(detn.T[target])[acc] - gt_T,
                              axis=-1) if acc.any() else np.asarray([]))
        bench.log(f"[{feature}] {oid}: in-radius {within} "
                  f"(radius {cfg.radius}) prescreen rank "
                  f"{p_rank}/P={cfg.activation.prescreen} "
                  f"t1 score {int(s_np[target])} rank {t_rank} "
                  f"(min {cfg.activation.min_score}) accepts "
                  f"{int(acc.sum())} dts {np.round(dts, 4).tolist()}")


def main():
    targets = os.environ.get("DIAG_OBJECTS", "obj015,obj021").split(",")
    trace("ORB", targets)
    trace("SIFT", targets)


if __name__ == "__main__":
    main()
