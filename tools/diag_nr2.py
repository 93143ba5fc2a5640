"""Near-range prescreen statistic A/B on the exact missed placements.

diag_nearrange.py attributed every near-range stress miss to PRESCREEN
EXCLUSION: the present object collects 600-800 in-radius matches at
z=0.5/1.0 m (scale-shifted appearance -> many moderately-distinctive
matches) but its top-64 margin-mass tail ranks 44-92, outside P=32 —
wide shallow tails lose to narrow deep ones. This computes the
per-(query, object) distances ONCE per missed placement and evaluates
candidate prescreen statistics' ranks side by side:

  top64   — the shipped statistic (prescreen_top=64)
  top128 / top192 / top256 — wider margin tails
  hybrid  — margin mass (top64) + alpha * in-radius count

Usage: python tools/diag_nr2.py          (CPU)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("DIAG_PLATFORM", "cpu"))

import bench  # noqa: E402
from stress_pose import stress_pose  # noqa: E402

MISSES = [(0.5, 72, 0.0), (0.5, 75, np.pi / 2),
          (1.0, 96, 0.0), (1.0, 6, 2 * np.pi * 10 / 12)]


def main():
    from tod_tpu.geometry.detection import MARGIN_ALPHA
    from tod_tpu.models import FusedDetector
    from tod_tpu.utils.synthetic import DEFAULT_K, compose_scene

    n = int(os.environ.get("BENCH_OBJECTS", "100"))
    objects, models = bench.build_db(n)
    cfg = bench.build_config(int(os.environ.get("BENCH_FEATURES", "5000")))
    det = FusedDetector(models, cfg)
    s1, s2, _ = det._stages

    def ranks_for(d_np, ok_np, target, radius):
        level = np.median(d_np, axis=1)
        m = d_np - MARGIN_ALPHA * level[:, None]
        inr = (d_np <= radius) & ok_np[:, None]
        neg = np.where(inr, np.maximum(-m, 0.0), 0.0)
        neg_sorted = -np.sort(-neg, axis=0)          # (Q, O) desc per col
        counts = inr.sum(0)
        out = {}
        for top in (64, 128, 192, 256):
            s = neg_sorted[:top].sum(0)
            out[f"top{top}"] = int((s > s[target]).sum())
        s64 = neg_sorted[:64].sum(0)
        for a in (0.05, 0.2, 1.0):
            h = s64 + a * counts
            out[f"hyb{a}"] = int((h > h[target]).sum())
        out["count"] = int((counts > counts[target]).sum())
        return out, int(counts[target])

    for z, oi, az in MISSES:
        obj = objects[oi]
        R, T = stress_pose(obj, 15.0, z, az)
        image, depth = compose_scene([obj], [(R, T)])
        gray, depth_j, K_j = det.prepare_frame(image, depth, DEFAULT_K)
        xy, qp, dsc, ok = s1(gray, depth_j, K_j)
        dist, _rows = s2(dsc, det.sdb)
        out, cnt = ranks_for(np.asarray(dist), np.asarray(ok), oi,
                             cfg.radius)
        bench.log(f"z={z} {obj.object_id} (in-radius {cnt}): ranks {out}")

    # sanity: the statistic change must not break the BENCH placements —
    # every present object there must keep rank < P
    scenes = bench.build_scenes(objects, 8)
    worst = {}
    for s, (image, depth, gt) in enumerate(scenes):
        gray, depth_j, K_j = det.prepare_frame(image, depth, DEFAULT_K)
        xy, qp, dsc, ok = s1(gray, depth_j, K_j)
        dist, _rows = s2(dsc, det.sdb)
        d_np, ok_np = np.asarray(dist), np.asarray(ok)
        oid_to_idx = {m.object_id: i for i, m in enumerate(models)}
        for oid, _gR, _gT in gt:
            out, _c = ranks_for(d_np, ok_np, oid_to_idx[oid], cfg.radius)
            for k, v in out.items():
                worst[k] = max(worst.get(k, 0), v)
    bench.log(f"bench-scene worst present-object rank per statistic: "
              f"{worst}")


if __name__ == "__main__":
    main()
