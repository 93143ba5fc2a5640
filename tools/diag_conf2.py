"""Confidence statistic v2: component separation + gate curves (CPU).

The shipped acceptance gate is one-dimensional (inlier count): at
min_confidence 24 the bench measures 0.958 recall / 0.920 precision —
a minority of junk accepts reach 24+ grown inliers and cap the gated
precision. The serving pipeline now returns two more on-chip per-pose
statistics (geometry/ransac.py RansacRound): the RMS 3D residual of the
final pose over its inliers and a greedy inlier-clique size. This diag
runs the EXACT bench workload (100-object widened default DB, the 8 bench
scenes) on CPU, labels every accepted pose true/junk (within 2cm of a
same-id placement), prints the component distributions, and sweeps gate
curves for v1 (inliers) and v2 (models/fused.py confidence_v2) — the
measurement behind the shipped fusion constants.

Usage: python tools/diag_conf2.py     (CPU; BENCH_* knobs as bench)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("DIAG_PLATFORM", "cpu"))

import bench  # noqa: E402
from tod_tpu.models import FusedDetector  # noqa: E402
from tod_tpu.utils.synthetic import DEFAULT_K  # noqa: E402


def main():
    n_objects = int(os.environ.get("BENCH_OBJECTS", "100"))
    objects, models = bench.build_db(n_objects)
    scenes = bench.build_scenes(objects, int(os.environ.get("BENCH_SCENES",
                                                            "8")))
    cfg = bench.build_config(int(os.environ.get("BENCH_FEATURES", "5000")))
    det = FusedDetector(models, cfg)

    # accepts[s] = [(true?, object_id, inliers, rms_mm, clique, quality)]
    accepts = []
    placed = hits = 0
    for s, (image, depth, gt) in enumerate(scenes):
        found = det.detect(image, depth, DEFAULT_K)
        placed += len(gt)
        for oid, _gR, gT in gt:
            if any(r.object_id == oid
                   and float(np.linalg.norm(r.T - gT)) <= 0.02
                   for r in found):
                hits += 1
        sub = []
        for r in found:
            true = any(oid == r.object_id
                       and float(np.linalg.norm(r.T - gT)) <= 0.02
                       for oid, _gR, gT in gt)
            sub.append((true, r.object_id, float(r.confidence),
                        r.rms_residual * 1e3, float(r.clique_size),
                        float(r.quality)))
        accepts.append(sub)
        bench.log(f"scene {s}: {len(sub)} accepts, "
                  f"{sum(1 for a in sub if a[0])} true")

    # raw per-accept dump: (scene, true, object_id, inliers, rms_mm,
    # clique, quality) — the measurement basis for the confidence_v2
    # fusion constants (offline grid search reads this)
    import json
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "CONF2_ROWS.json"), "w") as f:
        json.dump([{"scene": s, "true": a[0], "object_id": a[1],
                    "inliers": a[2], "rms_mm": a[3], "clique": a[4],
                    "quality": a[5]}
                   for s, sub in enumerate(accepts) for a in sub], f)

    flat = [a for sub in accepts for a in sub]
    arr = np.asarray([(a[0],) + a[2:] for a in flat], np.float64)
    true_m = arr[:, 0] == 1
    bench.log(f"\nrecall@2cm ungated: {hits}/{placed} = {hits/placed:.3f}")
    bench.log(f"accepts: {len(flat)} total, {int(true_m.sum())} true / "
              f"{int((~true_m).sum())} junk")
    for name, col in (("inliers", 1), ("rms_mm", 2), ("clique", 3),
                      ("quality", 4)):
        for lbl, m in (("true", true_m), ("junk", ~true_m)):
            v = arr[m, col]
            if len(v):
                bench.log(f"  {name:8s} {lbl:4s}: "
                          f"p10 {np.percentile(v, 10):7.2f} "
                          f"p50 {np.percentile(v, 50):7.2f} "
                          f"p90 {np.percentile(v, 90):7.2f} "
                          f"max {v.max():7.2f}")

    def gate_curve(col, gates):
        lines = []
        for g in gates:
            tp = acc = rec = 0
            for sub, (_i, _d, gt) in zip(accepts, scenes):
                kept = [a for a in sub if a[1 + col] >= g]
                acc += len(kept)
                tp += sum(1 for a in kept if a[0])
                for oid, _gR, gT in gt:
                    if any(a[0] and a[1] == oid for a in kept):
                        rec += 1
            lines.append((g, rec / placed, tp / max(acc, 1), acc))
        return lines

    bench.log("\ngate curves (gate: recall, precision, kept):")
    # col index into the accept tuple offset by 1 (skip object_id):
    # 1 = inliers, 4 = quality
    for name, col in (("v1 inliers", 1), ("v2 quality", 4)):
        vals = arr[:, col if col == 1 else 4]
        gates = sorted({round(float(v), 1) for v in vals})
        step = max(1, len(gates) // 24)
        for g, r_, p_, a_ in gate_curve(col, gates[::step]):
            mark = "  <-- target" if r_ >= 0.958 and p_ >= 0.96 else ""
            bench.log(f"  {name} >= {g:6.1f}: recall {r_:.3f} "
                      f"precision {p_:.3f} kept {a_}{mark}")


if __name__ == "__main__":
    main()
