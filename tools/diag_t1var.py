"""Tier-1 activation VARIANCE on the bench workload: for each ground-truth
placement, rerun the lean-RANSAC presence score under many RNG keys and
report the distribution + activation-miss probability (score outside the
top-16 cut or below min_score) at two tier-1 budgets.

Motivation: at 1000 objects the TPU bench (one key sequence) dropped
obj009/obj015 (t1 scores 15-19 when hit — marginal), while a CPU rerun on a
different key recovered them (tools/diag_mixed.py). This quantifies how much
of the catalog-scale recall spread is tier-1 sampling noise vs a real floor,
and whether doubling BENCH_ACT_HYP buys the variance down.

CPU-only (pins the platform; see diag_mixed.py). The O(Q*catalog) match runs
ONCE per scene; only the tier-1 stage (cheap, m_cap matches/object) reruns
per key. Usage:
  BENCH_OBJECTS=1000 N_KEYS=20 python tools/diag_t1var.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("DIAG_PLATFORM", "cpu"))

import bench  # noqa: E402
from tod_tpu.geometry.detection import (  # noqa: E402
    detect_frame_segmented)
from tod_tpu.models import FusedDetector  # noqa: E402
from tod_tpu.utils.synthetic import DEFAULT_K  # noqa: E402
import dataclasses  # noqa: E402


def main():
    n_objects = int(os.environ.get("BENCH_OBJECTS", "1000"))
    n_keys = int(os.environ.get("N_KEYS", "20"))
    objects, models = bench.build_db(n_objects)
    cfg = bench.build_config(int(os.environ.get("BENCH_FEATURES", "5000")))
    budgets = [cfg.activation.n_hypotheses,
               2 * cfg.activation.n_hypotheses]
    oid_to_idx = {m.object_id: i for i, m in enumerate(models)}
    det = FusedDetector(models, cfg)
    s1, s2, _ = det._stages

    jits = {}
    for h in budgets:
        act_h = dataclasses.replace(cfg.activation, n_hypotheses=h)

        def geom(key, xy, qp, ok, dist, rows, points, obj_start, spans,
                 _act=act_h):
            scores, _ = detect_frame_segmented(
                key, dist, rows, ok, qp, xy, points, obj_start, spans,
                cfg.guess, _act, cfg.radius)
            return scores

        jits[h] = jax.jit(geom)

    scenes = bench.build_scenes(objects,
                                int(os.environ.get("BENCH_SCENES", "8")))
    min_score = cfg.activation.min_score
    n_active = cfg.guess.max_active_objects
    print(f"objects={n_objects} keys={n_keys} budgets={budgets} "
          f"min_score={min_score} top={n_active} "
          f"P={cfg.activation.prescreen}", flush=True)
    for s, (image, depth, gt) in enumerate(scenes):
        gray, depth_j, K_j = det.prepare_frame(image, depth, DEFAULT_K)
        xy, qp, dsc, ok = s1(gray, depth_j, K_j)
        dist, rows = s2(dsc, det.sdb)   # once per scene: the O(Q*N) stage
        for oid, _gt_R, gt_T in gt:
            o = oid_to_idx[oid]
            line = [f"s{s} {oid} ({type(objects[o]).__name__})"]
            for h in budgets:
                sc, act_hits = [], 0
                for k in range(n_keys):
                    key = jax.random.key(1000 * s + k)
                    scores = np.asarray(jits[h](
                        key, xy, qp, ok, dist, rows, det.sdb.points,
                        det.sdb.obj_start, det.sdb.spans))
                    rank = int((scores > scores[o]).sum())
                    activated = (scores[o] >= min_score
                                 and rank < n_active)
                    sc.append(int(scores[o]))
                    act_hits += bool(activated)
                line.append(
                    f"hyp{h}: scores[{min(sc)}..{max(sc)}] med "
                    f"{int(np.median(sc))} act {act_hits}/{n_keys}")
            print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
