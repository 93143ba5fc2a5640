"""Diagnose segmented-pipeline misses on the EXACT bench workload (shapes,
noise, operating point all via the same BENCH_* env knobs bench.py uses):
per GT placement — tier-1 activation score + rank, tier-2 instance
outcomes. Unlike tools/diag_bench2.py (planar-era ad-hoc scenes), this
reuses bench.build_scenes, so solids get presenting_pose and BENCH_NOISE
degrades frames identically to the bench.

Usage: JAX_PLATFORMS=cpu python tools/diag_mixed.py      (defaults: mixed)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np  # noqa: E402

import jax  # noqa: E402

# Self-enforce the documented CPU usage: the JAX_PLATFORMS=cpu env prefix is
# NOT reliable under the axon sitecustomize, and an accidental axon run here
# claims the single-client TPU tunnel out from under a live bench.
jax.config.update("jax_platforms", os.environ.get("DIAG_PLATFORM", "cpu"))

import bench  # noqa: E402
from tod_tpu.geometry.detection import detect_frame_segmented  # noqa: E402
from tod_tpu.models import FusedDetector  # noqa: E402
from tod_tpu.utils.synthetic import DEFAULT_K  # noqa: E402


def main():
    n_objects = int(os.environ.get("BENCH_OBJECTS", "100"))
    objects, models = bench.build_db(n_objects)
    cfg = bench.build_config(int(os.environ.get("BENCH_FEATURES", "5000")))
    det = FusedDetector(models, cfg)
    oid_to_idx = {m.object_id: i for i, m in enumerate(models)}
    s1, s2, _ = det._stages

    def geom_with_scores(key, xy, qp, ok, dist, rows, points, obj_start,
                         spans):
        return detect_frame_segmented(key, dist, rows, ok, qp, xy, points,
                                      obj_start, spans, cfg.guess,
                                      cfg.activation, cfg.radius)

    jg = jax.jit(geom_with_scores)
    scenes = bench.build_scenes(objects,
                                int(os.environ.get("BENCH_SCENES", "8")))
    for s, (image, depth, gt) in enumerate(scenes):
        gray, depth_j, K_j = det.prepare_frame(image, depth, DEFAULT_K)
        xy, qp, dsc, ok = s1(gray, depth_j, K_j)
        dist, rows = s2(dsc, det.sdb)
        det._key, sub = jax.random.split(det._key)
        scores, d_out = jg(sub, xy, qp, ok, dist, rows, det.sdb.points,
                           det.sdb.obj_start, det.sdb.spans)
        scores = np.asarray(scores)
        rank = {o: r for r, o in enumerate(np.argsort(-scores))}
        # cheap pre-screen signal: per-object count of in-radius matches
        # (would a top-K cut by count alone retain present objects?)
        dist_np = np.asarray(dist)
        ok_np = np.asarray(ok)
        counts = ((dist_np <= cfg.radius) & ok_np[:, None]).sum(0)
        crank = {o: r for r, o in enumerate(np.argsort(-counts))}
        acc = np.asarray(d_out.accepted)
        nin = np.asarray(d_out.n_inliers)
        Ts = np.asarray(d_out.T)
        for oid, gt_R, gt_T in gt:
            o = oid_to_idx[oid]
            best = None
            for i in range(acc.shape[1]):
                if acc[o, i]:
                    dt = float(np.linalg.norm(Ts[o, i] - gt_T))
                    if best is None or dt < best[0]:
                        best = (dt, int(nin[o, i]))
            tag = "HIT " if best and best[0] <= 0.02 else "MISS"
            shape = type(objects[o]).__name__
            print(f"{tag} s{s} {oid} ({shape}): z={gt_T[2]:.2f} "
                  f"t1score={scores[o]} (rank {rank[o]}) "
                  f"match_count={int(counts[o])} (count-rank {crank[o]}) "
                  f"best={'none' if best is None else f'dt={best[0] * 100:.1f}cm inl={best[1]}'}",
                  flush=True)


if __name__ == "__main__":
    main()
