"""Evaluate CHEAP tier-1 pre-screen statistics against the exact bench
workload: could a top-P cut by an O(Q*O) elementwise statistic (computed
from the (Q, O) per-object distance matrix the segmented matcher already
produces) retain every present object, so the lean-RANSAC tier-1 only has
to score P objects instead of all O?

Context (tools/diag_mixed.py, round-3): raw in-radius match COUNT is
near-anti-correlated with presence for weak-texture planes (present
obj003 at count-rank 94/100) — descriptor crowding again. Candidates here
are MARGIN-based: m[q,o] = d[q,o] - alpha * median_o' d[q,o'], the same
cross-object signal that fixed store priority (detection.py
build_object_stores).

Usage: JAX_PLATFORMS=cpu python tools/diag_prescreen.py   (BENCH_* knobs)
"""
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from tod_tpu.geometry.adjacency import fill_adjacency  # noqa: E402
from tod_tpu.geometry.detection import (MARGIN_ALPHA,  # noqa: E402
                                        build_object_stores)
from tod_tpu.geometry.ransac import presence_score  # noqa: E402
from tod_tpu.models import FusedDetector  # noqa: E402
from tod_tpu.utils.synthetic import DEFAULT_K  # noqa: E402


def tier1_scores(key, xy, qp, ok, dist, rows, points, obj_start, spans,
                 cfg):
    n_objects = spans.shape[0]
    act = cfg.activation
    keys1 = jax.random.split(key, n_objects)
    level = jnp.median(dist, axis=1)

    def tier1(args):
        key_o, o = args
        m = build_object_stores(dist, rows, ok, qp, xy, points, obj_start,
                                o[None], act.m_cap, cfg.radius, level)
        m = jax.tree.map(lambda x: x[0], m)
        graphs = fill_adjacency(m, spans[o], cfg.guess.sensor_error)
        return presence_score(key_o, m, graphs, act.n_hypotheses,
                              cfg.guess.sensor_error)

    return jax.lax.map(tier1,
                       (keys1, jnp.arange(n_objects, dtype=jnp.int32)),
                       batch_size=act.object_batch)


def main():
    n_objects = int(os.environ.get("BENCH_OBJECTS", "100"))
    objects, models = bench.build_db(n_objects)
    cfg = bench.build_config(int(os.environ.get("BENCH_FEATURES", "5000")))
    det = FusedDetector(models, cfg)
    oid_to_idx = {m.object_id: i for i, m in enumerate(models)}
    s1, s2, _ = det._stages
    jt1 = jax.jit(lambda *a: tier1_scores(*a, cfg=cfg))

    scenes = bench.build_scenes(objects,
                                int(os.environ.get("BENCH_SCENES", "8")))
    worst = defaultdict(int)       # stat -> max rank over present objects
    for s, (image, depth, gt) in enumerate(scenes):
        gray, depth_j, K_j = det.prepare_frame(image, depth, DEFAULT_K)
        xy, qp, ok = None, None, None
        xy, qp, dsc, ok = s1(gray, depth_j, K_j)
        dist, rows = s2(dsc, det.sdb)
        det._key, sub = jax.random.split(det._key)
        t1 = np.asarray(jt1(sub, xy, qp, ok, dist, rows, det.sdb.points,
                            det.sdb.obj_start, det.sdb.spans))

        d = np.asarray(dist)                                  # (Q, O)
        okn = np.asarray(ok)
        level = np.median(d, axis=1)                          # (Q,)
        m = d - MARGIN_ALPHA * level[:, None]
        inr = (d <= cfg.radius) & okn[:, None]
        stats = {"t1": t1, "count": inr.sum(0)}
        for tau in (1.0, 2.0, 4.0, 6.0):
            stats[f"mcnt{tau:g}"] = (inr & (m <= -tau)).sum(0)
        stats["mmass"] = np.where(inr, np.maximum(-m, 0.0), 0.0).sum(0)
        # sum of the 64 most-negative margins (in-radius only)
        neg = np.where(inr, np.minimum(m, 0.0), 0.0)
        stats["mtop64"] = -np.sort(neg, axis=0)[:64].sum(0)

        ranks = {k: np.empty(len(v), int) for k, v in stats.items()}
        for k, v in stats.items():
            ranks[k][np.argsort(-v, kind="stable")] = np.arange(len(v))
        for oid, gt_R, gt_T in gt:
            o = oid_to_idx[oid]
            line = " ".join(f"{k}={stats[k][o]:.0f}r{ranks[k][o]}"
                            for k in stats)
            print(f"s{s} {oid} ({type(objects[o]).__name__}): {line}",
                  flush=True)
            for k in stats:
                worst[k] = max(worst[k], int(ranks[k][o]))

        # simulate the tier-2 active set (top-16 by t1, min_score 4) with and
        # without a pre-screen of width P by each margin stat: does screening
        # junk out of tier-1 ALSO rescue weak-texture activations?
        n_active, min_score = 16, 4
        base_active = set(np.argsort(-t1, kind="stable")[:n_active]
                          [np.sort(t1)[::-1][:n_active] >= min_score])
        for oid, _, _ in gt:
            o = oid_to_idx[oid]
            flags = []
            for k in ("mcnt2", "mmass", "mtop64"):
                for P in (24, 32, 48):
                    surv = np.argsort(-stats[k], kind="stable")[:P]
                    t1s = t1[surv]
                    act = set(surv[np.argsort(-t1s, kind="stable")
                                   [:n_active]][
                        np.sort(t1s)[::-1][:n_active] >= min_score])
                    flags.append(f"{k}@{P}:{'A' if o in act else '-'}")
            print(f"s{s} {oid} activation base:"
                  f"{'A' if o in base_active else '-'} "
                  + " ".join(flags), flush=True)
    print("WORST present-object rank per statistic "
          "(pre-screen width needed to retain all present objects):")
    for k, v in worst.items():
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
