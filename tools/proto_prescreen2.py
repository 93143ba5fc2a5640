"""Prototype spatially-aware prescreen statistics against the live one.

Motivation: the margin-mass prescreen (geometry/detection.py
prescreen_scores) ranks obj021 at 124/1000 on the bench workload — outside
any affordable screen width. Its evidence is weak AND spatially
concentrated (a small plane in one image region), while equal-mass junk is
spread across the frame. Candidates scored here (per object, from the same
(Q, O) per-object-nearest distances the serving pipeline already has):

  A margin-mass (current): sum of top-`top` negative margins
  B cell-max margin mass:  bucket matches into a GxG image grid, sum
                           negative margins per cell, take the best cell
  C cell-top2 sum:         best two cells (objects spanning a cell border)
  D concentration-scaled:  A * (B / A)  == B, plus a floor — degenerate,
                           kept for the printout only

For every GT placement at BENCH_OBJECTS scale, prints the object's rank
under each statistic (lower = better; the screen keeps the top P).
CPU-only. Usage: BENCH_OBJECTS=1000 python tools/proto_prescreen2.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("DIAG_PLATFORM", "cpu"))

import bench  # noqa: E402
from tod_tpu.geometry.detection import MARGIN_ALPHA  # noqa: E402
from tod_tpu.models import FusedDetector  # noqa: E402
from tod_tpu.utils.synthetic import DEFAULT_K  # noqa: E402

GRID = int(os.environ.get("GRID", "6"))
TOP = 64


def stats(dist, xy, ok, radius, shape_hw):
    """Return dict name -> (O,) scores (numpy)."""
    level = np.median(dist, axis=1)
    m = dist - MARGIN_ALPHA * level[:, None]
    inr = (dist <= radius) & ok[:, None]
    neg = np.where(inr, np.maximum(-m, 0.0), 0.0)          # (Q, O)

    # A: current — top-TOP margin mass
    part = np.partition(neg, -TOP, axis=0)[-TOP:]
    a = part.sum(0)

    # cell index per query
    h, w = shape_hw
    cy = np.clip((xy[:, 1] * GRID / h).astype(int), 0, GRID - 1)
    cx = np.clip((xy[:, 0] * GRID / w).astype(int), 0, GRID - 1)
    cell = cy * GRID + cx                                   # (Q,)
    n_cells = GRID * GRID
    onehot = np.zeros((n_cells, neg.shape[0]), np.float32)
    onehot[cell, np.arange(neg.shape[0])] = 1.0
    cell_mass = onehot @ neg                                # (cells, O)
    srt = np.sort(cell_mass, axis=0)
    b = srt[-1]
    c = srt[-2:].sum(0)
    return {"A-massTop64": a, "B-cellMax": b, "C-cell2": c,
            "AB-mix": a + 4.0 * b}


def main():
    n_objects = int(os.environ.get("BENCH_OBJECTS", "1000"))
    objects, models = bench.build_db(n_objects)
    cfg = bench.build_config(int(os.environ.get("BENCH_FEATURES", "5000")))
    det = FusedDetector(models, cfg)
    oid_to_idx = {m.object_id: i for i, m in enumerate(models)}
    s1, s2, _ = det._stages
    scenes = bench.build_scenes(objects,
                                int(os.environ.get("BENCH_SCENES", "8")))
    worst = {}
    for s, (image, depth, gt) in enumerate(scenes):
        gray, depth_j, K_j = det.prepare_frame(image, depth, DEFAULT_K)
        xy, qp, dsc, ok = s1(gray, depth_j, K_j)
        dist, rows = s2(dsc, det.sdb)
        dist = np.asarray(dist)
        xy_np = np.asarray(xy)
        ok_np = np.asarray(ok)
        sc = stats(dist, xy_np, ok_np, cfg.radius, gray.shape[:2])
        for oid, _R, _T in gt:
            o = oid_to_idx[oid]
            parts = []
            for name, v in sc.items():
                rank = int((v > v[o]).sum())
                parts.append(f"{name}={rank}")
                worst[name] = max(worst.get(name, 0), rank)
            print(f"s{s} {oid} ({type(objects[o]).__name__}): "
                  + "  ".join(parts), flush=True)
    print("WORST-CASE ranks over all placements: "
          + "  ".join(f"{k}={v}" for k, v in worst.items()), flush=True)


if __name__ == "__main__":
    main()
