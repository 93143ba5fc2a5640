"""Experiment: catalog-scale prescreen statistics.

The tier-1 prescreen (geometry/detection.py prescreen_scores) ranks
objects by ABSOLUTE margin-mass; junk objects accumulate spurious mass
with catalog size, so a present weak texture's rank sinks (obj021: rank
124 of 1000 — outside every reasonable screen width; PROGRESS.md).

Variant A (measured, REJECTED): normalize by a pack-time per-object
junk-traffic baseline (catalog rows as queries). Worst present rank at
100 objects got WORSE (raw 25 -> div 50 / sub 79): a weak texture's own
chance mass is high, so the ratio crushes its present signal along with
the junk.

Variant B (this version): spatial concentration. A present object's
distinctive matches concentrate in the image cells it occupies; junk
margin-mass is diffuse across the frame. Score = sum of the top-B
per-cell margin masses (cells = the same 6x8 grid bucketed compaction
uses) instead of one global top-64.

Usage: python tools/exp_prescreen_norm.py       (BENCH_OBJECTS=100|1000)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("DIAG_PLATFORM", "cpu"))

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from tod_tpu.geometry.detection import MARGIN_ALPHA  # noqa: E402
from tod_tpu.models import FusedDetector  # noqa: E402
from tod_tpu.utils.synthetic import DEFAULT_K  # noqa: E402

GRID = (6, 8)
H, W = 480, 640


def cell_masses(neg: np.ndarray, xy: np.ndarray, top: int) -> np.ndarray:
    """(cells, O) per-cell top-``top`` margin-mass."""
    r = np.clip((xy[:, 1] * GRID[0] / H).astype(int), 0, GRID[0] - 1)
    c = np.clip((xy[:, 0] * GRID[1] / W).astype(int), 0, GRID[1] - 1)
    cell = r * GRID[1] + c
    n_cells = GRID[0] * GRID[1]
    out = np.zeros((n_cells, neg.shape[1]), np.float32)
    for b in range(n_cells):
        sub = neg[cell == b]                     # (q_b, O)
        if sub.shape[0] == 0:
            continue
        k = min(top, sub.shape[0])
        out[b] = -np.sort(-sub, axis=0)[:k].sum(0)
    return out


def main():
    n_objects = int(os.environ.get("BENCH_OBJECTS", "100"))
    objects, models = bench.build_db(n_objects)
    cfg = bench.build_config(int(os.environ.get("BENCH_FEATURES", "5000")))
    det = FusedDetector(models, cfg)
    oid_to_idx = {m.object_id: i for i, m in enumerate(models)}
    s1, s2, _ = det._stages
    top = cfg.activation.prescreen_top

    def topsum(a, k, axis=0):
        k = min(k, a.shape[axis])
        return -np.sort(-a, axis=axis).take(range(k), axis=axis).sum(axis)

    worst = {}
    scenes = bench.build_scenes(objects,
                                int(os.environ.get("BENCH_SCENES", "8")))
    for s, (image, depth, gt) in enumerate(scenes):
        gray, depth_j, K_j = det.prepare_frame(image, depth, DEFAULT_K)
        xy, qp, dsc, ok = s1(gray, depth_j, K_j)
        dist, rows = s2(dsc, det.sdb)
        level = jnp.median(dist, axis=1)
        m = dist - MARGIN_ALPHA * level[:, None]
        inr = (dist <= cfg.radius) & ok[:, None]
        neg = np.asarray(jnp.where(inr, jnp.maximum(-m, 0.0), 0.0))
        xy_np = np.asarray(xy)
        cm8 = cell_masses(neg, xy_np, 8)          # (48, O)
        cm16 = cell_masses(neg, xy_np, 16)
        variants = {
            "raw": topsum(neg, top),
            "cell8_top6": topsum(cm8, 6),
            "cell16_top3": topsum(cm16, 3),
        }
        for T in (8, 12, 16, 20, 25, 30, 40):
            variants[f"cnt{T}"] = (neg > float(T)).sum(0).astype(np.float32)
        # hybrid: strong-match count, mass as tie-break (counts are small
        # integers at catalog scale -> many ties)
        mass = topsum(neg, top)
        variants["cnt20+mass"] = (
            variants["cnt20"] + mass / (mass.max() + 1.0))

        for oid, _gt_R, _gt_T in gt:
            o = oid_to_idx[oid]
            line = [f"scene {s} {oid}"]
            for name, v in variants.items():
                rk = int((v > v[o]).sum())
                worst[name] = max(worst.get(name, 0), rk)
                line.append(f"{name}: {rk}")
            print("  ".join(line), flush=True)
    print("\nworst present-object rank per variant:")
    for name, w in sorted(worst.items(), key=lambda kv: kv[1]):
        print(f"  {name:16s} {w}")


if __name__ == "__main__":
    main()
