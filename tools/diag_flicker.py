"""Per-frame trace of ONE object's serving state under coarse->fine +
explore/track/seeding: why does a discovered weak-texture object drop out
of the steady-state window?

Streams the bench scene containing DIAG_OBJ (default obj006 at 400
objects, CF 8/64, E=8 T=8 — the EXPLORE_BENCH_400 arm) and logs, per
frame: coarse-slab membership, tracked/explored slot, seed_ok, tier-1
score, every tier-2 instance (n_inliers, accepted, pose error vs GT).

Run: cd /root/repo && python tools/diag_flicker.py    (TPU; one client)
Env: DIAG_OBJ, DIAG_OBJECTS, DIAG_STRIDE/WIDTH/E/T, DIAG_FRAMES.
"""

import dataclasses
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def main():
    bench.log(f"devices: {bench.wait_for_devices()}")
    import jax
    import jax.numpy as jnp

    from tod_tpu.geometry.detection import AGE_NEVER
    from tod_tpu.models import FusedDetector
    from tod_tpu.models.fused import _jit_age, _jit_seeds, _jit_tracked, \
        _jit_tracked_needy, _jit_update_pose
    from tod_tpu.utils.synthetic import DEFAULT_K

    target = os.environ.get("DIAG_OBJ", "obj006")
    n_objects = int(os.environ.get("DIAG_OBJECTS", "400"))
    os.environ.setdefault("BENCH_OBJECTS", str(n_objects))
    objects, models = bench.build_db(n_objects)
    scenes = bench.build_scenes(objects, 8)
    scene = next((s for s in scenes
                  if any(g[0] == target for g in s[2])), None)
    assert scene is not None, f"{target} not placed in the 8 bench scenes"
    image, depth, gt = scene
    gt_t = next(T for oid, _R, T in gt if oid == target)

    cfg = dataclasses.replace(
        bench.build_config(5000),
        coarse_stride=int(os.environ.get("DIAG_STRIDE", "8")),
        fine_width=int(os.environ.get("DIAG_WIDTH", "64")),
        explore_width=int(os.environ.get("DIAG_E", "8")),
        track_width=int(os.environ.get("DIAG_T", "8")))
    det = FusedDetector(models, cfg)
    o_idx = det.object_ids.index(target)
    frame = det.prepare_frame(image, depth, DEFAULT_K)
    n_frames = int(os.environ.get("DIAG_FRAMES", "60"))

    s1, s2, s3 = det._stages
    c1, c2, c3 = det._coarse
    gray, depth_j, K_j = frame
    xy, qp, dsc, ok = s1(gray, depth_j, K_j)

    for t in range(n_frames):
        det._key, sub = jax.random.split(det._key)
        tracked = (_jit_tracked_needy(det._age, det._last_coarse_sel,
                                      cfg.track_width, cfg.track_ttl)
                   if det._last_coarse_sel is not None else
                   _jit_tracked(det._age, cfg.track_width, cfg.track_ttl))
        explore = det._explore_ids()
        seeds = _jit_seeds(det._age, det._last_R, det._last_T, cfg.track_ttl)
        sel, force, force_act = c1(dsc, ok, det.cdb, tracked, explore)
        n_coarse = cfg.fine_width - cfg.track_width - cfg.explore_width
        det._last_coarse_sel = sel[:n_coarse]
        dist, rows = c2(dsc, det.sdb, sel)
        d = c3(sub, xy, qp, ok, dist, rows, sel, det.sdb.points,
               det.sdb.obj_start, det.sdb.spans, force, force_act, seeds)
        age_before = int(det._age[o_idx])
        det._age = _jit_age(det._age, d)
        det._last_R, det._last_T = _jit_update_pose(det._last_R,
                                                    det._last_T, d)

        sel_np = np.asarray(sel)
        in_slab = o_idx in sel_np.tolist()
        in_tracked = o_idx in np.asarray(tracked).tolist()
        in_explore = o_idx in np.asarray(explore).tolist()
        acc = np.asarray(d.accepted[o_idx])
        n_in = np.asarray(d.n_inliers[o_idx])
        T_i = np.asarray(d.T[o_idx])
        errs = [f"{np.linalg.norm(T_i[i] - gt_t) * 100:.1f}cm"
                if acc[i] else "-" for i in range(len(acc))]
        seed_err = float(np.linalg.norm(
            np.asarray(det._last_T[o_idx]) - gt_t)) * 100
        bench.log(
            f"f{t:03d} age={min(age_before, 99):2d} slab={int(in_slab)} "
            f"trk={int(in_tracked)} exp={int(in_explore)} "
            f"seed_ok={int(bool(np.asarray(seeds.ok[o_idx])))} "
            f"acc={acc.astype(int).tolist()} n={n_in.tolist()} "
            f"dT={errs} seedT_err={seed_err:.1f}cm")


if __name__ == "__main__":
    main()
