"""Why does the exploration slot never discover obj021 at 1000 objects?

EXPLORE_BENCH_1000.json (rounds 3-4): the explore arm recovers the
coarse-screen-excluded planes obj003/obj006 but obj021's first_seen stays
null across every scene, even though the explore slot guarantees it a
fine-slab column and ``reserved_force_mask`` waives the in-slab tier-1
prescreen.  This isolates the exact gate that kills it, on the frame where
its explore slot comes up (scene 7 places obj021):

  1. match quality   — top-1 distances within radius, unique query rows
  2. prescreen       — margin mass + force flag actually set
  3. tier-1          — presence score distribution over N keys, rank vs
                       the in-slab activation cut (top max_active_objects)
  4. tier-2          — accepted pose / inlier count when activated

CPU by default (slab-sized matching is host-feasible; DIAG_PLATFORM=tpu
for the real chip).  Usage:
  BENCH_OBJECTS=1000 N_KEYS=10 python tools/diag_explore021.py
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("DIAG_PLATFORM", "cpu"))

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from tod_tpu.geometry.detection import detect_frame_gathered  # noqa: E402
from tod_tpu.models import FusedDetector  # noqa: E402
from tod_tpu.models.fused import _stage_coarse_select  # noqa: E402
from tod_tpu.utils.synthetic import DEFAULT_K  # noqa: E402


def main():
    n_objects = int(os.environ.get("BENCH_OBJECTS", "1000"))
    n_keys = int(os.environ.get("N_KEYS", "10"))
    target_oid = os.environ.get("DIAG_OBJECT", "obj021")
    os.environ.setdefault("BENCH_COARSE", "8")
    os.environ.setdefault("BENCH_FINE", "64")
    os.environ.setdefault("BENCH_TRACK", "16")
    os.environ.setdefault("BENCH_EXPLORE", "16")
    objects, models = bench.build_db(n_objects)
    cfg = bench.build_config(int(os.environ.get("BENCH_FEATURES", "5000")))
    det = FusedDetector(models, cfg)
    oid_to_idx = {m.object_id: i for i, m in enumerate(models)}
    target = oid_to_idx[target_oid]

    # the scene that places the target (bench scenes place objects 3s..3s+2)
    scene_idx = target // 3
    scenes = bench.build_scenes(objects, scene_idx + 1)
    image, depth, gt = scenes[scene_idx]
    assert any(oid == target_oid for oid, _, _ in gt), "target not placed"

    s1, _s2, _s3 = det._stages
    gray, depth_j, K_j = det.prepare_frame(image, depth, DEFAULT_K)
    xy, qp, dsc, ok = s1(gray, depth_j, K_j)

    # explore ids: target in slot 0, the rest arbitrary distinct objects
    e = cfg.explore_width
    explore = jnp.asarray(
        [target] + [(target + 1 + i) % n_objects for i in range(e - 1)],
        jnp.int32)
    tracked = jnp.full((cfg.track_width,), -1, jnp.int32)  # nothing latched
    c1, c2, _c3 = det._coarse
    sel, force, force_act = c1(dsc, ok, det.cdb, tracked, explore)
    sel_np = np.asarray(sel)
    pos = int(np.nonzero(sel_np == target)[0][0])
    print(f"{target_oid} (idx {target}) slab position {pos} / {len(sel_np)} "
          f"(coarse width {len(sel_np) - cfg.track_width - e}), "
          f"force={bool(np.asarray(force)[pos])}", flush=True)

    # match quality on the gathered slab
    dist, rows = c2(dsc, det.sdb, sel)
    d_np = np.asarray(dist)[:, pos]
    ok_np = np.asarray(ok)
    within = (d_np <= cfg.radius) & ok_np
    print(f"matches within radius {cfg.radius}: {int(within.sum())} "
          f"(min dist {d_np[ok_np].min():.0f}, "
          f"median {np.median(d_np[ok_np]):.0f})", flush=True)

    # tier-1 + tier-2 across keys
    n_forced = cfg.track_width + e
    geom = jax.jit(lambda k: detect_frame_gathered(
        k, dist, rows, sel, ok, qp, xy, det.sdb.points, det.sdb.obj_start,
        det.sdb.spans, cfg.guess, cfg.activation, cfg.radius, force,
        n_forced, force_act))
    min_score = cfg.activation.min_score
    n_active = cfg.guess.max_active_objects
    act_hits = accept_hits = 0
    gt_T = next(T for oid, _R, T in gt if oid == target_oid)
    for k in range(n_keys):
        scores, detn = geom(jax.random.key(k))
        s_np = np.asarray(scores)
        rank = int((s_np > s_np[target]).sum())
        activated = s_np[target] >= min_score and rank < n_active
        act_hits += bool(activated)
        acc = np.asarray(detn.accepted[target])
        n_acc = int(acc.sum())
        hit = False
        confs = np.asarray(detn.n_inliers[target])[acc.astype(bool)]
        if n_acc:
            T_np = np.asarray(detn.T[target])[acc.astype(bool)]
            hit = bool((np.linalg.norm(T_np - gt_T, axis=-1) <= 0.02).any())
        accept_hits += hit
        cut = np.sort(s_np)[-n_active] if len(s_np) >= n_active else 0
        print(f"  key {k}: t1 score {int(s_np[target])} rank {rank} "
              f"(cut {int(cut)}, min {min_score}) "
              f"activated={activated} accepted={n_acc} "
              f"conf={confs.tolist()} hit2cm={hit}",
              flush=True)
    print(f"summary: activated {act_hits}/{n_keys}, "
          f"accepted-within-2cm {accept_hits}/{n_keys}", flush=True)


if __name__ == "__main__":
    main()
