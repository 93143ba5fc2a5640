"""Measure exploration-slot discovery on the TPU (coarse->fine serving).

Workload: the bench's 100-object mixed DB (cached) + the 8 bench scenes,
served through a DELIBERATELY narrow coarse->fine screen (stride 8,
fine_width 16) so some present objects are coarse-screen-excluded — the
catalog-relative failure mode exploration exists for (PROGRESS.md: at 1000
objects CF C=96 permanently misses obj003/obj006/obj021).

Arms (identical slab width -> identical per-frame cost):
  control  — CF 8/16, no explore/track: each scene detected once
             (stateless; every frame would be identical).
  explore  — CF 8/16 with explore_width=4 + track_width=4 (8 coarse
             slots): each scene streamed ceil(100/4)+3 = 28 frames;
             per placement we record the first frame it is detected
             within 2cm and whether it stays detected over the last
             3 frames (steady state, latched by tracking).

Expected: control recall < explore steady-state recall; discovery within
one 25-frame rotation cycle; per-frame time within noise of control.

Run: cd /root/repo && python tools/exp_explore.py   (TPU; one client)
Writes EXPLORE_BENCH.json.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def _hits(found, gt):
    """Set of ground-truth placement indices detected within 2cm."""
    out = set()
    for i, (oid, _gt_R, gt_T) in enumerate(gt):
        if any(r.object_id == oid
               and float(np.linalg.norm(r.T - gt_T)) <= 0.02
               for r in found):
            out.add(i)
    return out


def main():
    bench.log(f"devices: {bench.wait_for_devices()}")
    from tod_tpu.geometry.detection import AGE_NEVER
    from tod_tpu.models import FusedDetector
    from tod_tpu.utils.synthetic import DEFAULT_K
    import jax.numpy as jnp

    n_objects = int(os.environ.get("EXPLORE_OBJECTS", "100"))
    # align the operating point with the scaling sweep: build_config's
    # prescreen default grows with BENCH_OBJECTS (max(32, O/12))
    os.environ.setdefault("BENCH_OBJECTS", str(n_objects))
    objects, models = bench.build_db(n_objects)
    scenes = bench.build_scenes(objects, 8)
    base = bench.build_config(5000)

    stride = int(os.environ.get("EXPLORE_STRIDE", "8"))
    width = int(os.environ.get("EXPLORE_WIDTH", "16"))
    e_width = int(os.environ.get("EXPLORE_E", "4"))
    t_width = int(os.environ.get("EXPLORE_T", "4"))
    ttl = int(os.environ.get("EXPLORE_TTL", "2"))
    cycle = -(-len(models) // e_width)          # 25 frames
    n_stream = cycle + 3

    cfg_ctl = dataclasses.replace(base, coarse_stride=stride,
                                  fine_width=width)
    cfg_exp = dataclasses.replace(cfg_ctl, explore_width=e_width,
                                  track_width=t_width, track_ttl=ttl)

    # ---- control: narrow CF, stateless ------------------------------------
    # EXPLORE_SKIP_CONTROL=1 skips it: at very large catalogs two resident
    # packed DBs (control + explore detectors) exceed single-chip HBM —
    # the 2000-object point OOMed exactly there while the explore arm
    # alone fits fine (queue_r5b explore-2000 postmortem)
    n_placed = sum(len(gt) for _i, _d, gt in scenes)
    ctl_recall = None
    ctl_times = [float("nan")]
    if os.environ.get("EXPLORE_SKIP_CONTROL") != "1":
        det = FusedDetector(models, cfg_ctl)
        ctl_hits = 0
        ctl_times = []
        for image, depth, gt in scenes:
            frame = det.prepare_frame(image, depth, DEFAULT_K)
            det.detect(*frame)                  # warm compile before timing
            t0 = time.time()
            found = det.detect(*frame)
            ctl_times.append(time.time() - t0)
            ctl_hits += len(_hits(found, gt))
        ctl_recall = ctl_hits / n_placed
        bench.log(f"control (CF {stride}/{width}): recall@2cm "
                  f"{ctl_hits}/{n_placed} = {ctl_recall:.3f}, "
                  f"per-frame p50 {np.median(ctl_times)*1e3:.1f} ms")
        # free the control detector's device DB before packing the explore
        # one (two resident packed catalogs OOM at 2000 objects)
        del det

    # ---- explore arm: same widths, 4 explore + 4 tracked slots -------------
    det = FusedDetector(models, cfg_exp)
    first_seen = []                # discovery frame per placement (or None)
    steady_hits, exp_times = 0, []
    for s, (image, depth, gt) in enumerate(scenes):
        # reset streaming state: each scene is an independent stream
        det._age = jnp.full_like(det._age, AGE_NEVER)
        det._explore_pos = 0
        det._last_coarse_sel = None
        frame = det.prepare_frame(image, depth, DEFAULT_K)
        seen = {}
        tail = []
        for t in range(n_stream):
            t0 = time.time()
            found = det.detect(*frame)
            if s or t:                           # skip scene-0 compile frame
                exp_times.append(time.time() - t0)
            h = _hits(found, gt)
            for i in h:
                seen.setdefault(i, t)
            if t >= n_stream - 3:
                tail.append(h)
        steady = set.intersection(*tail) if tail else set()
        steady_hits += len(steady)
        first_seen += [(gt[i][0], seen.get(i)) for i in range(len(gt))]
        bench.log(f"  scene {s}: discovered {sorted(seen.values())} "
                  f"steady {len(steady)}/{len(gt)}")
    exp_recall = steady_hits / n_placed
    disc = [f for _, f in first_seen if f is not None]
    bench.log(f"explore (E={e_width} T={t_width}, cycle {cycle}): "
              f"steady-state recall@2cm {steady_hits}/{n_placed} = "
              f"{exp_recall:.3f}, discovery frame p50 "
              f"{np.median(disc):.0f} max {max(disc)}, per-frame p50 "
              f"{np.median(exp_times)*1e3:.1f} ms")

    out = {
        "workload": f"{n_objects}-object mixed bench DB, 8 bench scenes, "
                    f"CF stride {stride} fine_width {width}",
        "control_recall": (round(ctl_recall, 4)
                           if ctl_recall is not None else None),
        "control_ms_p50": (round(float(np.median(ctl_times)) * 1e3, 2)
                           if ctl_recall is not None else None),
        "explore_width": e_width, "track_width": t_width,
        "track_ttl": ttl,
        "cycle_frames": cycle,
        "explore_steady_recall": round(exp_recall, 4),
        "explore_ms_p50": round(float(np.median(exp_times)) * 1e3, 2),
        "discovery_frame_p50": float(np.median(disc)) if disc else None,
        "discovery_frame_max": int(max(disc)) if disc else None,
        "first_seen": [(oid, f) for oid, f in first_seen],
    }
    name = ("EXPLORE_BENCH.json" if n_objects == 100
            else f"EXPLORE_BENCH_{n_objects}.json")
    if stride != 8:   # non-default stride: keep the default-stride record
        name = name.replace(".json", f"_s{stride}.json")
    # EXPLORE_TAG: explicit suffix for A/B runs so they never clobber the
    # headline record
    if os.environ.get("EXPLORE_TAG"):
        name = name.replace(".json", f"_{os.environ['EXPLORE_TAG']}.json")
    with open(os.path.join(REPO, name), "w") as f:
        json.dump(out, f, indent=1)
    bench.log(f"wrote {name}")


if __name__ == "__main__":
    main()
