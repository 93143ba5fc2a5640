"""Viewpoint/scale stress study: recall vs viewing tilt and vs distance.

The bench's scenes draw tilts up to ~29 deg and distances 0.75-1.05 m —
close to the training turntable's 0.8 m orbit. A real deployment sees the
catalog at oblique angles and at range, so this measures where detection
actually degrades:

  * TILT sweep: one object per frame, z = 0.9 m, controlled tilt of the
    object's trained (+z) side away from the camera: 0..75 deg. Each bin
    cycles N_PER_BIN distinct objects (mixed plane/box/cylinder) with a
    deterministic in-plane rotation, so a bin's recall is over many
    textures, not one.
  * DISTANCE sweep: tilt fixed at 15 deg, z = 0.5..2.0 m. At 2 m a 0.2 m
    object subtends ~50 px — the feature/scale floor.

Uses the CACHED bench DB + the exact bench operating point (bench.build_db
/ build_config), so numbers compose with the headline. Writes
STRESS_POSE.json.

Env: STRESS_OBJECTS (default 100), STRESS_PER_BIN (default 12),
STRESS_LEVELS (detection-side pyramid levels; default = operating point's
3 — more levels extend the matchable scale range toward far targets at
the same trained DB), STRESS_SWEEP=tilt|distance|both (default both),
DIAG_PLATFORM=cpu for a host run (tiny N recommended).
Run: cd /root/repo && python tools/stress_pose.py   (TPU; one client)
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if os.environ.get("DIAG_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["DIAG_PLATFORM"])

import bench  # noqa: E402


def rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float64)


def rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)


def stress_pose(obj, tilt_deg: float, z: float, az: float):
    """Model->camera pose with the object's trained side tilted
    ``tilt_deg`` away from the camera axis, at range ``z``."""
    from tod_tpu.utils.synthetic import SyntheticObject

    R = rot_x(np.radians(tilt_deg)) @ rot_z(az)
    if not isinstance(obj, SyntheticObject):
        # solids: present the trained (+z turntable-top) side to the camera
        R = R @ np.diag([1.0, -1.0, -1.0])
    T = np.array([0.0, 0.0, z])
    return R, T


def main():
    import jax  # noqa: F401

    from tod_tpu.models import FusedDetector
    from tod_tpu.utils.synthetic import DEFAULT_K, compose_scene

    bench.wait_for_devices()
    n = int(os.environ.get("STRESS_OBJECTS", "100"))
    per_bin = int(os.environ.get("STRESS_PER_BIN", "12"))
    objects, models = bench.build_db(n)
    cfg = bench.build_config(int(os.environ.get("BENCH_FEATURES", "5000")))
    levels = int(os.environ.get("STRESS_LEVELS", "0"))
    if levels:
        import dataclasses

        cfg = dataclasses.replace(cfg, n_levels=levels)
    det = FusedDetector(models, cfg)

    def run_bin(tag, picks, tilt, z):
        hits, terrs = 0, []
        for j, oi in enumerate(picks):
            obj = objects[oi]
            az = 2 * np.pi * j / max(len(picks), 1)
            R, T = stress_pose(obj, tilt, z, az)
            image, depth = compose_scene([obj], [(R, T)])
            found = det.detect(image, depth, DEFAULT_K)
            best = None
            for r in found:
                if r.object_id == obj.object_id:
                    dt = float(np.linalg.norm(r.T - T))
                    if best is None or dt < best:
                        best = dt
            if best is not None and best <= 0.02:
                hits += 1
                terrs.append(best)
        rec = hits / max(len(picks), 1)
        med = float(np.median(terrs) * 1000) if terrs else None
        print(f"  {tag}: recall {hits}/{len(picks)} = {rec:.3f}"
              + (f", median terr {med:.1f} mm" if med else ""), flush=True)
        return {"recall": round(rec, 4), "n": len(picks),
                "median_terr_mm": round(med, 2) if med else None}

    # object picks cycle the catalog so every bin sees planes+boxes+cylinders
    # and different bins see different textures
    sweep = os.environ.get("STRESS_SWEEP", "both")
    out = {"n_objects": n, "per_bin": per_bin,
           "shapes": os.environ.get("BENCH_SHAPES", "mixed"),
           "n_levels": cfg.n_levels, "tilt": {}, "distance": {}}
    t0 = time.time()
    if sweep in ("tilt", "both"):
        print("tilt sweep (z = 0.9 m):", flush=True)
        for bi, tilt in enumerate((0, 15, 30, 45, 60, 75)):
            picks = [(bi * per_bin + j) % n for j in range(per_bin)]
            out["tilt"][str(tilt)] = run_bin(f"tilt {tilt:2d} deg", picks,
                                             float(tilt), 0.9)
    if sweep in ("distance", "both"):
        print("distance sweep (tilt = 15 deg):", flush=True)
        for bi, z in enumerate((0.5, 0.75, 1.0, 1.25, 1.5, 1.75, 2.0)):
            picks = [((6 + bi) * per_bin + j) % n for j in range(per_bin)]
            out["distance"][f"{z:.2f}"] = run_bin(f"z {z:.2f} m", picks,
                                                  15.0, float(z))
    out["elapsed_s"] = round(time.time() - t0, 1)
    suffix = (f"_l{cfg.n_levels}" if levels else "")
    # record the EFFECTIVE capture plan (bench.build_db defaults apply when
    # the env knobs are unset — since round 4 the default is the widened
    # plan); suffix the output file only for non-default explicit overrides
    out["train_distances"] = os.environ.get("BENCH_TRAIN_DIST",
                                            bench.DEFAULT_TRAIN_DIST)
    out["train_elevations"] = os.environ.get("BENCH_TRAIN_ELEV",
                                             bench.DEFAULT_TRAIN_ELEV)
    td = os.environ.get("BENCH_TRAIN_DIST", "")
    if td and td != bench.DEFAULT_TRAIN_DIST:
        suffix += "_td" + td.replace(",", "-")
    te = os.environ.get("BENCH_TRAIN_ELEV", "")
    if te and te != bench.DEFAULT_TRAIN_ELEV:
        suffix += "_te" + te.replace(",", "-")
    # STRESS_TAG: explicit suffix for A/B runs under non-plan overrides
    # (e.g. budget knobs) so they never clobber the defaults record
    if os.environ.get("STRESS_TAG"):
        suffix += "_" + os.environ["STRESS_TAG"]
    path = os.path.join(REPO, f"STRESS_POSE{suffix}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
