"""Per-placement diagnosis of the 75-deg tilt bin (STRESS_POSE.json):
which objects miss, their shape, and whether the failure is activation
(no accepted pose at all) or pose error. Run with/without
BENCH_TRAIN_ELEV to compare capture plans. TPU; one client."""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from tools.stress_pose import stress_pose  # noqa: E402


def main():
    from tod_tpu.models import FusedDetector
    from tod_tpu.utils.synthetic import (DEFAULT_K, SyntheticBox,
                                         SyntheticCylinder, compose_scene)

    bench.wait_for_devices()
    n = int(os.environ.get("STRESS_OBJECTS", "100"))
    objects, models = bench.build_db(n)
    cfg = bench.build_config(5000)
    det = FusedDetector(models, cfg)
    tilt = float(os.environ.get("TILT", "75"))
    per_bin = 12
    bi = 5
    picks = [(bi * per_bin + j) % n for j in range(per_bin)]
    for j, oi in enumerate(picks):
        obj = objects[oi]
        az = 2 * np.pi * j / len(picks)
        R, T = stress_pose(obj, tilt, 0.9, az)
        image, depth = compose_scene([obj], [(R, T)])
        found = det.detect(image, depth, DEFAULT_K)
        mine = [r for r in found if r.object_id == obj.object_id]
        others = len(found) - len(mine)
        shape = ("box" if isinstance(obj, SyntheticBox) else
                 "cyl" if isinstance(obj, SyntheticCylinder) else "plane")
        if mine:
            best = min(mine, key=lambda r: np.linalg.norm(r.T - T))
            dt = float(np.linalg.norm(best.T - T))
            print(f"{obj.object_id} {shape:5s} az={np.degrees(az):5.1f} "
                  f"dt={dt * 100:6.2f} cm conf={best.confidence:.0f} "
                  f"n_mine={len(mine)} n_other={others} "
                  f"{'HIT' if dt <= 0.02 else 'MISS-pose'}", flush=True)
        else:
            print(f"{obj.object_id} {shape:5s} az={np.degrees(az):5.1f} "
                  f"NO ACCEPTED POSE (n_other={others}) MISS-activation",
                  flush=True)


if __name__ == "__main__":
    main()
