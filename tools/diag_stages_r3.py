"""Per-stage timings at the EXACT bench operating point (fresh, round 3).

Uses bench.build_db/build_config/build_scenes so the measurement is the
benched configuration, not an approximation. Hard-syncs every stage
boundary (tunnel rule: sync via np.asarray(jax.device_get(...))).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402

import bench  # noqa: E402


def sync(*xs):
    import jax
    for x in xs:
        np.asarray(jax.device_get(x))


def main():
    import jax

    bench.wait_for_devices()
    n = int(os.environ.get("BENCH_OBJECTS", "100"))
    objects, models = bench.build_db(n)
    cfg = bench.build_config(int(os.environ.get("BENCH_FEATURES", "5000")))
    from tod_tpu.models import FusedDetector
    det = FusedDetector(models, cfg)
    scenes = bench.build_scenes(objects, n_scenes=2)
    image, depth, _ = scenes[0]
    gray, depth_j, K_j = det.prepare_frame(image, depth,
                                           bench.DEFAULT_K
                                           if hasattr(bench, "DEFAULT_K")
                                           else np.array(
                                               [[525., 0, 319.5],
                                                [0, 525., 239.5],
                                                [0, 0, 1]], np.float32))
    s1, s2, s3 = det._stages
    key = jax.random.PRNGKey(0)

    # warm all three stages
    xy, qp, dsc, ok = s1(gray, depth_j, K_j)
    dist, rows = s2(dsc, det.sdb)
    d0 = s3(key, xy, qp, ok, dist, rows, det.sdb.points,
            det.sdb.obj_start, det.sdb.spans)
    sync(d0.accepted)

    reps = int(os.environ.get("REPS", "20"))
    for name in ("features", "match", "geometry", "all-chained"):
        t0 = time.time()
        for _ in range(reps):
            if name == "features":
                out = s1(gray, depth_j, K_j)
                sync(out[3])
            elif name == "match":
                out = s2(dsc, det.sdb)
                sync(out[0])
            elif name == "geometry":
                det_o = s3(key, xy, qp, ok, dist, rows, det.sdb.points,
                           det.sdb.obj_start, det.sdb.spans)
                sync(det_o.accepted)
            else:
                a, b, c, d = s1(gray, depth_j, K_j)
                di, ro = s2(c, det.sdb)
                det_o = s3(key, a, b, d, di, ro, det.sdb.points,
                           det.sdb.obj_start, det.sdb.spans)
                sync(det_o.accepted)
        dt = (time.time() - t0) / reps * 1000
        print(f"{name:12s} {dt:7.2f} ms", flush=True)

    # tier-1-only vs full geometry: time geometry with max_active=0 is not
    # configurable; instead time prescreen+tier1 via detect_frame_segmented
    # scores path by rebuilding a geometry jit that returns scores only.
    import functools

    import jax.numpy as jnp

    from tod_tpu.geometry.detection import detect_frame_segmented

    def geom_scores(key, xy, qp, ok, dist, rows, points, obj_start, spans):
        s, _ = detect_frame_segmented(key, dist, rows, ok, qp, xy, points,
                                      obj_start, spans, cfg.guess,
                                      cfg.activation, cfg.radius)
        return s

    jg = jax.jit(geom_scores)
    s = jg(key, xy, qp, ok, dist, rows, det.sdb.points, det.sdb.obj_start,
           det.sdb.spans)
    sync(s)
    t0 = time.time()
    for _ in range(reps):
        s = jg(key, xy, qp, ok, dist, rows, det.sdb.points,
               det.sdb.obj_start, det.sdb.spans)
        sync(s)
    print(f"{'tier1(+pre)':12s} {(time.time() - t0) / reps * 1000:7.2f} ms "
          f"(geometry minus this ~= tier2+scatter)", flush=True)


if __name__ == "__main__":
    main()
