"""Per-stage timing at an arbitrary BENCH_* serving config (default: the
1000-object frontier point), hard-synced, with the tunnel-RTT floor
measured and subtracted in the report.

Streaming FPS is bounded by the SLOWEST stage (stage dispatches pipeline
across frames), so the optimization target at any operating point is the
max stage, not the sum.  Usage (TPU; one client):

  BENCH_OBJECTS=1000 BENCH_COARSE=16 BENCH_FINE=64 BENCH_TRACK=16 \
  BENCH_EXPLORE=16 BENCH_PRESCREEN=32 BENCH_ACT_HYP=192 BENCH_CONT=128 \
  BENCH_HYP=512 BENCH_TRAIN_DIST=0.8 BENCH_TRAIN_ELEV=85,60,35 \
  python tools/profile_frontier.py
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def sync(x):
    return float(np.asarray(x.ravel()[0] if hasattr(x, "ravel")
                            else x))


def main():
    bench.log(f"devices: {bench.wait_for_devices()}")
    import jax
    import jax.numpy as jnp

    from tod_tpu.models import FusedDetector
    from tod_tpu.utils.synthetic import DEFAULT_K

    n = int(os.environ.get("BENCH_OBJECTS", "1000"))
    objects, models = bench.build_db(n)
    cfg = bench.build_config(int(os.environ.get("BENCH_FEATURES", "5000")))
    det = FusedDetector(models, cfg)
    scenes = bench.build_scenes(objects, 1)
    image, depth, _gt = scenes[0]
    gray, depth_j, K_j = det.prepare_frame(image, depth, DEFAULT_K)
    key = jax.random.PRNGKey(0)

    # RTT floor: trivial jitted op + scalar download, fresh value each rep
    tiny = jax.jit(lambda i: (depth_j.astype(jnp.int32).sum() + i))
    sync(tiny(0))
    rtts = []
    for i in range(12):
        t0 = time.time()
        sync(tiny(i + 1))
        rtts.append(time.time() - t0)
    rtt = 1e3 * float(np.median(rtts))

    def time_stage(tag, fn, *args, n_rep=8):
        out = fn(*args)
        first = out[0] if isinstance(out, tuple) else out
        if hasattr(first, "n_inliers"):
            first = first.n_inliers
        sync(first)
        ts = []
        for _ in range(n_rep):
            t0 = time.time()
            out = fn(*args)
            f2 = out[0] if isinstance(out, tuple) else out
            if hasattr(f2, "n_inliers"):
                f2 = f2.n_inliers
            sync(f2)
            ts.append(time.time() - t0)
        ms = 1e3 * float(np.median(ts))
        bench.log(f"  {tag}: {ms:.1f} ms synced (~{max(ms - rtt, 0.0):.1f} "
                  "ms on-chip)")
        return ms - rtt, out

    bench.log(f"RTT floor: {rtt:.1f} ms; config: coarse {cfg.coarse_stride} "
              f"fine {cfg.fine_width} T {cfg.track_width} E "
              f"{cfg.explore_width} P {cfg.activation.prescreen} act_hyp "
              f"{cfg.activation.n_hypotheses} hyp "
              f"{cfg.guess.ransac.n_hypotheses} active "
              f"{cfg.guess.max_active_objects}")
    s1, _s2, _s3 = det._stages
    stages = {}
    stages["features"], (xy, qp, dsc, ok) = time_stage(
        "features+compact", s1, gray, depth_j, K_j)
    if det._coarse is not None:
        c1, c2, c3 = det._coarse
        if cfg.track_width or cfg.explore_width:
            trk = jnp.full((cfg.track_width,), -1, jnp.int32)
            exp = jnp.asarray(
                np.arange(cfg.explore_width, dtype=np.int32))
            stages["coarse"], (sel, force, fact) = time_stage(
                "coarse select+slots", c1, dsc, ok, det.cdb, trk, exp)
        else:
            stages["coarse"], out = time_stage(
                "coarse select", c1, dsc, ok, det.cdb)
            sel, force, fact = out if isinstance(out, tuple) \
                else (out, None, None)
        stages["fine"], (dist, rows) = time_stage(
            "fine gathered match", c2, dsc, det.sdb, sel)
        stages["geometry"], _ = time_stage(
            "geometry t1+t2", c3, key, xy, qp, ok, dist, rows, sel,
            det.sdb.points, det.sdb.obj_start, det.sdb.spans, force, fact,
            None)
    worst = max(stages, key=stages.get)
    bench.log(f"slowest stage: {worst} ({stages[worst]:.1f} ms on-chip) "
              f"-> streaming bound ~{1e3 / max(stages[worst], 1e-3):.1f} "
              "FPS")
    out_path = os.path.join(REPO, "PROFILE_FRONTIER.json")
    with open(out_path, "w") as f:
        json.dump({"rtt_ms": rtt,
                   "stages_ms_onchip": {k: round(v, 2)
                                        for k, v in stages.items()},
                   "objects": n}, f, indent=1)
    bench.log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
