"""Per-stage timing at an arbitrary BENCH_* serving config (default: the
1000-object frontier point) via DISPATCH TRAINS — the tunnel-proof method.

The round-4 profiler measured each stage as (one synced dispatch) - (RTT
floor) and published NEGATIVE stage times: the tunnel RTT varies by
+/-5-15 ms between syncs, far above the millisecond stages being measured
(memory/axon notes). This version times a train of K identical stage
dispatches followed by ONE hard sync, at two K values: the device
executes dispatches serially, so

    t(K) = K * stage_ms + overhead(RTT, dispatch)

and stage_ms = (t(K2) - t(K1)) / (K2 - K1) cancels the overhead EXACTLY
instead of estimating it. Stage times are non-negative by construction and
are cross-checked against a whole-frame detect_raw train (stages must sum
to the frame within ~15%; the report flags it if they do not).

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

K_SHORT = int(os.environ.get("PROFILE_K1", "4"))
K_LONG = int(os.environ.get("PROFILE_K2", "36"))
N_REP = int(os.environ.get("PROFILE_REPS", "3"))


def sync(x):
    return float(np.asarray(x.ravel()[0] if hasattr(x, "ravel") else x))


def _last_leaf(out):
    first = out[0] if isinstance(out, tuple) else out
    if hasattr(first, "n_inliers"):
        first = first.n_inliers
    return first


def train_time(fn, *args, k):
    """Wall time of k dispatches + one hard sync (median of N_REP)."""
    ts = []
    for _ in range(N_REP):
        t0 = time.time()
        out = None
        for _i in range(k):
            out = fn(*args)
        sync(_last_leaf(out))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def time_stage(tag, fn, *args):
    out = fn(*args)          # compile
    sync(_last_leaf(out))
    t1 = train_time(fn, *args, k=K_SHORT)
    t2 = train_time(fn, *args, k=K_LONG)
    ms = 1e3 * (t2 - t1) / (K_LONG - K_SHORT)
    bench.log(f"  {tag}: {ms:.2f} ms/dispatch "
              f"(t{K_SHORT}={t1*1e3:.0f} ms, t{K_LONG}={t2*1e3:.0f} ms)")
    return ms, out


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

    bench.log(f"config: coarse {cfg.coarse_stride} fine {cfg.fine_width} "
              f"T {cfg.track_width} E {cfg.explore_width} "
              f"P {cfg.activation.prescreen} act_hyp "
              f"{cfg.activation.n_hypotheses} hyp "
              f"{cfg.guess.ransac.n_hypotheses} active "
              f"{cfg.guess.max_active_objects}; trains K={K_SHORT}/{K_LONG}")
    s1, _s2, _s3 = det._stages
    stages = {}
    stages["features"], (xy, qp, dsc, ok) = time_stage(
        "features+compact", s1, gray, depth_j, K_j)
    if det._coarse is not None:
        c1, c2, c3 = det._coarse
        if cfg.track_width or cfg.explore_width:
            trk = jnp.full((cfg.track_width,), -1, jnp.int32)
            exp = jnp.asarray(np.arange(cfg.explore_width, dtype=np.int32))
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
    else:
        _s1, s2, s3 = det._stages
        stages["match"], (dist, rows) = time_stage(
            "segmented match", s2, dsc, det.sdb)
        stages["geometry"], _ = time_stage(
            "geometry t1+t2", s3, key, xy, qp, ok, dist, rows,
            det.sdb.points, det.sdb.obj_start, det.sdb.spans)

    # whole-frame cross-check: a train of full detect_raw frames (includes
    # the host-side streaming state machinery the stages above skip)
    def frame():
        _, d = det.detect_raw(gray, depth_j, K_j)
        return d

    frame_ms, _ = time_stage("whole frame (detect_raw)", frame)
    total = sum(stages.values())
    gap_pct = 100.0 * (frame_ms - total) / max(frame_ms, 1e-9)
    bench.log(f"stage sum {total:.2f} ms vs frame {frame_ms:.2f} ms "
              f"(gap {gap_pct:+.1f}% — host state/dispatch overhead)")
    worst = max(stages, key=stages.get)
    bench.log(f"slowest stage: {worst} ({stages[worst]:.2f} ms) "
              f"-> streaming bound ~{1e3 / max(stages[worst], 1e-3):.1f} "
              "FPS")
    out_path = os.path.join(REPO, "PROFILE_FRONTIER.json")
    with open(out_path, "w") as f:
        json.dump({"method": f"dispatch trains K={K_SHORT}/{K_LONG}, "
                             "median of "
                             f"{N_REP}; overhead cancels in the difference",
                   "stages_ms": {k: round(v, 2) for k, v in stages.items()},
                   "frame_ms": round(frame_ms, 2),
                   "stage_sum_ms": round(total, 2),
                   "sum_vs_frame_gap_pct": round(gap_pct, 1),
                   "objects": n}, f, indent=1)
    bench.log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
