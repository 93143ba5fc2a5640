"""Per-stage timing of the coarse->fine serving path vs the full sweep.

The exp_explore control measured CF 8/16 at ~147 ms p50 on the 100-object
DB where the default full sweep runs ~53 ms — CF should strictly reduce
match work, so something in the CF dispatch chain is pathological at small
widths. Time each jitted stage with hard syncs (scalar download) to find it.

Run: cd /root/repo && python tools/diag_cf_stages.py   (TPU; one client)
"""

import dataclasses
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def sync(x):
    # download ONE element (the tunnel costs ~25 ms/MB; pulling a whole
    # (Q, O) distance matrix would swamp the stage being timed)
    return float(np.asarray(x.ravel()[0]))


def time_stage(fn, *args, n=10):
    out = fn(*args)
    sync(out[0] if isinstance(out, tuple) else
         out.n_inliers if hasattr(out, "n_inliers") else out)
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        sync(out[0] if isinstance(out, tuple) else
             out.n_inliers if hasattr(out, "n_inliers") else out)
        ts.append(time.time() - t0)
    return 1e3 * float(np.median(ts)), out


def main():
    bench.log(f"devices: {bench.wait_for_devices()}")
    import jax

    from tod_tpu.models import FusedDetector
    from tod_tpu.utils.synthetic import DEFAULT_K

    objects, models = bench.build_db(100)
    scenes = bench.build_scenes(objects, 1)
    image, depth, _gt = scenes[0]
    base = bench.build_config(5000)

    def time_chain(det, key, gray, depth_j, K_j, n=10):
        """End-to-end detect_raw latency: all stages dispatched back to
        back, ONE final scalar sync (how a driver would actually run)."""
        _, out = det.detect_raw(gray, depth_j, K_j)
        sync(out.n_inliers)
        ts = []
        for _ in range(n):
            t0 = time.time()
            _, out = det.detect_raw(gray, depth_j, K_j)
            sync(out.n_inliers)
            ts.append(time.time() - t0)
        return 1e3 * float(np.median(ts))

    def time_detect(det, image, depth, n=10):
        """Full detect(): device frame prepared once, host PoseResult
        extraction included (what exp_explore measured)."""
        frame = det.prepare_frame(image, depth, DEFAULT_K)
        det.detect(*frame)
        ts = []
        for _ in range(n):
            t0 = time.time()
            det.detect(*frame)
            ts.append(time.time() - t0)
        return 1e3 * float(np.median(ts))

    for tag, cfg in [
        ("full sweep", base),
        ("CF 8/16", dataclasses.replace(base, coarse_stride=8,
                                        fine_width=16)),
        ("CF 8/64", dataclasses.replace(base, coarse_stride=8,
                                        fine_width=64)),
        ("CF 4/16", dataclasses.replace(base, coarse_stride=4,
                                        fine_width=16)),
    ]:
        det = FusedDetector(models, cfg)
        gray, depth_j, K_j = det.prepare_frame(image, depth, DEFAULT_K)
        key = jax.random.PRNGKey(0)
        s1, s2, s3 = det._stages
        t1, (xy, qp, dsc, ok) = time_stage(s1, gray, depth_j, K_j)
        if det._coarse is not None:
            c1, c2, c3 = det._coarse
            tc, sel = time_stage(c1, dsc, ok, det.cdb)
            tm, (dist, rows) = time_stage(c2, dsc, det.sdb, sel)
            tg, det_out = time_stage(
                c3, key, xy, qp, ok, dist, rows, sel, det.sdb.points,
                det.sdb.obj_start, det.sdb.spans)
            bench.log(f"{tag}: features {t1:.1f} | coarse {tc:.1f} | "
                      f"fine match {tm:.1f} | geometry {tg:.1f} "
                      f"= {t1+tc+tm+tg:.1f} ms")
            bench.log(f"{tag}: chained detect_raw "
                      f"{time_chain(det, key, gray, depth_j, K_j):.1f} ms | "
                      f"full detect() {time_detect(det, image, depth):.1f} "
                      f"ms")
        else:
            tm, (dist, rows) = time_stage(s2, dsc, det.sdb)
            tg, det_out = time_stage(
                s3, key, xy, qp, ok, dist, rows, det.sdb.points,
                det.sdb.obj_start, det.sdb.spans)
            bench.log(f"{tag}: features {t1:.1f} | match {tm:.1f} | "
                      f"geometry {tg:.1f} = {t1+tm+tg:.1f} ms")
            bench.log(f"{tag}: chained detect_raw "
                      f"{time_chain(det, key, gray, depth_j, K_j):.1f} ms | "
                      f"full detect() {time_detect(det, image, depth):.1f} "
                      f"ms")


if __name__ == "__main__":
    main()
