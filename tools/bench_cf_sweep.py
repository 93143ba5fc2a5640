"""Measure several coarse->fine bench points in ONE process / ONE tunnel
connection (the v5e tunnel is single-client and can refuse connections for
a long time after a disconnect, so N separate bench runs are N chances to
wedge it). Reuses bench.main() verbatim per point — each point prints its
own one-line JSON — with the point's knobs injected via env.

Usage: python tools/bench_cf_sweep.py [N:STRIDE:FINE ...]
Default points: 400:8:64 800:8:96 1000:8:96
"""
import gc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

POINTS = [tuple(int(v) for v in a.split(":")) for a in sys.argv[1:]] or [
    (400, 8, 64), (800, 8, 96), (1000, 8, 96)]

for n, stride, fine in POINTS:
    os.environ["BENCH_OBJECTS"] = str(n)
    os.environ["BENCH_COARSE"] = str(stride)
    os.environ["BENCH_FINE"] = str(fine)
    bench.log(f"=== sweep point: {n} objects, coarse stride {stride}, "
              f"fine width {fine} ===")
    bench.main()
    gc.collect()
