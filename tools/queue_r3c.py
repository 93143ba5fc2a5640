"""Round-3 TPU measurement queue: one process, one tunnel connection.

1. default 100-object bench (sanity + fresh headline numbers)
2. coarse->fine sweep: 400:8:64, 800:8:96, 1000:8:96 (the pending
   single-chip sub-linear-scaling measurement, PROGRESS.md)
3. SIFT coarse->fine point (exercises the gathered-L2 hardware parity
   gate + measures the L2 CF mode)
"""
import gc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def run(tag, **env):
    for k in ("BENCH_OBJECTS", "BENCH_COARSE", "BENCH_FINE",
              "BENCH_FEATURE"):
        os.environ.pop(k, None)
    os.environ.update({k: str(v) for k, v in env.items()})
    bench.log(f"=== queue point: {tag} ===")
    try:
        bench.main()
    except Exception as e:  # keep the queue alive for later points
        bench.log(f"POINT FAILED ({tag}): {type(e).__name__}: {e}")
    gc.collect()


run("default-100")
run("cf-400", BENCH_OBJECTS=400, BENCH_COARSE=8, BENCH_FINE=64)
run("cf-800", BENCH_OBJECTS=800, BENCH_COARSE=8, BENCH_FINE=96)
run("cf-1000", BENCH_OBJECTS=1000, BENCH_COARSE=8, BENCH_FINE=96)
run("sift-cf-100", BENCH_FEATURE="SIFT", BENCH_COARSE=4, BENCH_FINE=16)
