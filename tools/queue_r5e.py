"""Round-5e TPU queue: the coarse_q_stride=2 frontier rows at 400 and
2000 objects (completing the improved per-chip scale law the 1000-object
A/B opened: 37.5 -> 43.6 FPS at steady recall 1.000)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from queue_lib import REPO, Queue  # noqa: E402

q = Queue("queue_r5e", os.path.join(REPO, "SWEEP_R5E.json"))

OLD_PLAN = {"BENCH_TRAIN_DIST": "0.8", "BENCH_TRAIN_ELEV": "85,60,35"}
SHRUNK = {"BENCH_CONT": 128, "BENCH_HYP": 512}
FRONTIER = dict(BENCH_COARSE=16, BENCH_FINE=64, BENCH_TRACK=16,
                BENCH_EXPLORE=16, BENCH_PRESCREEN=32, BENCH_ACT_HYP=192,
                BENCH_COARSE_Q=2, **SHRUNK, **OLD_PLAN)

q.run("frontier-400-cq2", BENCH_OBJECTS=400, **FRONTIER)
q.run("frontier-2000-cq2", BENCH_OBJECTS=2000, timeout=14400.0, **FRONTIER)
q.finish()
