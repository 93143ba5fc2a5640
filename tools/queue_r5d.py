"""Round-5d TPU queue: the coarse query-subsampling A/B at the frontier.

The dispatch-train profile puts the coarse stage near the matcher
roofline (~5 ms of 2048 x 1M pairs at the 1000-object frontier); object
RANKING does not need every query, so coarse_q_stride=2 halves that
stage. Two points: the frontier FPS with the lever on, and the explore
steady-recall validation (the selection statistic sees half the queries
— if steady recall drops below 1.000 the knob stays documented-off).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from queue_lib import REPO, Queue  # noqa: E402

q = Queue("queue_r5d", os.path.join(REPO, "SWEEP_R5D.json"))

OLD_PLAN = {"BENCH_TRAIN_DIST": "0.8", "BENCH_TRAIN_ELEV": "85,60,35"}
SHRUNK = {"BENCH_CONT": 128, "BENCH_HYP": 512}
FRONTIER = dict(BENCH_COARSE=16, BENCH_FINE=64, BENCH_TRACK=16,
                BENCH_EXPLORE=16, BENCH_PRESCREEN=32, BENCH_ACT_HYP=192,
                **SHRUNK, **OLD_PLAN)

q.run("frontier-fps-cq2", BENCH_OBJECTS=1000, BENCH_COARSE_Q=2, **FRONTIER)
q.run("explore-1000-cq2", entry="exp_explore:main",
      marker=os.path.join(REPO, "EXPLORE_BENCH_1000_s16_cq2.json"),
      EXPLORE_OBJECTS=1000, EXPLORE_STRIDE=16, EXPLORE_WIDTH=64,
      EXPLORE_E=16, EXPLORE_T=16, EXPLORE_SKIP_CONTROL=1, EXPLORE_TAG="cq2",
      BENCH_COARSE_Q=2, BENCH_PRESCREEN=32, BENCH_ACT_HYP=192,
      **SHRUNK, **OLD_PLAN)
q.finish()
