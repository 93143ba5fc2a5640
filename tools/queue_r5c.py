"""Round-5c TPU queue: the near-range mitigation measurement.

stress-near-p100 — the distance sweep with the prescreen opened to the
catalog size (`BENCH_PRESCREEN=100`): diag_nearrange.py attributed every
near-range miss at the default to prescreen exclusion (margin-mass ranks
44-92 vs P=32) and the CPU replay recovers 12/12 at both bins with the
screen open; this records the hardware row (STRESS_POSE_p100.json) that
SERVING.md's scale-shifted-viewing guidance cites.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from queue_lib import REPO, Queue  # noqa: E402

q = Queue("queue_r5c", os.path.join(REPO, "SWEEP_R5C.json"))

OLD_PLAN = {"BENCH_TRAIN_DIST": "0.8", "BENCH_TRAIN_ELEV": "85,60,35"}
SHRUNK = {"BENCH_CONT": 128, "BENCH_HYP": 512}

# explore-2000 retry: the first attempt OOMed packing a SECOND 26M-row
# catalog next to the control detector's; the explore arm alone fits
# (EXPLORE_SKIP_CONTROL; the control row 0.750 is in the failed run's log)
q.run("explore-2000", entry="exp_explore:main",
      marker=os.path.join(REPO, "EXPLORE_BENCH_2000_s16.json"),
      EXPLORE_OBJECTS=2000, EXPLORE_STRIDE=16, EXPLORE_WIDTH=64,
      EXPLORE_E=16, EXPLORE_T=16, EXPLORE_SKIP_CONTROL=1,
      BENCH_PRESCREEN=32, BENCH_ACT_HYP=192, timeout=14400.0,
      **SHRUNK, **OLD_PLAN)
q.run("stress-near-p100", entry="stress_pose:main",
      marker=os.path.join(REPO, "STRESS_POSE_p100.json"),
      STRESS_SWEEP="distance", STRESS_TAG="p100", BENCH_PRESCREEN=100)
q.finish()
