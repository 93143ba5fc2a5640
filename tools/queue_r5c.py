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

q.run("stress-near-p100", entry="stress_pose:main",
      marker=os.path.join(REPO, "STRESS_POSE_p100.json"),
      STRESS_SWEEP="distance", STRESS_TAG="p100", BENCH_PRESCREEN=100)
q.finish()
