"""Round-5a TPU queue: harden the frontier's evidence on the post-fix tree
(VERDICT r4 tasks 1-4, 7, 10).  One fresh subprocess per point
(queue_lib v2).

  1. explore-frontier — the obj021 fix validated end-to-end: the
     activation-cut reserve + latch gate must turn first_seen[obj021]
     non-null and push steady recall 0.958 -> 1.000 at 1000 objects
  2. frontier-fps — the 34.6 FPS frontier streaming row re-measured on
     the fixed tree (reserve + per-pose quality stats cost check)
  3. soak-1000-b64 — the shipped frontier config soaked 1000 frames in
     BLOCKED scene order (64 consecutive frames/scene keeps the ttl-2
     latch alive — round-robin defeated it in the r4 soak)
  4. explore-400 / frontier-400-fps / soak-400-b64 — the 400-object
     frontier operating point tuned + soaked (r4 left 400 at 0.878
     steady with 6 flickers and no slots tuning)
  5. profile-frontier — the dispatch-train stage decomposition (replaces
     the negative-ms RTT-subtraction profile)
  6. stress-default — the shipped-default stress bins re-measured on the
     fixed tree (near-range rows 0.833 are the r5 target)
  7. default-final — zero-override headline so BENCH_LAST.json carries
     the v2 quality curve on exactly what the driver measures
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from queue_lib import REPO, Queue  # noqa: E402

q = Queue("queue_r5a", os.path.join(REPO, "SWEEP_R5A.json"))

OLD_PLAN = {"BENCH_TRAIN_DIST": "0.8", "BENCH_TRAIN_ELEV": "85,60,35"}
SHRUNK = {"BENCH_CONT": 128, "BENCH_HYP": 512}
FRONTIER = dict(BENCH_COARSE=16, BENCH_FINE=64, BENCH_TRACK=16,
                BENCH_EXPLORE=16, BENCH_PRESCREEN=32, BENCH_ACT_HYP=192,
                **SHRUNK, **OLD_PLAN)

q.run("explore-frontier", entry="exp_explore:main",
      marker=os.path.join(REPO, "EXPLORE_BENCH_1000_s16.json"),
      EXPLORE_OBJECTS=1000, EXPLORE_STRIDE=16, EXPLORE_WIDTH=64,
      EXPLORE_E=16, EXPLORE_T=16, BENCH_PRESCREEN=32, BENCH_ACT_HYP=192,
      **SHRUNK, **OLD_PLAN)
q.run("frontier-fps", BENCH_OBJECTS=1000, **FRONTIER)
q.run("soak-1000-b64", entry="soak:main",
      marker=os.path.join(REPO, "SOAK_CF_1000_b64.json"),
      SOAK_OBJECTS=1000, SOAK_COARSE=16, SOAK_FINE=64, SOAK_E=16,
      SOAK_T=16, SOAK_GATE=24, SOAK_BLOCK=64, BENCH_PRESCREEN=32,
      BENCH_ACT_HYP=192, **SHRUNK, **OLD_PLAN)
q.run("explore-400", entry="exp_explore:main",
      marker=os.path.join(REPO, "EXPLORE_BENCH_400_s16.json"),
      EXPLORE_OBJECTS=400, EXPLORE_STRIDE=16, EXPLORE_WIDTH=64,
      EXPLORE_E=16, EXPLORE_T=16, BENCH_PRESCREEN=32, BENCH_ACT_HYP=192,
      **SHRUNK, **OLD_PLAN)
q.run("frontier-400-fps", BENCH_OBJECTS=400, **FRONTIER)
q.run("soak-400-b64", entry="soak:main",
      marker=os.path.join(REPO, "SOAK_CF_400_b64.json"),
      SOAK_OBJECTS=400, SOAK_COARSE=16, SOAK_FINE=64, SOAK_E=16,
      SOAK_T=16, SOAK_GATE=24, SOAK_BLOCK=64, BENCH_PRESCREEN=32,
      BENCH_ACT_HYP=192, **SHRUNK, **OLD_PLAN)
q.run("profile-frontier", entry="profile_frontier:main",
      marker=os.path.join(REPO, "PROFILE_FRONTIER.json"),
      BENCH_OBJECTS=1000, **FRONTIER)
q.run("stress-default", entry="stress_pose:main",
      marker=os.path.join(REPO, "STRESS_POSE.json"))
q.run("default-final")
q.finish()
