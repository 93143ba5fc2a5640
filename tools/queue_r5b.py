"""Round-5b TPU queue: settled-soak rerun, the SIFT evidence package, and
the 2000-object scale row (VERDICT r4 tasks 1, 6, 8).

  1. soak-1000-b128 — the 1000-frame frontier soak with the settled-recall
     metrics (tools/soak.py): block 128 = 2x the 63-frame exploration
     rotation cycle, so every block has a post-rotation settled window;
     discovery latency is reported separately instead of polluting the
     steady number (the b64 run measured exactly that pollution: 0.809
     every-frame recall with ~half of each block inside the rotation).
  2. sift-bench — BENCH_FEATURE=SIFT on the shipped widened default plan
     (trains + caches the SIFT DB; refreshes SIFT_BENCH.json)
  3. sift-stress — the SIFT serving path through the same stress bins the
     ORB default is measured on (STRESS_POSE_sift.json)
  4. sift-soak — 1000-frame SIFT serving soak at the 100-object default
     (SOAK_sift.json)
  5. train-2000 — extend the classic-plan training cache to 2000 objects
     (seeds from the n1000 cache; snapshots every 200)
  6. frontier-2000 — the frontier recipe at 2000 objects, one chip
     (third measured point of the per-chip scale law)
  7. explore-2000 — steady-state recall at 2000 (the scale row's recall
     evidence; stride 16, wider explore keeps the rotation cycle ~1 block)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from queue_lib import REPO, Queue  # noqa: E402

q = Queue("queue_r5b", os.path.join(REPO, "SWEEP_R5B.json"))

OLD_PLAN = {"BENCH_TRAIN_DIST": "0.8", "BENCH_TRAIN_ELEV": "85,60,35"}
SHRUNK = {"BENCH_CONT": 128, "BENCH_HYP": 512}

q.run("soak-1000-b128", entry="soak:main",
      marker=os.path.join(REPO, "SOAK_CF_1000_b128.json"),
      SOAK_OBJECTS=1000, SOAK_COARSE=16, SOAK_FINE=64, SOAK_E=16,
      SOAK_T=16, SOAK_GATE=24, SOAK_BLOCK=128, BENCH_PRESCREEN=32,
      BENCH_ACT_HYP=192, **SHRUNK, **OLD_PLAN)
q.run("soak-400-b128", entry="soak:main",
      marker=os.path.join(REPO, "SOAK_CF_400_b128.json"),
      SOAK_OBJECTS=400, SOAK_COARSE=16, SOAK_FINE=64, SOAK_E=16,
      SOAK_T=16, SOAK_GATE=24, SOAK_BLOCK=128, BENCH_PRESCREEN=32,
      BENCH_ACT_HYP=192, **SHRUNK, **OLD_PLAN)
q.run("sift-bench", BENCH_FEATURE="SIFT", timeout=14400.0)
q.run("sift-stress", entry="stress_pose:main",
      marker=os.path.join(REPO, "STRESS_POSE_sift.json"),
      STRESS_TAG="sift", BENCH_FEATURE="SIFT")
q.run("sift-soak", entry="soak:main",
      marker=os.path.join(REPO, "SOAK_sift.json"),
      SOAK_TAG="sift", BENCH_FEATURE="SIFT", SOAK_GATE=24)
q.run("train-2000", entry="train_db:main",
      marker=os.path.join(REPO, ".bench_cache", "db_n2000_s0_d8_mixed.npz"),
      timeout=21600.0, BENCH_OBJECTS=2000, **OLD_PLAN)
q.run("frontier-2000", BENCH_OBJECTS=2000, BENCH_COARSE=16, BENCH_FINE=64,
      BENCH_TRACK=16, BENCH_EXPLORE=16, BENCH_PRESCREEN=32,
      BENCH_ACT_HYP=192, timeout=14400.0, **SHRUNK, **OLD_PLAN)
q.run("explore-2000", entry="exp_explore:main",
      marker=os.path.join(REPO, "EXPLORE_BENCH_2000_s16.json"),
      EXPLORE_OBJECTS=2000, EXPLORE_STRIDE=16, EXPLORE_WIDTH=64,
      EXPLORE_E=16, EXPLORE_T=16, BENCH_PRESCREEN=32, BENCH_ACT_HYP=192,
      timeout=14400.0, **SHRUNK, **OLD_PLAN)
q.finish()
