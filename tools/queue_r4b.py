"""Round-4b TPU queue (VERDICT r3 tasks 1, 4, 5, 8): the stateful-serving
and envelope measurements that need the caches queue_r4a built.

Launch AFTER queue_r4a completes and the bench defaults are flipped to the
widened capture plan + shrunk geometry budgets.

Capture-plan bookkeeping: the catalog-scale points (400/1000 objects) PIN
the classic plan (0.8 m / 3 rings) — they reuse r4a's incrementally-built
caches, and catalog scale is orthogonal to the capture envelope. The
envelope points (stress sweep) run at the new defaults against the newdef
100-object cache.

Points:
  stress-newdef  — tilt/distance stress sweep at the widened-plan default
                   (STRESS_POSE.json: the >=0.83-through-2.0 m check)
  soak-cf-400    — 1000-frame stateful soak (coarse->fine + track/explore
                   + min_confidence 24) at 400 objects -> SOAK_CF_400.json
  soak-cf-1000   — same at 1000 objects -> SOAK_CF_1000.json
  explore-1000   — exploration-slot discovery + steady recall at 1000
                   objects with the composed frontier config
                   -> EXPLORE_BENCH_1000.json
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from queue_lib import REPO, Queue  # noqa: E402

q = Queue("queue_r4b", os.path.join(REPO, "SWEEP_R4B.json"))

import exp_explore  # noqa: E402
import soak  # noqa: E402
import stress_pose  # noqa: E402

STRESS_KNOBS = ("STRESS_OBJECTS", "STRESS_PER_BIN", "STRESS_LEVELS",
                "STRESS_SWEEP")
SOAK_KNOBS = ("SOAK_FRAMES", "SOAK_OBJECTS", "SOAK_COARSE", "SOAK_FINE",
              "SOAK_E", "SOAK_T", "SOAK_GATE")
EXPLORE_KNOBS = ("EXPLORE_OBJECTS", "EXPLORE_STRIDE", "EXPLORE_WIDTH",
                 "EXPLORE_E", "EXPLORE_T", "EXPLORE_TTL")
ALL_KNOBS = STRESS_KNOBS + SOAK_KNOBS + EXPLORE_KNOBS
OLD_PLAN = {"BENCH_TRAIN_DIST": "0.8", "BENCH_TRAIN_ELEV": "85,60,35"}

# the SHIPPED default after the round-4 flip (widened capture plan +
# shrunk budgets): measured with zero overrides so BENCH_LAST.json ends on
# exactly what `python bench.py` gives a fresh user / the driver
q.run("default-new", knobs=ALL_KNOBS)
# newdef-100 (r4a, old budgets) measured 39.5 FPS / 0.958 — obj021 missed
# outright: +60% rows dilute its margin mass. Two cheap recoveries on the
# warm widened-plan cache:
#   rc24x10 — load-time recompression (hamming<=24 AND 3D<=10mm collapses
#             near-duplicate far/near-ring rows; matcher+tier1 are linear
#             in rows, so this also buys FPS back)
#   p48     — wider tier-1 prescreen (margin-mass rank must clear obj021)
q.run("newdef-rc", BENCH_RECOMPRESS="24x10", knobs=ALL_KNOBS)
q.run("newdef-p48", BENCH_PRESCREEN=48, knobs=ALL_KNOBS)
# batched-mode make-or-break (VERDICT task 6): 4 independent streams via
# detect_batch_raw vs streaming in the same run. Early in the queue: it
# OOMed in r4a only because it ran right after the 16M-row full-1000
# point in the same process.
q.run("batch4-100", BENCH_BATCH=4, BENCH_CONT=192, BENCH_HYP=768,
      BENCH_ACT_HYP=192, knobs=ALL_KNOBS,
      BENCH_TRAIN_DIST="0.8", BENCH_TRAIN_ELEV="85,60,35")
q.run("stress-newdef", fn=stress_pose.main,
      marker=os.path.join(REPO, "STRESS_POSE.json"), knobs=ALL_KNOBS)
# frontier steady-recall check (exp_explore at the composed config:
# stride 16 coarse, 64-slab with 16 explore + 16 track slots, shrunk
# tier-2 budgets, full tier-1)
q.run("explore-1000-s16", fn=exp_explore.main,
      marker=os.path.join(REPO, "EXPLORE_BENCH_1000_s16.json"),
      knobs=ALL_KNOBS,
      EXPLORE_OBJECTS=1000, EXPLORE_STRIDE=16, EXPLORE_WIDTH=64,
      EXPLORE_E=16, EXPLORE_T=16, BENCH_CONT=128, BENCH_HYP=512,
      BENCH_ACT_HYP=192, **OLD_PLAN)
# frontier streaming-FPS check (bench at the same config; the recall pass
# here understates steady recall -- the explore point above carries it)
q.run("frontier-1000", BENCH_OBJECTS=1000, BENCH_COARSE=16, BENCH_FINE=64,
      BENCH_TRACK=16, BENCH_EXPLORE=16, BENCH_CONT=128, BENCH_HYP=512,
      BENCH_ACT_HYP=192, knobs=ALL_KNOBS, **OLD_PLAN)
q.run("soak-cf-400", fn=soak.main,
      marker=os.path.join(REPO, "SOAK_CF_400.json"), knobs=ALL_KNOBS,
      SOAK_OBJECTS=400, SOAK_COARSE=8, SOAK_FINE=64, SOAK_E=8, SOAK_T=8,
      SOAK_GATE=24, **OLD_PLAN)
q.run("soak-cf-1000", fn=soak.main,
      marker=os.path.join(REPO, "SOAK_CF_1000.json"), knobs=ALL_KNOBS,
      SOAK_OBJECTS=1000, SOAK_COARSE=8, SOAK_FINE=96, SOAK_E=8, SOAK_T=8,
      SOAK_GATE=24, **OLD_PLAN)
q.run("explore-1000", fn=exp_explore.main,
      marker=os.path.join(REPO, "EXPLORE_BENCH_1000.json"), knobs=ALL_KNOBS,
      EXPLORE_OBJECTS=1000, EXPLORE_STRIDE=8, EXPLORE_WIDTH=64,
      EXPLORE_E=16, EXPLORE_T=16, BENCH_CONT=128, BENCH_HYP=512,
      BENCH_ACT_HYP=192, **OLD_PLAN)
# coarse-stride scaling probe: the coarse sweep is the linear-in-catalog
# stage at 1000 objects; stride 16 halves it. Shrunk budgets.
q.run("cf-1000-s16", BENCH_OBJECTS=1000, BENCH_COARSE=16, BENCH_FINE=96,
      BENCH_CONT=128, BENCH_HYP=512, BENCH_ACT_HYP=192, knobs=ALL_KNOBS,
      **OLD_PLAN)
# fresh-process retries of the r4a probes that OOMed in the long-lived
# r4a process (accumulated device garbage vs a real HBM wall — this run
# decides which; if they OOM again, the wider screens at 16M rows are a
# 2-chip config and the sharded serving step is the documented answer)
q.run("cf-1000-hyp384", BENCH_OBJECTS=1000, BENCH_COARSE=8, BENCH_FINE=96,
      BENCH_ACT_HYP=384, BENCH_CONT=192, BENCH_HYP=768, knobs=ALL_KNOBS,
      **OLD_PLAN)
q.run("cf-1000-p166", BENCH_OBJECTS=1000, BENCH_COARSE=8, BENCH_FINE=192,
      BENCH_ACT_HYP=384, BENCH_PRESCREEN=166, BENCH_CONT=192, BENCH_HYP=768,
      knobs=ALL_KNOBS, **OLD_PLAN)
q.finish()
