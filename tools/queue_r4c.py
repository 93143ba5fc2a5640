"""Round-4c TPU queue: the points r4b lost to in-process HBM accumulation,
plus the A/Bs the r4b results motivated.  One fresh subprocess per point
(queue_lib v2) — the OOM postmortem fix.

  1. soak-cf-400 / soak-cf-1000 — 1000-frame stateful soaks (VERDICT
     task 5): coarse->fine + track/explore + min_confidence 24
  2. explore-1000 — stride-8 steady-recall record (r3-comparable)
  3. frontier-p32 / explore-frontier-p32 — the >=30 FPS candidate: in the
     explore+latch steady regime the tier-1 prescreen can be narrow
     (every object gets a forced tier-1 evaluation each rotation cycle),
     so P drops 83 -> 32 where tier-1 is the dominant remaining stage
  4. cf-1000-s16 — stateless stride-16 row for the scale table
  5. stress-dist-a192 — is the range-bin drop (z1.5 0.917 -> 0.75 vs the
     r3 distance study) the shrunk tier-1 budget or far-ring dilution?
  6. newdef-rc16x5 — milder load-time recompression than 24x10 (which
     traded recall for FPS)
  7. cf-1000-hyp384 / cf-1000-p166 — fresh-process retries; an OOM here
     is a real single-chip HBM wall (documented as the 2-chip config)
  8. default-final — zero-override shipped default, so BENCH_LAST.json
     ends the round on exactly what the driver measures
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from queue_lib import REPO, Queue  # noqa: E402

q = Queue("queue_r4c", os.path.join(REPO, "SWEEP_R4C.json"))

OLD_PLAN = {"BENCH_TRAIN_DIST": "0.8", "BENCH_TRAIN_ELEV": "85,60,35"}
SHRUNK = {"BENCH_CONT": 128, "BENCH_HYP": 512}

q.run("soak-cf-400", entry="soak:main",
      marker=os.path.join(REPO, "SOAK_CF_400.json"),
      SOAK_OBJECTS=400, SOAK_COARSE=8, SOAK_FINE=64, SOAK_E=8, SOAK_T=8,
      SOAK_GATE=24, BENCH_ACT_HYP=192, **SHRUNK, **OLD_PLAN)
q.run("soak-cf-1000", entry="soak:main",
      marker=os.path.join(REPO, "SOAK_CF_1000.json"),
      SOAK_OBJECTS=1000, SOAK_COARSE=8, SOAK_FINE=96, SOAK_E=8, SOAK_T=8,
      SOAK_GATE=24, BENCH_ACT_HYP=192, **SHRUNK, **OLD_PLAN)
q.run("explore-1000", entry="exp_explore:main",
      marker=os.path.join(REPO, "EXPLORE_BENCH_1000.json"),
      EXPLORE_OBJECTS=1000, EXPLORE_STRIDE=8, EXPLORE_WIDTH=64,
      EXPLORE_E=16, EXPLORE_T=16, BENCH_ACT_HYP=192, **SHRUNK, **OLD_PLAN)
q.run("frontier-p32", BENCH_OBJECTS=1000, BENCH_COARSE=16, BENCH_FINE=64,
      BENCH_TRACK=16, BENCH_EXPLORE=16, BENCH_PRESCREEN=32,
      BENCH_ACT_HYP=192, **SHRUNK, **OLD_PLAN)
q.run("explore-frontier-p32", entry="exp_explore:main",
      marker=os.path.join(REPO, "EXPLORE_BENCH_1000_s16.json"),
      EXPLORE_OBJECTS=1000, EXPLORE_STRIDE=16, EXPLORE_WIDTH=64,
      EXPLORE_E=16, EXPLORE_T=16, BENCH_PRESCREEN=32, BENCH_ACT_HYP=192,
      **SHRUNK, **OLD_PLAN)
q.run("cf-1000-s16", BENCH_OBJECTS=1000, BENCH_COARSE=16, BENCH_FINE=96,
      BENCH_ACT_HYP=192, **SHRUNK, **OLD_PLAN)
q.run("stress-dist-a192", entry="stress_pose:main",
      marker=os.path.join(REPO, "STRESS_POSE_a192.json"),
      STRESS_SWEEP="distance", STRESS_TAG="a192", BENCH_ACT_HYP=192,
      BENCH_CONT=192, BENCH_HYP=768)
q.run("newdef-rc16x5", BENCH_RECOMPRESS="16x5")
q.run("cf-1000-hyp384", BENCH_OBJECTS=1000, BENCH_COARSE=8, BENCH_FINE=96,
      BENCH_ACT_HYP=384, BENCH_CONT=192, BENCH_HYP=768, **OLD_PLAN)
q.run("cf-1000-p166", BENCH_OBJECTS=1000, BENCH_COARSE=8, BENCH_FINE=192,
      BENCH_ACT_HYP=384, BENCH_PRESCREEN=166, BENCH_CONT=192,
      BENCH_HYP=768, **OLD_PLAN)
q.run("default-final")
q.finish()
