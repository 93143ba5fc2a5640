"""Round-4a TPU queue (VERDICT r3 tasks 1, 4, 6).

Order = value per wall-clock hour on this 1-CPU VM; training inside a point
(cache misses) is host-render bound, so the expensive points sit after the
cheap warm-cache ones but early enough to finish within the round.

  1. cont-128 / acthyp-128 / hyp-512 / combo — can the geometry budgets
     SHRINK under the default P=32 prescreen?  (queue_r3e points; warm
     100-object cache, ~5 min each)
  2. default-refresh — fresh headline numbers on this box, refreshes the
     BENCH_LAST snapshot the harness restores after override points
  3. newdef-100 — the WIDENED capture envelope (multi-distance 0.8+1.6 m,
     4-ring elevations) measured at the 100-object headline point; trains
     a new ~60-view/object cache (~35 min) that the end-of-round driver
     bench reuses once the default flips
  4. cf-400 / cf-1000 — the coarse->fine catalog-scale refresh (trains the
     400/1000-object caches incrementally; the 1000 build is ~70 min)
  5. cf-1000-hyp384 / cf-1000-p166 — tier-1 variance + prescreen-width
     probes at catalog scale (queue_r3c's queued follow-ups)
  6. cf-1000-shrunk — compose the budget-shrink winners with coarse->fine
     at 1000 objects (the frontier operating point)
  7. full-1000 — the non-CF full-sweep row at 1000 (scale-table
     completeness; PROGRESS.md calls the old 0.833 row stale-pessimistic)
  8. batch4-100 — batched mode's make-or-break: detect_batch_raw over 4
     independent streams vs streaming in the same run (VERDICT task 6)

Results accumulate in SWEEP_R4A.json (tag -> BENCH_LAST payload + env).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from queue_lib import REPO, Queue  # noqa: E402

q = Queue("queue_r4a", os.path.join(REPO, "SWEEP_R4A.json"))

q.run("cont-128", BENCH_CONT=128, BENCH_TRAIN_DIST="0.8", BENCH_TRAIN_ELEV="85,60,35")
q.run("acthyp-128", BENCH_ACT_HYP=128, BENCH_TRAIN_DIST="0.8", BENCH_TRAIN_ELEV="85,60,35")
q.run("hyp-512", BENCH_HYP=512, BENCH_TRAIN_DIST="0.8", BENCH_TRAIN_ELEV="85,60,35")
q.run("combo", BENCH_CONT=128, BENCH_ACT_HYP=128, BENCH_HYP=512,
      BENCH_TRAIN_DIST="0.8", BENCH_TRAIN_ELEV="85,60,35")
q.run("default-refresh", BENCH_TRAIN_DIST="0.8", BENCH_TRAIN_ELEV="85,60,35",
      BENCH_CONT=192, BENCH_HYP=768, BENCH_ACT_HYP=192)
q.run("newdef-100", BENCH_TRAIN_DIST="0.8,1.6",
      BENCH_TRAIN_ELEV="85,60,35,15",
      BENCH_CONT=192, BENCH_HYP=768, BENCH_ACT_HYP=192)
q.run("cf-400", BENCH_OBJECTS=400, BENCH_COARSE=8, BENCH_FINE=64,
      BENCH_TRAIN_DIST="0.8", BENCH_TRAIN_ELEV="85,60,35",
      BENCH_CONT=192, BENCH_HYP=768, BENCH_ACT_HYP=192)
q.run("cf-1000", BENCH_OBJECTS=1000, BENCH_COARSE=8, BENCH_FINE=96,
      BENCH_TRAIN_DIST="0.8", BENCH_TRAIN_ELEV="85,60,35",
      BENCH_CONT=192, BENCH_HYP=768, BENCH_ACT_HYP=192)
# tier-1 variance probe: obj009/obj015 misses are marginal planes (t1
# scores 15-19); double the tier-1 budget where coarse->fine shrank the
# match stage
q.run("cf-1000-hyp384", BENCH_OBJECTS=1000, BENCH_COARSE=8, BENCH_FINE=96,
      BENCH_ACT_HYP=384, BENCH_CONT=192, BENCH_HYP=768,
      BENCH_TRAIN_DIST="0.8", BENCH_TRAIN_ELEV="85,60,35")
# prescreen-width probe: obj021 sits at margin-mass rank 124 at 1000
# objects — both the prescreen AND the coarse->fine slab must clear rank
# 124 (P=166 ~ O/6, fine_width 192)
q.run("cf-1000-p166", BENCH_OBJECTS=1000, BENCH_COARSE=8, BENCH_FINE=192,
      BENCH_ACT_HYP=384, BENCH_PRESCREEN=166, BENCH_CONT=192, BENCH_HYP=768,
      BENCH_TRAIN_DIST="0.8", BENCH_TRAIN_ELEV="85,60,35")
# the composed frontier candidate: coarse->fine + shrunk tier-2 budgets
q.run("cf-1000-shrunk", BENCH_OBJECTS=1000, BENCH_COARSE=8, BENCH_FINE=96,
      BENCH_CONT=128, BENCH_HYP=512, BENCH_ACT_HYP=192,
      BENCH_TRAIN_DIST="0.8", BENCH_TRAIN_ELEV="85,60,35")
q.run("full-1000", BENCH_OBJECTS=1000, BENCH_CONT=192, BENCH_HYP=768,
      BENCH_ACT_HYP=192, BENCH_TRAIN_DIST="0.8", BENCH_TRAIN_ELEV="85,60,35")
q.run("batch4-100", BENCH_BATCH=4, BENCH_CONT=192, BENCH_HYP=768,
      BENCH_ACT_HYP=192, BENCH_TRAIN_DIST="0.8", BENCH_TRAIN_ELEV="85,60,35")
q.finish()
