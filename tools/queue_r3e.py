"""Round-3e TPU queue: can the geometry budgets SHRINK under the prescreen?

The tier-1 prescreen (P=32, now default) removes score-junk objects before
tier-1 RANSAC, and the tier-2 continuation split (192) already cut rounds
2-3.  Both tier budgets were sized BEFORE the prescreen existed; with junk
screened out, smaller hypothesis batches may hold recall at the 100-object
operating point and buy back geometry time (~13 ms of the 24.6 ms frame).

Points (default bench otherwise; warm .bench_cache assumed):
  cont-128 / cont-96   — tier-2 continuation rounds 192 -> 128 / 96
  acthyp-128           — tier-1 activation hypotheses 192 -> 128
  hyp-512              — tier-2 round-1 budget 768 -> 512
  combo                — best-guess combination (re-pointed after reading
                         the singles; start with all three shrunk)
  default-refresh      — final default point so BENCH_LAST.json ends on
                         the headline config

Results accumulate in SWEEP_R3E.json (tag -> BENCH_LAST payload).
Wedge-tolerant re-exec structure identical to tools/queue_r3c.py.
"""
import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DONE = "/tmp/queue_r3e.done"
RETRIES = "/tmp/queue_r3e.retries"
LAST = os.path.join(REPO, "BENCH_LAST.json")
SWEEP = os.path.join(REPO, "SWEEP_R3E.json")

quiet = float(os.environ.pop("QUEUE_QUIET", "0") or 0)
if quiet:
    print(f"queue: long quiet window {quiet:.0f}s (no connections)",
          flush=True)
    time.sleep(quiet)

import bench  # noqa: E402

KNOBS = ("BENCH_CONT", "BENCH_HYP", "BENCH_ACT_HYP", "BENCH_OBJECTS",
         "BENCH_COARSE", "BENCH_FINE", "BENCH_FEATURE", "BENCH_PRESCREEN")


def _done():
    if not os.path.exists(DONE):
        return {}
    out = {}
    with open(DONE) as f:
        for line in f:
            tag, _, state = line.strip().partition(" ")
            out[tag] = state or "done"
    return out


def _mark(tag, state):
    with open(DONE, "a") as f:
        f.write(f"{tag} {state}\n")


def _retries():
    if not os.path.exists(RETRIES):
        return {}
    with open(RETRIES) as f:
        return json.load(f)


def _record(tag):
    sweep = {}
    if os.path.exists(SWEEP):
        with open(SWEEP) as f:
            sweep = json.load(f)
    with open(LAST) as f:
        sweep[tag] = json.load(f)
    with open(SWEEP, "w") as f:
        json.dump(sweep, f, indent=1)


def run(tag, **env):
    if tag in _done():
        bench.log(f"=== queue point: {tag} (already {_done()[tag]}, skip) ===")
        return
    for k in KNOBS:
        os.environ.pop(k, None)
    os.environ.update({k: str(v) for k, v in env.items()})
    bench.log(f"=== queue point: {tag} ===")
    before = os.path.getmtime(LAST) if os.path.exists(LAST) else 0.0
    try:
        bench.main()
    except Exception as e:
        bench.log(f"POINT RAISED ({tag}): {type(e).__name__}: {e}")
    gc.collect()
    after = os.path.getmtime(LAST) if os.path.exists(LAST) else 0.0
    if after > before:
        _record(tag)
        _mark(tag, "done")
        os.environ["BENCH_REEXEC"] = "0"
        return
    r = _retries()
    r[tag] = r.get(tag, 0) + 1
    with open(RETRIES, "w") as f:
        json.dump(r, f)
    if r[tag] > 6:
        bench.log(f"POINT FAILED permanently ({tag}) after {r[tag] - 1} "
                  "long-quiet retries")
        _mark(tag, "failed")
        return
    q = 900.0 * r[tag]
    bench.log(f"point {tag} failed (retry {r[tag]}/6): re-exec with "
              f"{q:.0f}s quiet window")
    os.environ["QUEUE_QUIET"] = str(q)
    os.environ["BENCH_REEXEC"] = "0"
    sys.stdout.flush()
    sys.stderr.flush()
    os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)])


run("cont-128", BENCH_CONT=128)
run("acthyp-128", BENCH_ACT_HYP=128)
run("hyp-512", BENCH_HYP=512)
run("combo", BENCH_CONT=128, BENCH_ACT_HYP=128, BENCH_HYP=512)
run("default-refresh")
bench.log("queue complete: " + json.dumps(_done()))
