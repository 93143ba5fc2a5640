"""Shared wedge-tolerant TPU measurement-queue harness.

One process = one tunnel connection (memory/axon-tpu-tunnel-quirks: a second
client wedges both).  Each *point* runs ``bench.main()`` with a set of
``BENCH_*`` env overrides; success is detected by BENCH_LAST.json's mtime
advancing.  On failure the queue re-execs itself with an escalating quiet
window (the only thing observed to clear a tunnel wedge), skipping completed
points via a done-file.

Used by thin per-round point lists (tools/queue_r4*.py).  Replaces the three
copied harnesses queue_r3{c,d,e}.py (ADVICE r3: factor into queue_lib).

Fixes folded in from ADVICE r3:
- every recorded sweep payload carries the env overrides that produced it
  (``payload["env"]``), so a non-default point can never masquerade as the
  headline config;
- BENCH_LAST.json is snapshotted at queue start and restored after every
  point that ran with overrides — the durable headline record never holds a
  non-default measurement even if the queue dies mid-sweep;
- sweep-file writes are atomic (temp + os.replace) and tolerate a corrupt /
  partial existing file (start fresh rather than crash after a paid-for
  bench);
- the point is marked done BEFORE recording, so a recording crash can't
  force an expensive re-run;
- /tmp state files are keyed by queue name + repo-path hash, so a stale
  done-file from another checkout can't silently empty a sweep.  To re-run
  a finished sweep deliberately, delete the state files the queue prints at
  startup.
"""
import gc
import hashlib
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# every knob bench.py reads; cleared between points so one point's override
# can never leak into the next
KNOBS = (
    "BENCH_OBJECTS", "BENCH_FRAMES", "BENCH_FEATURES", "BENCH_SCENES",
    "BENCH_FEATURE", "BENCH_SHAPES", "BENCH_NOISE", "BENCH_DUP",
    "BENCH_SUBPIXEL", "BENCH_DEDUP", "BENCH_RECOMPRESS",
    "BENCH_TRAIN_DIST", "BENCH_TRAIN_ELEV",
    "BENCH_PIPELINE", "BENCH_QCAP", "BENCH_BUCKET", "BENCH_RADIUS",
    "BENCH_K", "BENCH_COARSE", "BENCH_FINE",
    "BENCH_ACT_CAP", "BENCH_ACT_HYP", "BENCH_PRESCREEN",
    "BENCH_HYP", "BENCH_CONT", "BENCH_M", "BENCH_ACTIVE",
    "BENCH_BATCH",
)


class Queue:
    def __init__(self, name: str, sweep_path: str):
        self.name = name
        key = hashlib.sha1(REPO.encode()).hexdigest()[:8]
        self.done_path = f"/tmp/{name}.{key}.done"
        self.retries_path = f"/tmp/{name}.{key}.retries"
        self.last = os.path.join(REPO, "BENCH_LAST.json")
        self.last_bak = os.path.join(REPO, f".{name}.last.bak")
        self.sweep = sweep_path
        self.script = os.path.abspath(sys.argv[0])
        print(f"queue {name}: state files {self.done_path} / "
              f"{self.retries_path} (delete to re-run a finished sweep)",
              flush=True)
        # honor the long-quiet window BEFORE any jax import (zero open
        # connections is the only state observed to clear a wedge)
        quiet = float(os.environ.pop("QUEUE_QUIET", "0") or 0)
        if quiet:
            print(f"queue: long quiet window {quiet:.0f}s (no connections)",
                  flush=True)
            time.sleep(quiet)
        import bench  # noqa: E402  (after the quiet window)

        self.bench = bench
        if os.path.exists(self.last) and not os.path.exists(self.last_bak):
            shutil.copy(self.last, self.last_bak)

    # -- state ------------------------------------------------------------
    def done(self):
        if not os.path.exists(self.done_path):
            return {}
        out = {}
        with open(self.done_path) as f:
            for line in f:
                tag, _, state = line.strip().partition(" ")
                out[tag] = state or "done"
        return out

    def _mark(self, tag, state):
        with open(self.done_path, "a") as f:
            f.write(f"{tag} {state}\n")

    def _retries(self):
        try:
            with open(self.retries_path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    def _record(self, tag, env):
        sweep = {}
        try:
            with open(self.sweep) as f:
                sweep = json.load(f)
        except (OSError, ValueError):
            pass  # absent or corrupt: start fresh, never crash post-bench
        try:
            with open(self.last) as f:
                payload = json.load(f)
        except (OSError, ValueError) as e:
            self.bench.log(f"record failed ({tag}): unreadable "
                           f"BENCH_LAST.json: {e}")
            return
        payload["env"] = {k: str(v) for k, v in env.items()}
        sweep[tag] = payload
        tmp = self.sweep + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sweep, f, indent=1)
        os.replace(tmp, self.sweep)

    # -- the point runner --------------------------------------------------
    def run(self, tag, fn=None, marker=None, knobs=(), **env):
        """Run one measurement point under ``env`` overrides.  Skips if
        already done; on tunnel failure re-execs the calling script with an
        escalating quiet window (done-file makes the re-exec resume here).

        ``fn``: the point entry (default ``bench.main``); ``marker``: the
        output file whose mtime advancing means success (default
        BENCH_LAST.json); ``knobs``: extra env names to clear between
        points beyond the BENCH_* set (e.g. SOAK_*/EXPLORE_* for tool
        points)."""
        state = self.done()
        if tag in state:
            self.bench.log(f"=== queue point: {tag} "
                           f"(already {state[tag]}, skip) ===")
            return
        fn = fn or self.bench.main
        marker = marker or self.last
        for k in KNOBS + tuple(knobs):
            os.environ.pop(k, None)
        os.environ.update({k: str(v) for k, v in env.items()})
        self.bench.log(f"=== queue point: {tag} ===")
        before = os.path.getmtime(marker) if os.path.exists(marker) else 0.0
        try:
            fn()
            # drop jit caches + garbage between points: device buffers
            # accumulate across a long-lived queue process (measured: the
            # r4a process OOMed on points that run clean in a fresh
            # process). Recompiles cost ~30-90s/point; OOMing a paid-for
            # point costs the point.
            gc.collect()
            try:
                import jax

                jax.clear_caches()
            except Exception:
                pass
        except Exception as e:  # keep the queue alive for later points
            self.bench.log(f"POINT RAISED ({tag}): {type(e).__name__}: {e}")
            if "RESOURCE_EXHAUSTED" in str(e):
                # genuine device OOM: retrying with quiet windows cannot
                # help (the program doesn't fit); fail the point now.
                # NOTE an OOM can also be accumulated device garbage in a
                # long-lived queue process — if the point matters, re-run
                # it first in a FRESH process before believing the wall.
                self.bench.log(f"POINT FAILED permanently ({tag}): "
                               "device OOM (no retry)")
                self._mark(tag, "failed-oom")
                os.environ["BENCH_REEXEC"] = "0"
                return
        gc.collect()
        after = os.path.getmtime(marker) if os.path.exists(marker) else 0.0
        if after > before:
            self._mark(tag, "done")        # durable before recording
            if marker == self.last:
                self._record(tag, env)
                if env and os.path.exists(self.last_bak):
                    # overrides ran: restore the default headline record
                    shutil.copy(self.last_bak, self.last)
                elif not env:
                    # a default point IS the new headline: refresh snapshot
                    shutil.copy(self.last, self.last_bak)
            os.environ["BENCH_REEXEC"] = "0"   # fresh budget for next point
            return
        # no measurement landed: tunnel wedged (or the point is broken).
        # This process's PJRT claim is half-open — only execv/exit closes it.
        r = self._retries()
        r[tag] = r.get(tag, 0) + 1
        tmp = self.retries_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(r, f)
        os.replace(tmp, self.retries_path)
        if r[tag] > 6:
            self.bench.log(f"POINT FAILED permanently ({tag}) after "
                           f"{r[tag] - 1} long-quiet retries")
            self._mark(tag, "failed")
            return
        q = 900.0 * r[tag]
        self.bench.log(f"point {tag} failed (retry {r[tag]}/6): re-exec "
                       f"with {q:.0f}s quiet window")
        os.environ["QUEUE_QUIET"] = str(q)
        os.environ["BENCH_REEXEC"] = "0"
        sys.stdout.flush()
        sys.stderr.flush()
        os.execv(sys.executable, [sys.executable, self.script])

    def finish(self):
        self.bench.log(f"queue {self.name} complete: "
                       + json.dumps(self.done()))
