"""Shared wedge-tolerant TPU measurement-queue harness.

One process = one tunnel connection (memory/axon-tpu-tunnel-quirks: a
second client wedges both), and one POINT = one fresh subprocess
(tools/queue_point.py): device buffers accumulate across points run
in-process — the round-4a/4b OOM source; full-1000 OOMed mid-queue but ran
clean in a fresh process, and jax.clear_caches between in-process points
did not help.  The parent never imports jax, so it holds no connection
while a child runs or while it sleeps out a wedge quiet window.

Each *point* runs ``<module>:<func>`` (default ``bench:main``) with a set
of env overrides; success is the point's marker file mtime advancing.  On
failure the parent sleeps an escalating quiet window (the only thing
observed to clear a tunnel wedge) and relaunches, skipping completed
points via a done-file.  A RESOURCE_EXHAUSTED child fails the point
immediately — in a fresh process that is a real HBM wall, not garbage.

Fixes folded in from ADVICE r3 (carried from the v1 harness):
- every recorded sweep payload carries the env overrides that produced it;
- BENCH_LAST.json is snapshotted at queue start and restored after every
  point that ran with overrides;
- sweep-file writes are atomic and tolerate a corrupt existing file;
- the point is marked done BEFORE recording;
- /tmp state files are keyed by queue name + repo-path hash; delete the
  printed state files to re-run a finished sweep.
"""
import hashlib
import json
import os
import shutil
import subprocess
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
    "BENCH_TRACK", "BENCH_EXPLORE", "BENCH_TTL",
    "BENCH_TRACK_CONF", "BENCH_ACT_RESERVE", "BENCH_COARSE_Q",
    "BENCH_ACT_CAP", "BENCH_ACT_HYP", "BENCH_PRESCREEN",
    "BENCH_HYP", "BENCH_CONT", "BENCH_M", "BENCH_ACTIVE",
    "BENCH_BATCH", "BENCH_REEXEC", "QUEUE_QUIET",
)


def log(*args):
    print(*args, file=sys.stderr, flush=True)


class Queue:
    def __init__(self, name: str, sweep_path: str):
        self.name = name
        key = hashlib.sha1(REPO.encode()).hexdigest()[:8]
        self.done_path = f"/tmp/{name}.{key}.done"
        self.retries_path = f"/tmp/{name}.{key}.retries"
        self.last = os.path.join(REPO, "BENCH_LAST.json")
        self.last_bak = os.path.join(REPO, f".{name}.last.bak")
        self.sweep = sweep_path
        self.point_driver = os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "queue_point.py")
        log(f"queue {name}: state files {self.done_path} / "
            f"{self.retries_path} (delete to re-run a finished sweep)")
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

    def _bump_retries(self, tag):
        r = self._retries()
        r[tag] = r.get(tag, 0) + 1
        tmp = self.retries_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(r, f)
        os.replace(tmp, self.retries_path)
        return r[tag]

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
            log(f"record failed ({tag}): unreadable BENCH_LAST.json: {e}")
            return
        payload["env"] = {k: str(v) for k, v in env.items()}
        sweep[tag] = payload
        tmp = self.sweep + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sweep, f, indent=1)
        os.replace(tmp, self.sweep)

    # -- the point runner --------------------------------------------------
    def run(self, tag, entry="bench:main", marker=None, timeout=10800.0,
            **env):
        """Run one measurement point in a FRESH subprocess.

        ``entry``: ``module:function`` resolved by tools/queue_point.py
        (tools/ and the repo root are on its sys.path).  ``marker``: the
        output file whose mtime advancing means success (default
        BENCH_LAST.json).  ``timeout``: child wall-clock bound (training
        points at 1000 objects legitimately run >1h)."""
        state = self.done()
        if tag in state:
            log(f"=== queue point: {tag} (already {state[tag]}, skip) ===")
            return
        marker = marker or self.last
        child_env = {k: v for k, v in os.environ.items()
                     if k not in KNOBS and not k.startswith(
                         ("STRESS_", "SOAK_", "EXPLORE_", "DIAG_"))}
        child_env.update({k: str(v) for k, v in env.items()})
        log(f"=== queue point: {tag} ({entry}) ===")
        before = os.path.getmtime(marker) if os.path.exists(marker) else 0.0
        oom = False
        point_log = f"/tmp/{self.name}.{tag}.log"
        try:
            with open(point_log, "ab") as lf:
                subprocess.run(
                    [sys.executable, self.point_driver, entry],
                    env=child_env, cwd=REPO, timeout=timeout,
                    stdout=lf, stderr=subprocess.STDOUT)
            with open(point_log, "rb") as lf:
                out = lf.read().decode(errors="replace")
            sys.stderr.write(out[-4000:])
            sys.stderr.flush()
            oom = "RESOURCE_EXHAUSTED" in out
        except subprocess.TimeoutExpired:
            log(f"POINT TIMED OUT ({tag}) after {timeout:.0f}s")
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
            return
        if oom:
            # fresh process + OOM = the program genuinely doesn't fit HBM
            log(f"POINT FAILED permanently ({tag}): device OOM in a fresh "
                "process (real HBM wall)")
            self._mark(tag, "failed-oom")
            return
        n = self._bump_retries(tag)
        if n > 4:
            log(f"POINT FAILED permanently ({tag}) after {n - 1} "
                "long-quiet retries")
            self._mark(tag, "failed")
            return
        q = 600.0 * n
        log(f"point {tag} failed (retry {n}/4): quiet window {q:.0f}s "
            "(parent holds no connection), then relaunch")
        time.sleep(q)
        self.run(tag, entry=entry, marker=marker, timeout=timeout, **env)

    def finish(self):
        log(f"queue {self.name} complete: " + json.dumps(self.done()))
