"""Round-3d TPU queue: exploration slots at catalog scale, with the
in-slab prescreen bypass (reserved_force_mask) landed.

Points (each = tools/exp_explore.py in a SUBPROCESS; the parent never
opens the tunnel, so between attempts there are zero connections — the
only thing observed to clear a wedge, memory/axon-tpu-tunnel-quirks):

1. explore-400  — re-measure EXPLORE_BENCH_400 with the prescreen bypass:
   the prior run (control 0.875 -> explore 0.958, miss obj021) ran P=32
   over a 64-slot slab, so explored slots could still be screened out of
   tier-1 in-slab. With the bypass, obj021 (global margin-mass rank past
   the screen) finally reaches tier-1 — measures whether CF+explore now
   matches/beats the full sweep outright.
2. explore-1000 — the catalog-scale point (trains the 1000-object DB
   incrementally from the 400 cache, with 200-object milestone snapshots
   so a wedge never loses the build): control CF 8/96 measured 0.875;
   tools/diag_t1var.py says the only structural miss is obj021 at
   margin-mass rank 124 — exactly what exploration + the bypass target.

Run:  cd /root/repo && python tools/queue_r3d.py
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DONE = "/tmp/queue_r3d.done"
LOG = "/tmp/queue_r3d.log"

POINTS = [
    ("explore-400", "EXPLORE_BENCH_400.json",
     {"EXPLORE_OBJECTS": "400", "EXPLORE_STRIDE": "8",
      "EXPLORE_WIDTH": "64", "EXPLORE_E": "8", "EXPLORE_T": "8"}),
    ("explore-1000", "EXPLORE_BENCH_1000.json",
     {"EXPLORE_OBJECTS": "1000", "EXPLORE_STRIDE": "8",
      "EXPLORE_WIDTH": "96", "EXPLORE_E": "8", "EXPLORE_T": "8"}),
]


def log(msg):
    line = f"[queue_r3d {time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def done_tags():
    if not os.path.exists(DONE):
        return set()
    with open(DONE) as f:
        return {line.split()[0] for line in f if line.strip()}


def main():
    for tag, out_name, env in POINTS:
        if tag in done_tags():
            log(f"{tag}: already done, skip")
            continue
        out = os.path.join(REPO, out_name)
        ok = False
        for retry in range(7):
            before = os.path.getmtime(out) if os.path.exists(out) else 0.0
            # keep PYTHONPATH exactly as inherited: the baseline
            # PYTHONPATH=/root/.axon_site LOADS the axon plugin
            # (sitecustomize); what breaks the plugin is PREPENDING other
            # entries (e.g. /root/repo) — exp_explore sys.path-inserts the
            # repo itself, so no override is needed
            child_env = dict(os.environ)
            child_env.update(env)
            log(f"{tag}: attempt {retry + 1}/7")
            try:
                subprocess.run(
                    [sys.executable, os.path.join(REPO, "tools",
                                                  "exp_explore.py")],
                    cwd=REPO, env=child_env, timeout=4 * 3600,
                    stdout=open(LOG, "a"), stderr=subprocess.STDOUT)
            except subprocess.TimeoutExpired:
                log(f"{tag}: attempt timed out (4h)")
            after = os.path.getmtime(out) if os.path.exists(out) else 0.0
            if after > before:
                ok = True
                break
            quiet = 900.0 * (retry + 1)
            log(f"{tag}: no measurement landed — tunnel quiet window "
                f"{quiet:.0f}s (zero open connections), then retry")
            time.sleep(quiet)
        with open(DONE, "a") as f:
            f.write(f"{tag} {'done' if ok else 'failed'}\n")
        log(f"{tag}: {'done' if ok else 'FAILED permanently'}")
    log("queue complete")


if __name__ == "__main__":
    main()
