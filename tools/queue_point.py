"""Run ONE measurement point: ``python tools/queue_point.py <module>:<func>``.

The per-point child process of the queue harness (tools/queue_lib.py).
Fresh process per point = fresh HBM: device buffers accumulated across
points in a long-lived process were the round-4 OOM source (full-1000 ran
clean in a fresh process after OOMing mid-queue; jax.clear_caches between
in-process points did NOT fix it).  Env overrides arrive via the
environment; success is the point's marker file advancing (checked by the
parent).  bench.wait_for_devices' hung-client re-exec works unchanged —
sys.argv is this script.
"""
import importlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if __name__ == "__main__":
    module_name, _, func_name = sys.argv[1].partition(":")
    mod = importlib.import_module(module_name)
    getattr(mod, func_name or "main")()
