"""Queue entry: build (and cache) the bench DB at BENCH_OBJECTS objects.

Training-only point for the measurement queues: seeds from the largest
smaller cache with the same plan, trains the remainder through the real
trainer, snapshots every 200 objects (bench.build_db semantics), and
leaves the .npz cache for the bench/stress/soak points that follow.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402


def main():
    n = int(os.environ.get("BENCH_OBJECTS", "100"))
    bench.log(f"devices: {bench.wait_for_devices()}")
    _objs, models = bench.build_db(n)
    bench.log(f"trained/cached {len(models)} models")


if __name__ == "__main__":
    main()
