"""Final sweep under the (default) gaussian pattern: radius x k at 20 objects
with current bench training (36 views, nf600)."""
import json, os, sys, time
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import bench
bench.log(f"devices: {bench.wait_for_devices()}")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from exp_recall2 import build, recall   # reuse helpers

objects, models = build(12, (85.0, 60.0, 35.0), 600)
for radius, k in ((35, 5), (40, 8), (45, 8), (50, 8)):
    h, t = recall(objects, models, radius, k)
    bench.log(f"gaussian 36v nf600: r={radius} k={k} -> {h}/{t}")
objects, models = build(12, (85.0, 60.0, 35.0), 1500)
for radius, k in ((40, 8), (45, 8)):
    h, t = recall(objects, models, radius, k)
    bench.log(f"gaussian 36v nf1500: r={radius} k={k} -> {h}/{t}")
