"""Isolate per-dispatch tunnel overhead vs on-device compute time."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from tod_tpu.db.models import TodModel
from tod_tpu.geometry.detection import GuessConfig
from tod_tpu.geometry.ransac import RansacConfig
from tod_tpu.models.fused import (FusedDetector, FusedDetectorConfig)

rng = np.random.default_rng(0)
models = [TodModel(f"o{i}", rng.integers(0, 256, (12288, 32), dtype=np.uint8),
                   rng.uniform(-0.1, 0.1, (12288, 3)).astype(np.float32))
          for i in range(100)]
cfg = FusedDetectorConfig(
    n_features=5000,
    guess=GuessConfig(ransac=RansacConfig(n_hypotheses=1024, max_instances=3),
                      max_matches_per_object=512, max_active_objects=16))
det = FusedDetector(models, cfg)
image = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
depth = np.full((480, 640), 800, np.uint16)
K = np.asarray([[525.0, 0, 319.5], [0, 525.0, 239.5], [0, 0, 1]])
frame = det.prepare_frame(image, depth, K)

# warmup
_, d0 = det.detect_raw(*frame)
d0.accepted.block_until_ready()

# A: per-frame loop as in bench (new key each frame)
t0 = time.time()
n = 30
for _ in range(n):
    _, last = det.detect_raw(*frame)
last.accepted.block_until_ready()
print(f"A per-frame loop: {(time.time()-t0)/n*1e3:.1f} ms/frame", flush=True)

# B: fixed key, direct fn calls (no key split)
key = jax.random.PRNGKey(1)
out = det._fn(key, *frame, det.db)
out[1].accepted.block_until_ready()
t0 = time.time()
for _ in range(n):
    out = det._fn(key, *frame, det.db)
out[1].accepted.block_until_ready()
print(f"B fixed-key loop: {(time.time()-t0)/n*1e3:.1f} ms/frame", flush=True)

# C: single chained dispatch depth test: 5 dispatches, one sync
t0 = time.time()
for _ in range(5):
    out = det._fn(key, *frame, det.db)
out[1].accepted.block_until_ready()
print(f"C 5-call burst: {(time.time()-t0)/5*1e3:.1f} ms/frame", flush=True)
