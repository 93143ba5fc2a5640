"""Geometry-stage sweep on TPU: object_batch x max_matches."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from tod_tpu.db.models import TodModel
from tod_tpu.geometry.detection import GuessConfig, detect_frame_from_matches
from tod_tpu.geometry.ransac import RansacConfig
from tod_tpu.models.fused import FusedDetectorConfig, pack_models

N_OBJ = 100
rng = np.random.default_rng(0)
models = [TodModel(f"o{i}", rng.integers(0, 256, (12800, 32), dtype=np.uint8),
                   rng.uniform(-0.1, 0.1, (12800, 3)).astype(np.float32))
          for i in range(N_OBJ)]
db, _ = pack_models(models, 16384)

Q, K = 5000, 5
# synthetic match tensors with realistic sparsity: ~6% of keypoints matched
valid = rng.random((Q, K)) < 0.06
obj_idx = np.where(valid, rng.integers(0, N_OBJ, (Q, K)), -1).astype(np.int32)
dist = rng.uniform(5, 35, (Q, K)).astype(np.float32)
train_pts = rng.uniform(-0.1, 0.1, (Q, K, 3)).astype(np.float32)
query_pts = rng.uniform(-0.3, 0.3, (Q, 3)).astype(np.float32) + [0, 0, 0.8]
query_xy = rng.uniform(40, 600, (Q, 2)).astype(np.float32)
spans = np.full(N_OBJ, 0.3, np.float32)

args = tuple(jnp.asarray(a) for a in
             (obj_idx, dist, valid, train_pts, query_pts, query_xy, spans))
key = jax.random.PRNGKey(0)

for m_cap in (512, 1024):
    for batch in (8, 25, 50, 100):
        cfg = GuessConfig(
            ransac=RansacConfig(n_hypotheses=1024, max_instances=3),
            max_matches_per_object=m_cap, object_batch=batch)
        fn = jax.jit(lambda k, *a, cfg=cfg: detect_frame_from_matches(
            k, *a, cfg=cfg)[1].accepted)
        try:
            out = fn(key, *args)
            np.asarray(out)
            t0 = time.time()
            n = 10
            for _ in range(n):
                out = fn(key, *args)
            s = bool(out.any())
            dt = (time.time() - t0) / n
            print(f"M={m_cap} batch={batch}: {dt*1e3:7.2f} ms", flush=True)
        except Exception as e:
            print(f"M={m_cap} batch={batch}: FAIL {str(e)[:100]}", flush=True)
