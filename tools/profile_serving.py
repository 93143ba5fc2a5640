"""Per-stage profile of the SERVING pipeline at the exact bench operating
point (imports bench.build_config / build_db), with HARD syncs — the tunnel's
block_until_ready does not block, so every probe downloads a scalar."""
import os
import sys
import time

sys.path.insert(0, ".")
import numpy as np

import jax
import jax.numpy as jnp

from bench import build_config, build_db, build_scenes
from tod_tpu.ops.image import rgb_to_gray

N = int(os.environ.get("BENCH_OBJECTS", "100"))
objects, models = build_db(N)
cfg = build_config(int(os.environ.get("BENCH_FEATURES", "5000")))
from tod_tpu.models.fused import FusedDetector  # noqa: E402

det = FusedDetector(models, cfg)
s1, s2, s3 = det._stages

scenes = build_scenes(objects, 1)
image, depth, _ = scenes[0]
from tod_tpu.utils.synthetic import DEFAULT_K
K = DEFAULT_K
gray = jnp.asarray(rgb_to_gray(jnp.asarray(image, jnp.float32)))
depth_j = jnp.asarray(depth)
K_j = jnp.asarray(K, jnp.float32)
key = jax.random.PRNGKey(0)


def bench(name, fn, args, probe, n=20):
    out = fn(*args)
    np.asarray(probe(out))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        np.asarray(probe(out))
    print(f"{name:28s} {(time.time()-t0)/n*1e3:8.2f} ms", flush=True)
    return out


noop = jax.jit(lambda x: x + 1.0)
bench("rtt (tiny noop)", noop, (jnp.zeros(8),), lambda o: o)

xy, qp, dsc, okp = bench("s1 features+compact", s1, (gray, depth_j, K_j),
                         lambda o: o[0][:2])
dist, rows = bench("s2 segmented match", lambda d: s2(d, det.sdb), (dsc,),
                   lambda o: o[0][:2, 0])
det_out = bench(
    "s3 tier1+tier2 geometry",
    lambda k: s3(k, xy, qp, okp, dist, rows, det.sdb.points,
                 det.sdb.obj_start, det.sdb.spans),
    (key,), lambda o: o.accepted[:2])

# whole frame, chained (what streaming FPS is made of)
def full(k):
    a, b, c, d = s1(gray, depth_j, K_j)
    di, ro = s2(c, det.sdb)
    return s3(k, a, b, d, di, ro, det.sdb.points, det.sdb.obj_start,
              det.sdb.spans)

bench("full frame (chained)", full, (key,), lambda o: o.accepted[:2])
