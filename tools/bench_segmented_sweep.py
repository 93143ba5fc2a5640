"""Tile-shape sweep for the segmented per-object kernel (hard syncs)."""
import os
import sys
import time

sys.path.insert(0, ".")
import numpy as np

os.environ.setdefault("BENCH_DB_CACHE", "/tmp/bench_cache")

import jax
import jax.numpy as jnp

from bench import build_db
from tod_tpu.ops.pallas.segmented import object_top1_fused, pack_segmented

objects, models = build_db(100)

rng = np.random.default_rng(0)
q = rng.integers(0, 256, (2048, 32), dtype=np.uint8)
jq = jnp.asarray(q)

for db_chunk in (4096, 8192, 16384):
    db = pack_segmented(models, db_chunk=db_chunk)
    n = db.bits_t.shape[1]
    for q_tile in (256, 512, 1024, 2048):
        try:
            fn = jax.jit(lambda a, d: object_top1_fused(
                a, d, q_tile=q_tile, db_chunk=db_chunk))
            out = fn(jq, db)
            float(out[0].sum())
            t0 = time.time()
            reps = 20
            for _ in range(reps - 1):
                fn(jq, db)
            d, _ = fn(jq, db)
            float(d.sum())
            dt = (time.time() - t0) / reps * 1e3
            print(f"chunk={db_chunk:6d} rows={n:8d} q_tile={q_tile:5d}: "
                  f"{dt:7.2f} ms", flush=True)
        except Exception as e:
            print(f"chunk={db_chunk} q_tile={q_tile}: FAIL {type(e).__name__}"
                  f" {str(e)[:120]}", flush=True)
