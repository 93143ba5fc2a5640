"""Pipelined timing through the axon tunnel: N async dispatches + one hard
sync, RTT amortized. block_until_ready does not block on this backend, so a
scalar download is the only true sync."""
import time

import numpy as np
import jax


def timeit(fn, args, n=50, tag=""):
    # reduce over EVERY output leaf: forcing only one lets XLA dead-code-
    # eliminate the rest of the computation
    def probe(*a):
        leaves = jax.tree.leaves(fn(*a))
        return sum(l.astype("float32").sum() for l in leaves)

    jf = jax.jit(probe)
    float(jf(*args))  # compile + warm
    t0 = time.time()
    for _ in range(n - 1):
        jf(*args)      # async dispatch
    s = float(jf(*args))  # one hard sync drains the pipeline
    dt = (time.time() - t0) / n
    if tag:
        print(f"{tag:34s} {dt*1e3:8.2f} ms", flush=True)
    return dt
