"""One-round-trip device->host fetches.

Through the TPU tunnel every ``jax.device_get`` costs a full ~25-30 ms RTT,
so fetching an ObjectDetections result as four separate gets costs ~100 ms
of pure latency on the interactive path (measured: FusedDetector.detect()
at 174 ms where the chained on-device work syncs in 60 — tools/
diag_cf_stages.py). ``fetch_arrays`` packs the arrays into ONE flat f32
buffer on device (tiny jitted concat; int32/bool leaves are bitcast, not
converted, so the transport is exact) and downloads once.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _pack(arrays):
    flats = []
    for a in arrays:
        f = a.ravel()
        if f.dtype == jnp.bool_:
            f = f.astype(jnp.int32)
        if f.dtype in (jnp.int8, jnp.uint8, jnp.int16, jnp.uint16):
            f = f.astype(jnp.int32)        # widen sub-word ints (exact)
        if f.dtype != jnp.float32:
            f = jax.lax.bitcast_convert_type(f, jnp.float32)
        flats.append(f)
    return jnp.concatenate(flats) if flats else jnp.zeros(0, jnp.float32)


def fetch_arrays(*arrays: jax.Array) -> List[np.ndarray]:
    """Fetch several device arrays with ONE download; returns numpy arrays
    with the original shapes/dtypes. f32/f-typed leaves pass through;
    i32/bool (and sub-word ints, widened) travel bitcast inside the f32
    buffer — bit-exact, no value conversion."""
    if not arrays:
        return []
    specs = [(a.shape, np.dtype(a.dtype)) for a in arrays]
    flat = np.asarray(jax.device_get(_pack(tuple(arrays))))
    out: List[np.ndarray] = []
    pos = 0
    for shape, dtype in specs:
        n = int(np.prod(shape))
        seg = flat[pos:pos + n]
        pos += n
        if dtype == np.bool_:
            out.append(seg.view(np.int32).astype(bool).reshape(shape))
        elif dtype == np.float32:
            out.append(seg.reshape(shape))
        else:
            out.append(seg.view(np.int32).astype(dtype).reshape(shape))
    return out
