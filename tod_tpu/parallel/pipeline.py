"""Pipeline parallelism: detection stages placed on different devices.

The SURVEY section 2c PP analog — "stage the cell graph (features on chip A,
matching on chip B)". The fused detector already runs as three chained XLA
programs (features / matching / geometry, models/fused.py); this module
places each stage on its own device so that, in a streaming workload,
frame N's feature extraction overlaps frame N-1's matching and frame N-2's
geometry — a classic 3-stage pipeline over ICI.

Placement follows data: inputs are `jax.device_put` to the stage's device
and the jitted stage computes where its operands live; inter-stage
transfers are async device-to-device copies (ICI on real hardware), so the
host dispatch loop never blocks.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from tod_tpu.models.fused import (
    FusedDetectorConfig,
    GeomDb,
    ModelDb,
    _stage_features,
    _stage_geometry,
    match_against_db,
    pack_models,
)


class PipelinedDetector:
    """3-stage device-pipelined detector.

    ``devices``: the stage placement [features, matching, geometry]; fewer
    devices are cycled (1 device = the plain staged detector). The model DB's
    matcher operands live on the matching device, the geometry operands
    (points/spans) on the geometry device — each stage's working set stays
    resident where it is used.
    """

    def __init__(self, models: Sequence, config: Optional[FusedDetectorConfig] = None,
                 devices: Optional[List[jax.Device]] = None, seed: int = 0):
        self.config = config or FusedDetectorConfig()
        if devices is None:
            devices = jax.devices()[:3]
        self.devices = [devices[i % len(devices)] for i in range(3)]
        db, self.object_ids = pack_models(models, self.config.db_chunk)
        # split the DB by stage residency: matcher operands live on the
        # matching device (geometry leaves stubbed out — match_against_db
        # never touches them), geometry operands on the geometry device
        d1, d2 = self.devices[1], self.devices[2]
        self.db_match = ModelDb(
            descriptors=jax.device_put(db.descriptors, d1),
            bits_t=jax.device_put(db.bits_t, d1),
            popcounts=jax.device_put(db.popcounts, d1),
            points=jax.device_put(jnp.zeros((1, 3)), d1),
            obj_of_row=jax.device_put(jnp.zeros(1, jnp.int32), d1),
            n_valid=jax.device_put(db.n_valid, d1),
            spans=jax.device_put(jnp.zeros(1), d1))
        self.db_geom = GeomDb(
            points=jax.device_put(db.points, d2),
            obj_of_row=jax.device_put(db.obj_of_row, d2),
            spans=jax.device_put(db.spans, d2))
        self._key = jax.random.PRNGKey(seed)
        cfg = self.config
        self._s1 = jax.jit(functools.partial(_stage_features, cfg=cfg))
        self._s2 = jax.jit(functools.partial(match_against_db, cfg=cfg))
        self._s3 = jax.jit(functools.partial(_stage_geometry, cfg=cfg))

    def prepare_frame(self, image, depth, K):
        import numpy as np

        from tod_tpu.ops.image import rgb_to_gray

        img = jnp.asarray(np.asarray(image), jnp.float32)
        gray = rgb_to_gray(img) if img.ndim == 3 else img
        return (jax.device_put(gray, self.devices[0]),
                jax.device_put(jnp.asarray(np.asarray(depth)),
                               self.devices[0]),
                jax.device_put(jnp.asarray(np.asarray(K, jnp.float32)),
                               self.devices[0]))

    def detect_raw(self, gray, depth, K):
        """One frame through the 3-stage pipeline; async end to end."""
        d0, d1, d2 = self.devices
        self._key, sub = jax.random.split(self._key)
        kps, desc, query_pts = self._s1(gray, depth, K)
        dist, rows = self._s2(jax.device_put(desc, d1), self.db_match)
        det = self._s3(jax.device_put(sub, d2),
                       jax.device_put(kps.xy, d2),
                       jax.device_put(kps.valid, d2),
                       jax.device_put(dist, d2),
                       jax.device_put(rows, d2),
                       jax.device_put(query_pts, d2),
                       self.db_geom)
        return kps, det

    def detect_stream(self, frames) -> List:
        """Detect a sequence of prepared frames; dispatches stay ahead of
        execution so the three stages overlap across consecutive frames."""
        return [self.detect_raw(*f)[1] for f in frames]
