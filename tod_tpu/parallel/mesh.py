"""Device mesh construction.

The reference has zero multi-device capability (SURVEY.md section 2c);
scaling here is first-class: a 2D ('data', 'db') mesh where
  * 'data' shards independent frames/views (data parallelism), and
  * 'db'   shards the model-descriptor database rows (the tensor-parallel
    analog: each chip holds a DB shard, computes partial Hamming matmuls, and
    the per-query top-k is merged with an all_gather over ICI).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_data: Optional[int] = None, n_db: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ('data', 'db') mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_db
    n = n_data * n_db
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(n_data, n_db)
    return Mesh(arr, ("data", "db"))
