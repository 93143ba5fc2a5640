"""Model compression: dedup near-identical (descriptor, point) pairs.

Turntable captures see the same physical feature in many adjacent views, so
the stacked model (mergePoints, training.cpp:147-173) carries large numbers of
near-duplicate descriptors at near-identical 3D points. The reference keeps
them all; deduplicating shrinks the matcher's DB (its hottest axis) by 2-4x
with no recall cost — a duplicate's neighbors are the survivor's neighbors.

A (descriptor, point) row is dropped iff an earlier row exists with Hamming
distance <= ``hamming_threshold`` AND 3D distance <= ``point_threshold``:
same appearance at the same place. Same appearance elsewhere (repetitive
texture) and different appearance at the same place (viewpoint change) are
both preserved. Runs at train time on the CPU via the native brute-force
k-NN (tod_tpu.native.hamming_knn_cpu).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def compress_model(descriptors: np.ndarray, points: np.ndarray,
                   hamming_threshold: int = 8,
                   point_threshold: float = 0.005,
                   k_neighbors: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Drop rows duplicating an earlier (descriptor, point) pair.

    ``descriptors``: (N, 32) uint8; ``points``: (N, 3) float32.
    Returns the filtered (descriptors, points).
    """
    from tod_tpu.native import hamming_knn_cpu

    n = len(descriptors)
    if n <= 1:
        return descriptors, points
    idx, dist = hamming_knn_cpu(descriptors, descriptors,
                                k=min(k_neighbors, n))
    pts = np.asarray(points, np.float32)
    # neighbor j duplicates i when close in both spaces; only earlier rows
    # (j < i) suppress, so the first appearance always survives.
    nb_pts = pts[idx]                                    # (N, k, 3)
    d3 = np.linalg.norm(nb_pts - pts[:, None, :], axis=-1)
    dup_pair = ((dist <= hamming_threshold)
                & (d3 <= point_threshold)
                & (idx < np.arange(n)[:, None]))
    is_dup = dup_pair.any(axis=1)
    # Chain safety: a row may only be suppressed by a SURVIVING earlier row,
    # otherwise chains of pairwise-close rows could all vanish. One forward
    # pass resolves it (suppressors are strictly earlier).
    keep = np.ones(n, bool)
    for i in np.nonzero(is_dup)[0]:
        js = idx[i][dup_pair[i]]
        keep[i] = not keep[js].any()
    return descriptors[keep], points[keep]
