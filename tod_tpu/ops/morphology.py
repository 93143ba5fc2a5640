"""Binary morphology + keypoint/mask validation.

TPU-native equivalents of the reference's training-side mask handling
(src/training/training.cpp:57-145): erode the object mask 4x with a 3x3
rectangular element, then for each keypoint either accept it where the mask is
set or snap it to the nearest in-mask pixel within a +/-2 px window, then
require valid depth at the snapped location.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tod_tpu.ops.depth import is_valid_depth


def erode(mask: jax.Array, iterations: int = 1) -> jax.Array:
    """Binary erosion with a 3x3 rect element, ``iterations`` times.

    Border behavior matches cv::erode's default (BORDER_CONSTANT with the
    morphology default value = +inf for erosion): pixels outside the image do
    not erode the inside. training.cpp:71 uses 4 iterations.
    """
    m = (mask > 0)
    # 4 iterations of 3x3 == one (2*it+1)^2 min-window.
    k = 2 * iterations + 1
    out = jax.lax.reduce_window(
        m, True, jax.lax.bitwise_and,
        window_dimensions=(k, k), window_strides=(1, 1), padding="SAME")
    return out


class ValidatedKeypoints(NamedTuple):
    """Result of mask+depth validation. All arrays are length-K, masked."""

    xy: jax.Array      # (K,2) int32 snapped integer pixel coords
    z: jax.Array       # (K,) float32 metric depth at the snapped coords
    valid: jax.Array   # (K,) bool


def validate_keypoints(xy: jax.Array, kp_valid: jax.Array, mask: jax.Array,
                       depth_m: jax.Array, window: int = 2,
                       erode_iterations: int = 4) -> ValidatedKeypoints:
    """validateKeyPoints analog (training.cpp:57-145), vectorized over K.

    ``xy``: (K,2) float keypoint coords; ``kp_valid``: (K,) bool padding mask;
    ``mask``: (H,W) object mask; ``depth_m``: (H,W) float32 metric depth.

    Semantics mirrored from the reference:
      * the mask is eroded ``erode_iterations`` times first (training.cpp:71);
      * a keypoint at rounded coords inside the mask is kept there;
      * otherwise the in-mask pixel within a (2*window+1)^2 neighborhood
        minimizing the squared distance to the float coords wins, ties broken
        by scan order x-major then y (the reference's i-outer/j-inner loop,
        training.cpp:88-102);
      * depth at the snapped pixel must be valid (training.cpp:107-129).
    """
    h, w = mask.shape
    eroded = erode(mask, erode_iterations)

    x0 = jnp.clip(jnp.round(xy[:, 0]), 0, w - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.round(xy[:, 1]), 0, h - 1).astype(jnp.int32)
    center_in = eroded[y0, x0]

    # Window candidates in x-major, then y order, matching the reference scan.
    offs = jnp.arange(-window, window + 1, dtype=jnp.int32)
    ox = jnp.repeat(offs, 2 * window + 1)   # (-2,-2,-2,-2,-2,-1,...)
    oy = jnp.tile(offs, 2 * window + 1)
    cx = jnp.clip(x0[:, None] + ox[None, :], 0, w - 1)  # (K, 25)
    cy = jnp.clip(y0[:, None] + oy[None, :], 0, h - 1)
    cand_in = eroded[cy, cx]
    dist_sq = ((cx.astype(jnp.float32) - xy[:, 0:1]) ** 2
               + (cy.astype(jnp.float32) - xy[:, 1:2]) ** 2)
    dist_sq = jnp.where(cand_in, dist_sq, jnp.inf)
    best = jnp.argmin(dist_sq, axis=1)  # first occurrence wins ties
    snap_x = jnp.take_along_axis(cx, best[:, None], 1)[:, 0]
    snap_y = jnp.take_along_axis(cy, best[:, None], 1)[:, 0]
    snapped_ok = jnp.isfinite(jnp.min(dist_sq, axis=1))

    out_x = jnp.where(center_in, x0, snap_x)
    out_y = jnp.where(center_in, y0, snap_y)
    in_mask = center_in | snapped_ok

    z = depth_m[out_y, out_x]
    valid = kp_valid & in_mask & is_valid_depth(z)
    return ValidatedKeypoints(
        xy=jnp.stack([out_x, out_y], axis=-1),
        z=jnp.where(valid, z, jnp.nan),
        valid=valid)
