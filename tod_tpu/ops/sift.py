"""SIFT-style float descriptors, TPU-native.

Completes the reference's ``type: SIFT`` configuration path
(doc/source/index.rst:45 "OpenCV features ... ORB or SIFT";
Trainer.cpp:91 ``json_feature_params``): float descriptors matched by L2
(ops.matching.l2_topk, the DescriptorMatcher float mode).

Design (documented deviation): keypoints come from the shared FAST+Harris
detector (tod_tpu.ops.fast) rather than a DoG pyramid — the descriptor is
the classic SIFT 4x4-spatial x 8-orientation gradient histogram (Lowe 2004)
computed TPU-first:

  * per-keypoint 37x37 patches via structured dynamic_slice (one gather-free
    slice each, like rBRIEF);
  * gradient orientations are taken RELATIVE to the keypoint angle exactly
    (a continuous subtraction — no table needed);
  * the ROTATED 4x4 spatial grid is the only rotation-dependent part, so it
    is precomputed as per-angle-bin weight tables and applied as one MXU
    contraction over pixels, then the keypoint's bin is selected by a
    one-hot einsum — the same binned-table trick as the steered BRIEF
    (ops/orb.py brief_descriptors);
  * trilinear soft-binning and the standard normalize -> clip(0.2) ->
    renormalize follow Lowe's construction.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tod_tpu.ops.image import gaussian_blur
from tod_tpu.ops.orb import (
    EDGE_THRESHOLD,
    Keypoints,
    N_ANGLE_BINS,
    PATCH_R,
    PATCH_W,
    extract_patches,
    keypoint_angles,
)
from tod_tpu.ops.fast import fast_score, features_per_level, harris_response, \
    select_topk_keypoints
from tod_tpu.ops.image import build_pyramid, resize_nearest

N_SPATIAL = 4            # 4x4 spatial grid
N_ORI = 8                # 8 orientation bins
DESC_DIM = N_SPATIAL * N_SPATIAL * N_ORI   # 128
SUPPORT_R = 12.0         # descriptor support radius in patch pixels


@functools.lru_cache(maxsize=None)
def _spatial_tables(n_bins: int = N_ANGLE_BINS) -> np.ndarray:
    """(PATCH_W^2, n_bins * 16) float32: for angle bin b, column b*16+s holds
    pixel p's bilinear weight in rotated spatial cell s (Gaussian-windowed,
    sigma = half the support, per Lowe)."""
    w = PATCH_W
    ys, xs = np.mgrid[-PATCH_R:PATCH_R + 1, -PATCH_R:PATCH_R + 1]
    tables = np.zeros((w * w, n_bins * 16), np.float32)
    cell = 2.0 * SUPPORT_R / N_SPATIAL
    for b in range(n_bins):
        theta = 2.0 * np.pi * b / n_bins
        ca, sa = np.cos(theta), np.sin(theta)
        # rotate pixel offsets INTO the keypoint frame (by -theta)
        rx = xs * ca + ys * sa
        ry = -xs * sa + ys * ca
        # continuous cell coords in [0, 4); center of grid at 0
        cx = rx / cell + N_SPATIAL / 2.0 - 0.5
        cy = ry / cell + N_SPATIAL / 2.0 - 0.5
        win = np.exp(-(rx**2 + ry**2) / (2.0 * SUPPORT_R**2))
        x0 = np.floor(cx).astype(int)
        y0 = np.floor(cy).astype(int)
        fx = cx - x0
        fy = cy - y0
        for dy in (0, 1):
            for dx in (0, 1):
                xb = x0 + dx
                yb = y0 + dy
                inside = (xb >= 0) & (xb < N_SPATIAL) & (yb >= 0) \
                    & (yb < N_SPATIAL)
                wgt = np.where(inside,
                               win * np.abs(1 - dx - fx) * np.abs(1 - dy - fy),
                               0.0)
                s = np.clip(yb, 0, 3) * N_SPATIAL + np.clip(xb, 0, 3)
                np.add.at(tables, (np.arange(w * w),
                                   b * 16 + s.ravel()), wgt.ravel())
    return tables


def sift_descriptors(img: jax.Array, xy: jax.Array,
                     angle: jax.Array) -> jax.Array:
    """(K, 128) float32 SIFT descriptors at integer level coords ``xy`` with
    orientations ``angle`` (radians)."""
    k_count = xy.shape[0]
    patches = extract_patches(img, xy)                    # (K, 37, 37)
    # central-difference gradients (zero border)
    gx = jnp.pad(patches[:, :, 2:] - patches[:, :, :-2],
                 ((0, 0), (0, 0), (1, 1)))
    gy = jnp.pad(patches[:, 2:, :] - patches[:, :-2, :],
                 ((0, 0), (1, 1), (0, 0)))
    mag = jnp.sqrt(gx * gx + gy * gy).reshape(k_count, -1)     # (K, P)
    ori = jnp.arctan2(gy, gx).reshape(k_count, -1)             # (K, P)

    # orientation relative to the keypoint angle, soft-binned into 8 bins
    rel = (ori - angle[:, None]) * (N_ORI / (2.0 * np.pi))
    rel = jnp.mod(rel, N_ORI)                                  # [0, 8)
    bin0 = jnp.floor(rel)
    frac = rel - bin0
    b0 = bin0.astype(jnp.int32) % N_ORI
    b1 = (b0 + 1) % N_ORI
    obins = jnp.arange(N_ORI)
    w_o = ((b0[:, :, None] == obins) * (1.0 - frac[:, :, None])
           + (b1[:, :, None] == obins) * frac[:, :, None])     # (K, P, 8)
    t = mag[:, :, None] * w_o                                  # (K, P, 8)

    tables = jnp.asarray(_spatial_tables())                    # (P, B*16)
    # one MXU contraction over pixels for ALL angle bins at once
    d_all = jnp.einsum("kpo,pq->kqo", t, tables)               # (K, B*16, 8)
    d_all = d_all.reshape(k_count, N_ANGLE_BINS, 16, N_ORI)

    two_pi = 2.0 * np.pi
    bins = jnp.mod(jnp.round(angle / (two_pi / N_ANGLE_BINS)),
                   N_ANGLE_BINS).astype(jnp.int32)
    onehot = jax.nn.one_hot(bins, N_ANGLE_BINS, dtype=d_all.dtype)
    desc = jnp.einsum("kbso,kb->kso", d_all, onehot).reshape(k_count, -1)

    # Lowe normalization: unit norm, clip 0.2, renormalize
    norm = jnp.linalg.norm(desc, axis=1, keepdims=True) + 1e-9
    desc = jnp.minimum(desc / norm, 0.2)
    norm = jnp.linalg.norm(desc, axis=1, keepdims=True) + 1e-9
    return (desc / norm).astype(jnp.float32)


def sift_detect_and_compute(
        gray: jax.Array,
        n_features: int = 500,
        n_levels: int = 3,
        scale_factor: float = 1.2,
        fast_threshold: float = 20.0,
        edge_threshold: int = EDGE_THRESHOLD,
        mask: Optional[jax.Array] = None) -> Tuple[Keypoints, jax.Array]:
    """FAST/Harris keypoints + SIFT-128 float descriptors, static shapes.
    Mirrors orb_detect_and_compute's contract (padded slots, ``valid``)."""
    levels = build_pyramid(gray, n_levels, scale_factor)
    counts = features_per_level(n_features, n_levels, scale_factor)

    kxs, all_desc = [], []
    all_resp, all_angle, all_level, all_valid = [], [], [], []
    for lvl, (img, k_lvl) in enumerate(zip(levels, counts)):
        if k_lvl == 0:
            continue
        scale = scale_factor**lvl
        score, is_corner = fast_score(img, fast_threshold)
        harris = harris_response(img)
        lvl_mask = None
        if mask is not None:
            lvl_mask = (resize_nearest(mask.astype(jnp.float32), img.shape)
                        if img.shape != mask.shape else mask)
        xy, resp, valid = select_topk_keypoints(
            score, harris, is_corner, k_lvl, edge_threshold, lvl_mask)
        angle = keypoint_angles(img, xy)
        blurred = gaussian_blur(img, 7, 1.6)   # Lowe's sigma for the octave
        desc = sift_descriptors(blurred, xy, angle)
        desc = jnp.where(valid[:, None], desc, 0.0)

        kxs.append(xy.astype(jnp.float32) * scale)
        all_resp.append(resp)
        all_angle.append(angle)
        all_level.append(jnp.full((k_lvl,), lvl, jnp.int32))
        all_valid.append(valid)
        all_desc.append(desc)

    kps = Keypoints(
        xy=jnp.concatenate(kxs),
        response=jnp.concatenate(all_resp),
        angle=jnp.concatenate(all_angle),
        level=jnp.concatenate(all_level),
        valid=jnp.concatenate(all_valid),
    )
    return kps, jnp.concatenate(all_desc)
