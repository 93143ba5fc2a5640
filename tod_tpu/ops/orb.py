"""ORB feature pipeline: pyramid -> FAST/Harris -> orientation -> rBRIEF-256.

TPU-native replacement for cv::ORB (reference usage:
src/training/Trainer.cpp:144-150 for training, the ecto_opencv
FeatureDescriptor cell at detector.py:27 for detection; operating points from
conf/detection.ork:26-28 — n_features=5000, n_levels=3, scale_factor=1.2).

Design notes (deliberate deviations, all self-consistent between train/detect):
  * keypoint ranking is Harris-among-FAST-corners in a single static top-K
    per level instead of OpenCV's retainBest(2N)->Harris->retainBest(N);
  * the rBRIEF sampling pattern is a deterministic seeded Gaussian pattern
    (BRIEF-paper construction) rather than OpenCV's learned table — descriptors
    are a private format between our trainer and detector;
  * orientation uses the intensity-centroid moments computed as one dense
    2-channel 31x31 convolution (MXU) instead of per-keypoint patch loops.
"""

from __future__ import annotations

import functools
import os
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tod_tpu.ops.fast import (
    fast_score,
    features_per_level,
    harris_response,
    select_topk_keypoints,
    subpixel_offsets,
)
from tod_tpu.ops.image import build_pyramid, gaussian_blur, resize_nearest

HALF_PATCH = 15          # orientation patch radius (cv::ORB half_patch_size)
PATCH_RADIUS = 13        # rBRIEF sample coordinates live in [-13, 13]
EDGE_THRESHOLD = 31      # keypoint margin (cv::ORB edgeThreshold default)
N_BITS = 256


class Keypoints(NamedTuple):
    """A fixed-capacity batch of keypoints (padded; use ``valid``)."""

    xy: jax.Array        # (K,2) float32 — level-0 pixel coords
    response: jax.Array  # (K,) float32 — Harris response
    angle: jax.Array     # (K,) float32 — orientation, radians
    level: jax.Array     # (K,) int32 — pyramid level
    valid: jax.Array     # (K,) bool


# ---------------------------------------------------------------------------
# rBRIEF pattern
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def brief_pattern(seed: int = 1234, n_bits: int = N_BITS) -> np.ndarray:
    """(n_bits, 2, 2) int32 point-pair test pattern.

    Default: seeded i.i.d. Gaussian pairs (the BRIEF-paper construction),
    sigma = patch/5, clipped to +/-PATCH_RADIUS, degenerate pairs rejected
    deterministically. Descriptors are a private format between our trainer
    and detector.

    TOD_BRIEF_PATTERN=learned switches to the decorrelated pattern built by
    tools/learn_brief.py (ORB-paper greedy selection). Measured negative
    result, kept for reproducibility: on trained models it raises junk NN
    distances AND true-match distances by the same ~1.5x (correct/junk
    separation unchanged — cross-view repeatability, not bit correlation,
    is the limiting factor), while breaking radius-35 configs tuned to the
    Gaussian distance scale.
    """
    if os.environ.get("TOD_BRIEF_PATTERN", "gaussian") == "learned":
        path = os.path.join(os.path.dirname(__file__), "data",
                            "brief_pattern_learned.npy")
        if os.path.exists(path):
            pat = np.load(path).astype(np.int32)
            if pat.shape == (n_bits, 2, 2):
                return pat
    rs = np.random.RandomState(seed)
    sigma = (2 * PATCH_RADIUS + 1) / 5.0
    pairs = np.zeros((n_bits, 2, 2), np.int32)
    n_done = 0
    while n_done < n_bits:
        cand = np.clip(np.round(rs.normal(0.0, sigma, size=(4,))),
                       -PATCH_RADIUS, PATCH_RADIUS).astype(np.int32)
        p1, p2 = cand[:2], cand[2:]
        if (p1 == p2).all():
            continue
        pairs[n_done, 0] = p1
        pairs[n_done, 1] = p2
        n_done += 1
    return pairs


# ---------------------------------------------------------------------------
# Orientation (intensity centroid)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _circle_half_widths() -> np.ndarray:
    """Circle half-width per row offset: the cvRound(sqrt(r^2 - dy^2))
    construction of cv::ORB IC_Angle's u_max table."""
    dys = np.arange(-HALF_PATCH, HALF_PATCH + 1)
    return np.round(np.sqrt(HALF_PATCH**2
                            - np.minimum(dys**2, HALF_PATCH**2))).astype(int)


def orientation_moments(img: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Dense (m10, m01) intensity-centroid moment maps, exactly equal to the
    31x31 circular-kernel convolution but computed via integral images:

      m10(p) = sum_dx dx * (column-sum of I over the circle's column at dx)

    i.e. one cumsum along each axis plus 31 shifted-difference terms — a
    handful of VPU passes instead of a 961-tap conv (which XLA lowers through
    an im2col that blows out HBM: measured 35ms vs <1ms for this form).
    Borders use zero padding; keypoints sit >= EDGE_THRESHOLD from the edge
    where padding never reaches.
    """
    widths = _circle_half_widths()
    h, w = img.shape
    x = img.astype(jnp.float32)
    pad = HALF_PATCH + 1

    # vertical integral: V[y, x] = sum_{y' <= y} I[y', x]
    v = jnp.pad(jnp.cumsum(jnp.pad(x, ((1, 0), (0, 0))), axis=0),
                ((pad, pad), (pad, pad)))
    # horizontal integral: Hc[y, x] = sum_{x' <= x} I[y, x']
    hc = jnp.pad(jnp.cumsum(jnp.pad(x, ((0, 0), (1, 0))), axis=1),
                 ((pad, pad), (pad, pad)))

    def vslice(arr, dy, dx):
        # arr[(pad+1) + y + dy, pad + x + dx] for all (y, x) — arr carries the
        # +1 cumsum row already, so index pad+dy+? carefully via dynamic_slice
        return jax.lax.dynamic_slice(arr, (pad + dy, pad + dx), (h, w))

    m10 = jnp.zeros_like(x)
    m01 = jnp.zeros_like(x)
    for dy in range(-HALF_PATCH, HALF_PATCH + 1):
        hw = int(widths[dy + HALF_PATCH])
        if dy != 0:
            # m01 term: dy * (row sum of I over x in [x-hw, x+hw] at y+dy)
            row_sum = (vslice(hc, dy, hw + 1) - vslice(hc, dy, -hw))
            m01 = m01 + dy * row_sum
    for dx in range(-HALF_PATCH, HALF_PATCH + 1):
        hw = int(widths[dx + HALF_PATCH])  # circle is symmetric
        if dx != 0:
            # m10 term: dx * (column sum of I over y in [y-hw, y+hw] at x+dx)
            col_sum = (vslice(v, hw + 1, dx) - vslice(v, -hw, dx))
            m10 = m10 + dx * col_sum
    return m10, m01


def keypoint_angles(img: jax.Array, xy: jax.Array) -> jax.Array:
    """Orientation at integer keypoint coords: atan2(m01, m10)."""
    m10, m01 = orientation_moments(img)
    gx = m10[xy[:, 1], xy[:, 0]]
    gy = m01[xy[:, 1], xy[:, 0]]
    return jnp.arctan2(gy, gx)


# ---------------------------------------------------------------------------
# rBRIEF descriptor sampling
# ---------------------------------------------------------------------------


N_ANGLE_BINS = 32       # steered-BRIEF orientation quantization (the ORB
                        # paper itself discretizes to 2*pi/30; we use 32)
PATCH_R = 18            # rotated pattern radius: 13*sqrt(2) ~ 18.4, clipped
PATCH_W = 2 * PATCH_R + 1


@functools.lru_cache(maxsize=None)
def _binned_diff_tables(n_bins: int = N_ANGLE_BINS) -> np.ndarray:
    """(n_bins, PATCH_W^2, 256) int8 difference tables: column (b, :, i) has
    +1 at the patch-local index of rotated p2_i and -1 at rotated p1_i for
    angle bin b, so  bit_i = (patch . column > 0)  ==  I(p1) < I(p2)."""
    pattern = brief_pattern().astype(np.float64)          # (256, 2, 2)
    tables = np.zeros((n_bins, PATCH_W * PATCH_W, N_BITS), np.int8)
    for b in range(n_bins):
        theta = 2.0 * np.pi * b / n_bins
        ca, sa = np.cos(theta), np.sin(theta)
        rx = np.clip(np.round(pattern[..., 0] * ca - pattern[..., 1] * sa),
                     -PATCH_R, PATCH_R).astype(int)
        ry = np.clip(np.round(pattern[..., 0] * sa + pattern[..., 1] * ca),
                     -PATCH_R, PATCH_R).astype(int)
        idx = (ry + PATCH_R) * PATCH_W + (rx + PATCH_R)   # (256, 2)
        for i in range(N_BITS):
            tables[b, idx[i, 1], i] += 1                  # + I(p2)
            tables[b, idx[i, 0], i] -= 1                  # - I(p1)
    return tables


def extract_patches(image: jax.Array, xy: jax.Array,
                    radius: int = PATCH_R) -> jax.Array:
    """(K, 2R+1, 2R+1) patches via vmapped dynamic_slice — the structured
    (row-contiguous) gather the TPU handles well; JAX clamps out-of-range
    starts, and real keypoints carry an EDGE_THRESHOLD margin anyway."""

    def one(p):
        return jax.lax.dynamic_slice(
            image, (p[1] - radius, p[0] - radius),
            (2 * radius + 1, 2 * radius + 1))

    return jax.vmap(one)(xy)


def brief_descriptors(blurred: jax.Array, xy: jax.Array,
                      angle: jax.Array) -> jax.Array:
    """Steered BRIEF-256 bits for keypoints at integer level coords.

    ``blurred``: the Gaussian-smoothed level image; ``xy``: (K,2) int32;
    ``angle``: (K,) radians. Returns (K, 32) uint8, 8 pairs per byte
    LSB-first (cv::ORB bit packing; descriptor format parity with the
    reference's N x 32 CV_8U model attachment, DescriptorMatcher.cpp:74-80).

    TPU-first formulation: instead of 512 scattered per-keypoint gathers
    (XLA gathers are element-at-a-time on TPU), extract each keypoint's
    37x37 patch with one structured slice and evaluate ALL angle bins' bit
    comparisons as one (K, 1369) x (1369, n_bins*256) MXU matmul against
    static +1/-1 difference tables, then select each keypoint's bin. The
    angle is quantized to 2*pi/32 (the ORB paper's steered-BRIEF table uses
    2*pi/30) — self-consistent between training and detection.
    """
    k_count = xy.shape[0]
    patches = extract_patches(blurred, xy).reshape(k_count, -1)  # (K, 1369)
    tables = jnp.asarray(np.ascontiguousarray(
        _binned_diff_tables().transpose(1, 0, 2).reshape(
            PATCH_W * PATCH_W, -1)), jnp.bfloat16)       # (1369, bins*256)
    diffs = jnp.dot(patches.astype(jnp.bfloat16), tables,
                    preferred_element_type=jnp.float32)  # (K, bins*256)
    diffs = diffs.reshape(k_count, N_ANGLE_BINS, N_BITS)

    two_pi = 2.0 * np.pi
    bins = jnp.mod(jnp.round(angle / (two_pi / N_ANGLE_BINS)),
                   N_ANGLE_BINS).astype(jnp.int32)       # (K,)
    onehot = jax.nn.one_hot(bins, N_ANGLE_BINS, dtype=diffs.dtype)
    selected = jnp.einsum("kbi,kb->ki", diffs, onehot)   # (K, 256)
    bits = (selected > 0).astype(jnp.uint8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))[None, None, :]
    return (bits.reshape(-1, 32, 8) * weights).sum(axis=-1, dtype=jnp.uint8)


# ---------------------------------------------------------------------------
# Full detect-and-compute
# ---------------------------------------------------------------------------


def orb_detect_and_compute(
        gray: jax.Array,
        n_features: int = 500,
        n_levels: int = 3,
        scale_factor: float = 1.2,
        fast_threshold: float = 20.0,
        edge_threshold: int = EDGE_THRESHOLD,
        mask: Optional[jax.Array] = None,
        subpixel: bool = False) -> Tuple[Keypoints, jax.Array]:
    """ORB keypoints + 256-bit descriptors with fully static shapes.

    Returns ``(Keypoints, descriptors)`` with exactly ``n_features`` padded
    slots; invalid slots have valid=False and zero descriptors. ``mask``
    (H,W, nonzero = allowed), when given, restricts detection like the
    cv::ORB mask argument used during training (Trainer.cpp:147).
    ``subpixel`` refines reported keypoint coords by parabola fitting on the
    FAST score map (descriptors/orientation still sample integer coords).
    OFF by default: the trainer's mask snap quantizes model points to integer
    pixels (reference semantics, training.cpp:88-102), and refining only the
    detection side MEASURABLY HURTS end-to-end recall (0.917 -> 0.833 on the
    100-object bench) — the quantization errors stop cancelling. Useful only
    when both sides opt in.
    """
    levels = build_pyramid(gray, n_levels, scale_factor)
    counts = features_per_level(n_features, n_levels, scale_factor)

    kxs: List[jax.Array] = []
    all_desc: List[jax.Array] = []
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
        blurred = gaussian_blur(img, 7, 2.0)
        desc = brief_descriptors(blurred, xy, angle)
        desc = jnp.where(valid[:, None], desc, jnp.uint8(0))

        xy_f = xy.astype(jnp.float32)
        if subpixel:
            xy_f = xy_f + subpixel_offsets(score, xy)
        kxs.append(xy_f * scale)
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
