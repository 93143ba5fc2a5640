"""FAST-9/16 corner detection + Harris response + NMS + top-K selection.

TPU-native replacement for the detection half of cv::ORB
(src/training/Trainer.cpp:144-150; the ecto_opencv FeatureDescriptor cell,
python/object_recognition_tod/detector.py:27). Everything is computed as dense
score maps (VPU-friendly, static shapes) followed by a per-level top-K — no
data-dependent compaction, per SURVEY.md section 7 "FAST/NMS irregularity".
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# The 16-pixel Bresenham circle of radius 3 in circular order (dx, dy),
# starting at 12 o'clock and going clockwise (the standard FAST ordering).
FAST_CIRCLE = np.array(
    [(0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
     (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3)],
    dtype=np.int32)


def _circular_window_min9(diff: jax.Array) -> jax.Array:
    """Sliding circular-window minimum of length 9 along axis 0 (length 16),
    via the log-step doubling trick: 4 elementwise mins instead of 16x9."""
    m2 = jnp.minimum(diff, jnp.roll(diff, -1, axis=0))   # window 2
    m4 = jnp.minimum(m2, jnp.roll(m2, -2, axis=0))       # window 4
    m8 = jnp.minimum(m4, jnp.roll(m4, -4, axis=0))       # window 8
    return jnp.minimum(m8, jnp.roll(diff, -8, axis=0))   # window 9


def fast_score(img: jax.Array, threshold: float) -> Tuple[jax.Array, jax.Array]:
    """Dense FAST-9/16 score map.

    Returns ``(score, is_corner)``: score is the maximum threshold t' at which
    the pixel would still be a FAST corner (the same quantity cv::FAST uses
    for non-max suppression); is_corner = score > threshold.
    """
    h, w = img.shape
    img = img.astype(jnp.float32)
    padded = jnp.pad(img, 3, mode="edge")
    shifted = jnp.stack(
        [jax.lax.dynamic_slice(padded, (3 + dy, 3 + dx), (h, w))
         for dx, dy in FAST_CIRCLE])                    # (16, H, W)
    diff = shifted - img[None]
    # Brighter arcs: max over 16 start positions of (min over the 9-arc).
    score_bright = _circular_window_min9(diff).max(axis=0)
    score_dark = _circular_window_min9(-diff).max(axis=0)
    score = jnp.maximum(score_bright, score_dark)
    # FAST corners never fire within 3px of the border in OpenCV; replicate-
    # padding could create fake arcs there, so mask the frame.
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    interior = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
    score = jnp.where(interior, score, 0.0)
    return score, score > threshold


def harris_response(img: jax.Array, block_size: int = 7,
                    harris_k: float = 0.04) -> jax.Array:
    """Dense Harris corner response, matching cv::ORB's HarrisResponses:
    central-difference derivatives, a block_size^2 box window, and
    f = det(M) - k*trace(M)^2 (the absolute scale does not matter — it is only
    used to *rank* FAST corners)."""
    img = img.astype(jnp.float32)
    ix = jnp.pad(img[:, 2:] - img[:, :-2], ((0, 0), (1, 1)))
    iy = jnp.pad(img[2:] - img[:-2], ((1, 1), (0, 0)))
    def box(x):
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (block_size, block_size), (1, 1), "SAME")
    a = box(ix * ix)
    b = box(iy * iy)
    c = box(ix * iy)
    scale = 1.0 / (4.0 * block_size * 255.0)
    return (a * b - c * c - harris_k * (a + b) ** 2) * scale**4


def nms3x3(score: jax.Array) -> jax.Array:
    """3x3 non-max suppression mask: a pixel survives iff its score equals the
    3x3 neighborhood max (ties keep both, like the reference's >= comparisons
    against already-suppressed neighbors)."""
    pooled = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    return score >= pooled


def select_topk_keypoints(
        fast: jax.Array, harris: jax.Array, is_corner: jax.Array, k: int,
        edge_threshold: int = 31,
        mask: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pick the top-k corners by Harris response after FAST-score NMS.

    Mirrors cv::ORB's two-stage retention (FAST -> NMS -> Harris ranking) in a
    single static top-k. Returns ``(xy int32 (k,2), response (k,), valid (k,))``.
    """
    h, w = fast.shape
    keep = is_corner & nms3x3(fast)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inside = ((ys >= edge_threshold) & (ys < h - edge_threshold)
              & (xs >= edge_threshold) & (xs < w - edge_threshold))
    keep = keep & inside
    if mask is not None:
        keep = keep & (mask > 0)
    ranked = jnp.where(keep, harris, -jnp.inf).ravel()
    resp, idx = jax.lax.top_k(ranked, k)
    valid = jnp.isfinite(resp)
    xy = jnp.stack([idx % w, idx // w], axis=-1).astype(jnp.int32)
    return xy, resp, valid


def subpixel_offsets(score: jax.Array, xy: jax.Array) -> jax.Array:
    """Sub-pixel corner localization: per-axis 3-point parabola vertex on the
    score map at integer keypoint coords. Returns (K, 2) float32 offsets in
    [-0.5, 0.5]. cv::ORB reports integer FAST corners; quantization costs
    ~0.7mm per side at z=0.9m once back-projected, so refining here tightens
    both trained model points and detection poses (capability beyond the
    reference)."""
    h, w = score.shape
    x = jnp.clip(xy[:, 0], 1, w - 2)
    y = jnp.clip(xy[:, 1], 1, h - 2)

    def parab(sm, s0, sp):
        denom = sm - 2.0 * s0 + sp
        off = jnp.where(jnp.abs(denom) > 1e-6,
                        0.5 * (sm - sp) / jnp.where(
                            jnp.abs(denom) > 1e-6, denom, 1.0), 0.0)
        return jnp.clip(off, -0.5, 0.5)

    ox = parab(score[y, x - 1], score[y, x], score[y, x + 1])
    oy = parab(score[y - 1, x], score[y, x], score[y + 1, x])
    return jnp.stack([ox, oy], axis=-1)


def features_per_level(n_features: int, n_levels: int,
                       scale_factor: float) -> Tuple[int, ...]:
    """cv::ORB's geometric per-level feature budget: level l gets
    n*(1-f)/(1-f^L)*f^l features (f = 1/scale), the last level the rest."""
    factor = 1.0 / scale_factor
    n_desired = n_features * (1 - factor) / (1 - factor**n_levels)
    counts = []
    remaining = n_features
    for level in range(n_levels - 1):
        c = min(remaining, int(round(n_desired * factor**level)))
        counts.append(c)
        remaining -= c
    counts.append(remaining)
    return tuple(counts)
