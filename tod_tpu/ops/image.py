"""Dense image ops: grayscale, separable Gaussian blur, pyramid resize.

TPU-native equivalents of the ecto_opencv image ops the reference pipeline
uses (imgproc.cvtColor at detector.py:84; the pyramid + 7x7 blur inside
cv::ORB). All shapes static; convolutions map onto XLA convs (MXU).
"""

from __future__ import annotations

import functools
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rgb_to_gray(image: jax.Array) -> jax.Array:
    """BT.601 luma, matching cv::cvtColor RGB2GRAY. Accepts (H,W,3) u8/float,
    returns (H,W) float32 in the input's value range."""
    img = image.astype(jnp.float32)
    if img.ndim == 2:
        return img
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def _gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    # Same formula as cv::getGaussianKernel.
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    xs = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(xs**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(image: jax.Array, ksize: int = 7, sigma: float = 2.0) -> jax.Array:
    """Separable Gaussian blur with replicate borders.

    cv::GaussianBlur(7x7, sigma=2) is what cv::ORB applies before rBRIEF
    sampling; border mode there is BORDER_REFLECT_101, we use replicate —
    the difference only touches a 3px frame that the keypoint edge margin
    excludes anyway.
    """
    k = _gaussian_kernel1d(ksize, sigma)
    pad = ksize // 2
    h, w = image.shape
    x = image.astype(jnp.float32)
    # Shifted multiply-adds instead of lax.conv: XLA's small spatial convs on
    # TPU cost several ms in layout shuffling, while 2*ksize fused VPU passes
    # are ~10x cheaper — and f32-exact, matching the CPU oracle.
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="edge")
    x = sum(float(k[i]) * jax.lax.dynamic_slice(xp, (0, i), (h, w))
            for i in range(ksize))
    xp = jnp.pad(x, ((pad, pad), (0, 0)), mode="edge")
    x = sum(float(k[i]) * jax.lax.dynamic_slice(xp, (i, 0), (h, w))
            for i in range(ksize))
    return x


def resize_bilinear(image: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear resize (cv::resize INTER_LINEAR analog, half-pixel centers)."""
    return jax.image.resize(image.astype(jnp.float32), out_hw, method="linear")


def resize_nearest(image: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Nearest-neighbor resize (CV_INTER_NN), used for depth so that
    discontinuities do not blend into bogus depth (Trainer.cpp:79)."""
    return jax.image.resize(image, out_hw, method="nearest")


@functools.lru_cache(maxsize=None)
def pyramid_shapes(height: int, width: int, n_levels: int,
                   scale_factor: float) -> Tuple[Tuple[int, int], ...]:
    """Static per-level image shapes: level l is (H,W)/scale^l, rounded, as in
    cv::ORB's pyramid. Computed at trace time, so every level is static."""
    shapes: List[Tuple[int, int]] = []
    for level in range(n_levels):
        s = scale_factor**level
        shapes.append((max(8, int(round(height / s))),
                       max(8, int(round(width / s)))))
    return tuple(shapes)


def build_pyramid(gray: jax.Array, n_levels: int,
                  scale_factor: float) -> List[jax.Array]:
    """Image pyramid; each level resized from level 0 (slightly sharper than
    OpenCV's chained resize, self-consistent between train and detect)."""
    h, w = gray.shape
    shapes = pyramid_shapes(h, w, n_levels, scale_factor)
    levels = [gray.astype(jnp.float32)]
    for hw in shapes[1:]:
        levels.append(resize_bilinear(gray, hw))
    return levels
