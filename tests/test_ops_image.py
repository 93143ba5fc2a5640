"""Golden tests: image/depth/morphology ops vs OpenCV + numpy oracles."""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from tod_tpu.ops.image import (
    build_pyramid,
    gaussian_blur,
    pyramid_shapes,
    resize_bilinear,
    rgb_to_gray,
)
from tod_tpu.ops.depth import (
    depth_to_3d,
    depth_to_3d_sparse,
    rescale_depth,
    to_metric_depth,
)
from tod_tpu.ops.morphology import erode, validate_keypoints


def test_rgb_to_gray_matches_opencv(rng):
    img = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
    ours = np.asarray(rgb_to_gray(jnp.asarray(img)))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).astype(np.float32)
    assert np.abs(ours - ref).max() <= 0.51  # opencv rounds to u8


def test_gaussian_blur_matches_opencv(rng):
    img = rng.normal(size=(48, 56)).astype(np.float32) * 50 + 100
    ours = np.asarray(gaussian_blur(jnp.asarray(img), 7, 2.0))
    ref = cv2.GaussianBlur(img, (7, 7), 2.0, borderType=cv2.BORDER_REPLICATE)
    assert np.abs(ours - ref).max() < 1e-3


def test_pyramid_shapes():
    shapes = pyramid_shapes(480, 640, 3, 1.2)
    assert shapes[0] == (480, 640)
    assert shapes[1] == (400, 533)
    assert shapes[2] == (333, 444)


def test_resize_bilinear_close_to_opencv(rng):
    # jax.image.resize antialiases on downsample (deliberate deviation from
    # OpenCV's aliasing INTER_LINEAR); on smooth images they agree closely.
    yy, xx = np.mgrid[0:48, 0:64].astype(np.float32)
    img = np.sin(xx / 9.0) * np.cos(yy / 7.0) * 50 + 100
    ours = np.asarray(resize_bilinear(jnp.asarray(img), (40, 53)))
    ref = cv2.resize(img, (53, 40), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours[2:-2, 2:-2] - ref[2:-2, 2:-2]).mean() < 0.5


def test_build_pyramid_static_shapes(rng):
    img = rng.normal(size=(480, 640)).astype(np.float32)
    levels = build_pyramid(jnp.asarray(img), 3, 1.2)
    assert [lvl.shape for lvl in levels] == [(480, 640), (400, 533), (333, 444)]


def test_to_metric_depth_u16():
    d = np.array([[0, 500, 65535], [1000, 2000, 3]], np.uint16)
    out = np.asarray(to_metric_depth(jnp.asarray(d)))
    assert np.isnan(out[0, 0]) and np.isnan(out[0, 2])
    assert np.isclose(out[1, 0], 1.0) and np.isclose(out[0, 1], 0.5)


def test_rescale_depth_same_size():
    d = np.full((48, 64), 1.5, np.float32)
    out = np.asarray(rescale_depth(jnp.asarray(d), (48, 64)))
    np.testing.assert_allclose(out, d)


def test_rescale_depth_upscale_with_nan_fill():
    # depth 24x32 -> image 60x64: factor 2, subregion rows [0,48), rest NaN
    d = (np.arange(24 * 32).reshape(24, 32) % 900 + 100).astype(np.uint16)
    out = np.asarray(rescale_depth(jnp.asarray(d), (60, 64)))
    assert out.shape == (60, 64)
    assert np.isfinite(out[:48]).all()
    assert np.isnan(out[48:]).all()
    # NN semantics: values come from the original grid, scaled to meters
    # (tolerance: XLA compiles /1000 as multiply-by-reciprocal, 1 ulp off)
    expect = np.unique(d.astype(np.float32) / np.float32(1000.0))
    got = np.unique(out[:48])
    assert np.isclose(got[:, None], expect[None, :], atol=1e-6).any(1).all()


def test_depth_to_3d_sparse_pinhole():
    K = np.array([[525.0, 0, 32], [0, 525.0, 24], [0, 0, 1]], np.float32)
    depth = np.full((48, 64), 2.0, np.float32)
    xy = np.array([[32, 24], [42, 24], [32, 34]], np.float32)
    pts = np.asarray(depth_to_3d_sparse(jnp.asarray(depth), jnp.asarray(K),
                                        jnp.asarray(xy)))
    np.testing.assert_allclose(pts[0], [0, 0, 2.0], atol=1e-6)
    np.testing.assert_allclose(pts[1], [2.0 * 10 / 525, 0, 2.0], atol=1e-6)
    np.testing.assert_allclose(pts[2], [0, 2.0 * 10 / 525, 2.0], atol=1e-6)


def test_depth_to_3d_dense_matches_sparse():
    K = np.array([[500.0, 0, 31.5], [0, 500.0, 23.5], [0, 0, 1]], np.float32)
    rng = np.random.default_rng(2)
    depth = rng.uniform(0.5, 3.0, (48, 64)).astype(np.float32)
    cloud = np.asarray(depth_to_3d(jnp.asarray(depth), jnp.asarray(K)))
    xy = np.array([[5, 7], [63, 47], [0, 0]], np.float32)
    sparse = np.asarray(depth_to_3d_sparse(jnp.asarray(depth), jnp.asarray(K),
                                           jnp.asarray(xy)))
    for (x, y), p in zip(xy.astype(int), sparse):
        np.testing.assert_allclose(cloud[y, x], p, rtol=1e-6)


def test_erode_matches_opencv(rng):
    mask = (rng.random((64, 64)) > 0.3).astype(np.uint8) * 255
    ours = np.asarray(erode(jnp.asarray(mask), 4)).astype(np.uint8) * 255
    ref = cv2.erode(mask, np.ones((3, 3), np.uint8), iterations=4)
    np.testing.assert_array_equal(ours, ref)


def _numpy_validate(xy, mask_eroded, depth, window=2):
    """Scalar oracle following training.cpp:75-132."""
    h, w = mask_eroded.shape
    out = []
    for px, py in xy:
        x = min(max(int(round(px)), 0), w - 1)
        y = min(max(int(round(py)), 0), h - 1)
        good = bool(mask_eroded[y, x])
        if not good:
            best = None
            for i in range(max(x - window, 0), min(x + window, w - 1) + 1):
                for j in range(max(y - window, 0), min(y + window, h - 1) + 1):
                    if mask_eroded[j, i]:
                        d = (i - px) ** 2 + (j - py) ** 2
                        if best is None or d < best[0]:
                            best = (d, i, j)
            if best is not None:
                _, x, y = best
                good = True
        if good and np.isfinite(depth[y, x]):
            out.append((x, y, depth[y, x], True))
        else:
            out.append((x, y, np.nan, False))
    return out


def test_validate_keypoints_matches_oracle(rng):
    h, w = 48, 64
    mask = np.zeros((h, w), np.uint8)
    mask[10:40, 15:50] = 1
    depth = rng.uniform(0.5, 2.0, (h, w)).astype(np.float32)
    depth[20:25, 20:25] = np.nan  # invalid depth pocket

    eroded = np.asarray(erode(jnp.asarray(mask), 4))
    xy = rng.uniform(0, [w - 1, h - 1], (200, 2)).astype(np.float32)
    res = validate_keypoints(jnp.asarray(xy), jnp.ones(200, bool),
                             jnp.asarray(mask), jnp.asarray(depth))
    oracle = _numpy_validate(xy, eroded, depth)

    got_xy = np.asarray(res.xy)
    got_valid = np.asarray(res.valid)
    for k, (ox, oy, oz, ovalid) in enumerate(oracle):
        assert got_valid[k] == ovalid, k
        if ovalid:
            # ties in the window argmin may differ only in equal-distance picks
            d_got = (got_xy[k, 0] - xy[k, 0]) ** 2 + (got_xy[k, 1] - xy[k, 1]) ** 2
            d_ora = (ox - xy[k, 0]) ** 2 + (oy - xy[k, 1]) ** 2
            assert np.isclose(d_got, d_ora), k
