"""One-round-trip device->host fetch (utils/transfer.py): exact round trip
for every dtype the hot paths ship (f32 poses, i32 inlier counts / match
rows, bool accept masks, u8 descriptors), including bitcast-hostile values
(negative ints, full-range int32 — values a float32 CONVERSION would
corrupt; the transport bitcasts instead)."""

import jax.numpy as jnp
import numpy as np

from tod_tpu.utils.transfer import fetch_arrays


def test_fetch_arrays_exact_round_trip():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(7, 3, 3)).astype(np.float32)
    i = np.asarray([[0, 1, -1], [2**30, -(2**30), 16777217]], np.int32)
    b = rng.random(13) > 0.5
    u = rng.integers(0, 256, (5, 32), np.uint8)
    out = fetch_arrays(jnp.asarray(f), jnp.asarray(i), jnp.asarray(b),
                       jnp.asarray(u))
    np.testing.assert_array_equal(out[0], f)
    assert out[0].dtype == np.float32
    np.testing.assert_array_equal(out[1], i)   # 16777217 breaks f32 convert
    assert out[1].dtype == np.int32
    np.testing.assert_array_equal(out[2], b)
    assert out[2].dtype == np.bool_
    np.testing.assert_array_equal(out[3], u)
    assert out[3].dtype == np.uint8


def test_fetch_arrays_nan_and_special_floats():
    f = np.asarray([np.nan, np.inf, -np.inf, -0.0, 1e-40], np.float32)
    (out,) = fetch_arrays(jnp.asarray(f))
    np.testing.assert_array_equal(np.isnan(out), np.isnan(f))
    np.testing.assert_array_equal(out[~np.isnan(f)], f[~np.isnan(f)])


def test_fetch_arrays_empty_and_none():
    assert fetch_arrays() == []
    (out,) = fetch_arrays(jnp.zeros((0, 3), jnp.float32))
    assert out.shape == (0, 3)
