"""Fused Pallas Hamming top-k kernel vs the reference XLA matcher."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tod_tpu.ops.matching import hamming_topk
from tod_tpu.ops.pallas.hamming import (
    DB_CHUNK,
    Q_TILE,
    hamming_topk_fused,
    pack_db_bits,
    pad_queries,
)


def test_fused_matches_reference(rng):
    q = rng.integers(0, 256, (Q_TILE, 32), dtype=np.uint8)
    db = rng.integers(0, 256, (2 * DB_CHUNK, 32), dtype=np.uint8)
    n_valid = len(db) - 100
    bits_t, pop = pack_db_bits(jnp.asarray(db))
    d_f, i_f = hamming_topk_fused(jnp.asarray(q), bits_t, pop, n_valid, k=5)
    d_r, i_r = hamming_topk(jnp.asarray(q), jnp.asarray(db), n_valid, k=5,
                            chunk=DB_CHUNK)
    np.testing.assert_array_equal(np.asarray(d_f), np.asarray(d_r))
    # index ties may differ only at equal distance; check realized distances
    qb = np.unpackbits(q, axis=1, bitorder="little")
    dbb = np.unpackbits(db, axis=1, bitorder="little")
    idx = np.asarray(i_f)
    for r in range(0, Q_TILE, 31):
        dd = (qb[r][None] != dbb[idx[r]]).sum(-1)
        np.testing.assert_array_equal(dd, np.asarray(d_f)[r].astype(int))


def test_fused_handles_few_valid_rows(rng):
    q = rng.integers(0, 256, (Q_TILE, 32), dtype=np.uint8)
    db = rng.integers(0, 256, (DB_CHUNK, 32), dtype=np.uint8)
    bits_t, pop = pack_db_bits(jnp.asarray(db))
    d, i = hamming_topk_fused(jnp.asarray(q), bits_t, pop, 3, k=5)
    i = np.asarray(i)
    assert (i[:, :3] < 3).all() and (i[:, :3] >= 0).all()
    assert (i[:, 3:] == -1).all()
    assert (np.asarray(d)[:, 3:] >= 1e8).all()


def test_pad_queries():
    q = np.zeros((Q_TILE + 5, 32), np.uint8)
    padded, n = pad_queries(q)
    assert n == Q_TILE + 5
    assert padded.shape[0] == 2 * Q_TILE


def test_fused_radius_semantics(rng):
    """radius-limited results == top-k results with > radius entries dropped
    (the reference's knn+truncate contract, DescriptorMatcher.cpp:211-220)."""
    q = rng.integers(0, 256, (Q_TILE, 32), dtype=np.uint8)
    db = rng.integers(0, 256, (2 * DB_CHUNK, 32), dtype=np.uint8)
    # plant close neighbors for some queries
    db[:100] = q[:100] ^ rng.integers(0, 2, (100, 32), dtype=np.uint8)
    bits_t, pop = pack_db_bits(jnp.asarray(db))
    n = len(db)
    d_all, i_all = hamming_topk_fused(jnp.asarray(q), bits_t, pop, n, k=5)
    d_rad, i_rad = hamming_topk_fused(jnp.asarray(q), bits_t, pop, n, k=5,
                                      radius=35)
    d_all, i_all = np.asarray(d_all), np.asarray(i_all)
    d_rad, i_rad = np.asarray(d_rad), np.asarray(i_rad)
    for r in range(Q_TILE):
        keep = d_all[r] <= 35
        np.testing.assert_array_equal(d_rad[r][: keep.sum()], d_all[r][keep])
        np.testing.assert_array_equal(i_rad[r][: keep.sum()], i_all[r][keep])
        assert (i_rad[r][keep.sum():] == -1).all()
        assert (d_rad[r][keep.sum():] >= 1e8).all()


def test_fused_kernel_compiled_on_tpu_exact(rng):
    """Hardware-gated: the MOSAIC-COMPILED fused kernel (not the interpreter)
    must match the XLA streaming matcher exactly on the real TPU. Run with
    TOD_TPU_TESTS=1 (serially — the TPU tunnel is single-client); skipped on
    CPU where only the interpreter runs."""
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("needs real TPU (TOD_TPU_TESTS=1)")
    from tod_tpu.ops.matching import hamming_topk, pad_db
    from tod_tpu.ops.pallas.hamming import (hamming_topk_fused, pack_db_bits,
                                            pad_queries)

    q = rng.integers(0, 256, (1024, 32), dtype=np.uint8)
    db_raw = rng.integers(0, 256, (3 * 2048, 32), dtype=np.uint8)
    # plant near matches so the radius path is exercised
    db_raw[100:1124] = q ^ (rng.integers(0, 2, (1024, 32)).astype(np.uint8))
    db, n_valid = pad_db(db_raw, 2048)
    n_valid -= 17
    bits_t, pop = pack_db_bits(jnp.asarray(db), jnp.int8)
    qp, qn = pad_queries(q)
    for radius in (None, 35.0):
        d_f, i_f = hamming_topk_fused(jnp.asarray(qp), bits_t, pop, n_valid,
                                      k=5, radius=radius, db_chunk=2048)
        d_x, i_x = hamming_topk(jnp.asarray(q), jnp.asarray(db), n_valid,
                                k=5, chunk=2048)
        d_f = np.asarray(d_f)[:qn]
        i_f = np.asarray(i_f)[:qn]
        if radius is not None:
            keep = np.asarray(d_x) <= radius
            d_x = np.where(keep, np.asarray(d_x), 1e9)
            i_x = np.where(keep, np.asarray(i_x), -1)
        np.testing.assert_array_equal(d_f, np.asarray(d_x))
        np.testing.assert_array_equal(i_f, np.asarray(i_x))
