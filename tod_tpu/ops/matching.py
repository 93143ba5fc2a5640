"""Descriptor matching on the MXU.

TPU-native replacement for the reference's FLANN-LSH kNN matcher
(src/detection/DescriptorMatcher.cpp:175-187, 195-252). LSH is an
approximation designed for CPUs; on TPU the *exact* brute-force Hamming
distance is one batched matmul:

    popcount(a XOR b) = popcount(a) + popcount(b) - 2 * <bits(a), bits(b)>

so a (Q x 256 bits) x (256 x N bits) matmul in bf16 (exact for 0/1 values with
f32 accumulation) gives all distances; a streaming scan over DB chunks keeps
the running top-k so the Q x N distance matrix never materializes. This
preserves the reference's *filtering contract* — knnMatch(k=5) then truncate
at the first match beyond ``radius`` (DescriptorMatcher.cpp:211-220) — on
exact distances (strictly better recall than LSH; SURVEY.md section 7).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# plain python float: module-level jnp constants would force backend init at
# import time (and the TPU tunnel backend dislikes that)
BIG_DIST = 1e9


def unpack_bits(desc_u8: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """(N, B) uint8 -> (N, 8*B) 0/1 values, LSB-first per byte (the cv::ORB /
    np.unpackbits(bitorder='little') convention)."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (desc_u8[:, :, None] >> shifts[None, None, :]) & jnp.uint8(1)
    return bits.reshape(desc_u8.shape[0], -1).astype(dtype)


def popcount_rows(desc_u8: jax.Array) -> jax.Array:
    """(N, B) uint8 -> (N,) float32 popcounts."""
    return unpack_bits(desc_u8, jnp.float32).sum(axis=1)


class Matches(NamedTuple):
    """Top-k matches per query descriptor (padded, masked)."""

    dist: jax.Array   # (Q, k) float32 — Hamming (or squared-L2) distance
    idx: jax.Array    # (Q, k) int32 — global DB row
    valid: jax.Array  # (Q, k) bool — within-radius + real row + valid query


def _merge_topk(best_d, best_i, new_d, new_i, k):
    d = jnp.concatenate([best_d, new_d], axis=1)
    i = jnp.concatenate([best_i, new_i], axis=1)
    nd, pos = jax.lax.top_k(-d, k)
    return -nd, jnp.take_along_axis(i, pos, axis=1)


def hamming_topk(query_u8: jax.Array, db_u8: jax.Array, n_db_valid,
                 k: int = 5, chunk: int = 16384,
                 vary: Tuple[str, ...] = ()) -> Tuple[jax.Array, jax.Array]:
    """Exact k-NN by Hamming distance.

    ``query_u8``: (Q, 32) uint8; ``db_u8``: (N, 32) uint8 with N a multiple of
    ``chunk`` (pad with zeros and pass the true count as ``n_db_valid``).
    Returns ``(dist (Q,k) float32, idx (Q,k) int32)`` sorted ascending.

    ``vary``: mesh axis names this call varies over when used inside
    ``shard_map`` — the scan's constant carry init must be marked varying
    (``jax.lax.pvary``) or the varying-across-mesh type check rejects it.
    """
    q_bits = unpack_bits(query_u8)                    # (Q, 256) bf16
    q_pop = popcount_rows(query_u8)[:, None]          # (Q, 1)
    n = db_u8.shape[0]
    if n % chunk != 0:
        raise ValueError(f"db rows {n} not a multiple of chunk {chunk}")
    n_chunks = n // chunk
    db_chunks = db_u8.reshape(n_chunks, chunk, -1)
    n_db_valid = jnp.asarray(n_db_valid, jnp.int32)

    q = query_u8.shape[0]
    init = (jnp.full((q, k), BIG_DIST), jnp.full((q, k), -1, jnp.int32))
    if vary:
        init = jax.tree.map(lambda x: jax.lax.pvary(x, vary), init)

    def body(carry, inp):
        c_idx, db_c = inp
        best_d, best_i = carry
        db_bits = unpack_bits(db_c)                   # (chunk, 256) bf16
        db_pop = popcount_rows(db_c)[None, :]         # (1, chunk)
        dot = jnp.dot(q_bits, db_bits.T,
                      preferred_element_type=jnp.float32)  # exact: ints <= 256
        dist = q_pop + db_pop - 2.0 * dot             # (Q, chunk)
        gidx = c_idx * chunk + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        dist = jnp.where(gidx < n_db_valid, dist, BIG_DIST)
        nd, pos = jax.lax.top_k(-dist, k)
        ni = jnp.take_along_axis(
            jnp.broadcast_to(gidx, dist.shape), pos, axis=1)
        return _merge_topk(best_d, best_i, -nd, ni, k), None

    (best_d, best_i), _ = jax.lax.scan(
        body, init, (jnp.arange(n_chunks, dtype=jnp.int32), db_chunks))
    return best_d, best_i


def l2_topk(query: jax.Array, db: jax.Array, n_db_valid, k: int = 5,
            chunk: int = 4096,
            vary: Tuple[str, ...] = ()) -> Tuple[jax.Array, jax.Array]:
    """Exact k-NN by squared L2 distance for float descriptors (the SIFT path
    implied by the reference's ``type: SIFT`` option, doc/source/index.rst:45).
    Same streaming-top-k contract as :func:`hamming_topk`."""
    n = db.shape[0]
    if n % chunk != 0:
        raise ValueError(f"db rows {n} not a multiple of chunk {chunk}")
    n_chunks = n // chunk
    db_chunks = db.reshape(n_chunks, chunk, -1).astype(jnp.float32)
    q32 = query.astype(jnp.float32)
    q_sq = (q32 * q32).sum(axis=1, keepdims=True)
    n_db_valid = jnp.asarray(n_db_valid, jnp.int32)

    qn = query.shape[0]
    init = (jnp.full((qn, k), BIG_DIST), jnp.full((qn, k), -1, jnp.int32))
    if vary:
        init = jax.tree.map(lambda x: jax.lax.pvary(x, vary), init)

    def body(carry, inp):
        c_idx, db_c = inp
        best_d, best_i = carry
        d_sq = (db_c * db_c).sum(axis=1)[None, :]
        dot = jnp.dot(q32, db_c.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        dist = jnp.maximum(q_sq + d_sq - 2.0 * dot, 0.0)
        gidx = c_idx * chunk + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        dist = jnp.where(gidx < n_db_valid, dist, BIG_DIST)
        nd, pos = jax.lax.top_k(-dist, k)
        ni = jnp.take_along_axis(
            jnp.broadcast_to(gidx, dist.shape), pos, axis=1)
        return _merge_topk(best_d, best_i, -nd, ni, k), None

    (best_d, best_i), _ = jax.lax.scan(
        body, init, (jnp.arange(n_chunks, dtype=jnp.int32), db_chunks))
    return best_d, best_i


def radius_truncate(dist: jax.Array, idx: jax.Array, radius: float,
                    query_valid: jax.Array) -> Matches:
    """The reference's radius cut: keep matches up to (not including) the first
    one whose distance exceeds ``radius`` (DescriptorMatcher.cpp:211-220).
    Distances are sorted ascending, so that equals dist <= radius."""
    within = dist <= radius
    valid = within & (idx >= 0) & query_valid[:, None]
    return Matches(dist=dist, idx=idx, valid=valid)


def pad_db(desc_u8: np.ndarray, chunk: int) -> Tuple[np.ndarray, int]:
    """Pad a DB descriptor matrix up to a chunk multiple; returns (padded, n)."""
    n = desc_u8.shape[0]
    n_pad = (-n) % chunk
    if n_pad:
        desc_u8 = np.concatenate(
            [desc_u8, np.zeros((n_pad,) + desc_u8.shape[1:], desc_u8.dtype)])
    return desc_u8, n
