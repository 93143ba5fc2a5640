"""Fused Hamming radius-k-NN Pallas kernel.

The XLA-composed matcher (ops.matching.hamming_topk) is HBM-bound: each
(Q x chunk) distance tile round-trips through HBM between the matmul and the
top-k (~10+ GB per frame at production sizes). This kernel fuses everything:
each grid step computes one (q_tile x db_chunk) distance tile on the MXU
straight into VMEM, reduces it to per-query top-k candidates in VMEM, and
carries a running top-k in scratch across the db-chunk grid axis — only the
final (Q x k) results ever reach HBM.

The kernel natively implements the reference's *intended* search semantics —
epsilon-NN with a k cap (src/detection/DescriptorMatcher.cpp:209-220: "perform
radius search; as this does not work for LSH we knnMatch then truncate") —
exactly: results are the <= k nearest DB rows within ``radius``. The radius
doubles as the performance lever: a (tile, chunk) pair with no within-radius
hit skips the top-k extraction entirely after one row-min pass, leaving the
kernel at its matmul floor for the overwhelmingly common no-hit case. Pass
``radius=None`` for unconstrained exact top-k.

Distances are packed with their column index into one int32 sort key
  key = dist << COL_SHIFT | col        (dist <= 256 -> 9 bits)
so a single min-reduction yields both value and position; k rounds of
(min, mask) extract the exact top-k. Selection is gather-free (one-hot sums)
because Mosaic dislikes per-row gathers.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tod_tpu.ops.matching import popcount_rows, unpack_bits

Q_TILE = 512            # default query-tile rows (tunable per call)
DB_CHUNK = 8192         # default db-chunk cols (tunable per call)
COL_SHIFT = 13          # 2^13 = 8192 >= any supported db_chunk
VMEM_LIMIT = 100 * 1024 * 1024  # v5e exposes far more than the 16MB default
KEY_INVALID = 2**30     # python int: jnp constants would be captured tracers


def _extract_topk(keys: jax.Array, k: int) -> jax.Array:
    """Exact top-k smallest int32 keys per row of (T, C): k rounds of
    (row-min, mask-out). Returns (T, k) keys, ascending. Duplicate keys are
    impossible by construction (every key embeds its unique position)."""
    out = []
    cur = keys
    for _ in range(k):
        m = cur.min(axis=1, keepdims=True)        # (T, 1)
        out.append(m[:, 0])
        cur = jnp.where(cur == m, KEY_INVALID, cur)
    return jnp.stack(out, axis=1)                  # (T, k)


def _select_by_pos(values: jax.Array, pos: jax.Array) -> jax.Array:
    """Gather-free values[r, pos[r, t]]: one-hot reduction.
    ``values``: (T, C); ``pos``: (T, K) -> (T, K)."""
    c = values.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)     # (1, C)
    onehot = (pos[:, :, None] == col[:, None, :])            # (T, K, C)
    return (values[:, None, :] * onehot).sum(axis=2)


def _hamming_topk_kernel(q_ref, dbt_ref, qpop_ref, dbpop_ref, nvalid_ref,
                         out_d_ref, out_i_ref, best_ref, *, k: int,
                         n_chunks: int, q_tile: int, db_chunk: int,
                         radius: int):
    # Grid is (q-tiles MAJOR, chunks MINOR): the running top-k scratch for the
    # current q-tile carries across its chunk sweep and the output block stays
    # put until the final write.
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_ref[:, :k] = jnp.full((q_tile, k), KEY_INVALID, jnp.int32)
        best_ref[:, k:] = jnp.full((q_tile, k), -1, jnp.int32)

    if q_ref.dtype == jnp.int8:
        dot = jnp.dot(q_ref[:], dbt_ref[:],
                      preferred_element_type=jnp.int32)
        dist_i = qpop_ref[:] + dbpop_ref[:] - 2 * dot        # (q_tile, chunk)
    else:
        # bf16 is exact for 0/1 values with f32 accumulation
        dot = jnp.dot(q_ref[:], dbt_ref[:],
                      preferred_element_type=jnp.float32)
        dist_i = (qpop_ref[:] + dbpop_ref[:] - 2.0 * dot).astype(jnp.int32)

    col = jax.lax.broadcasted_iota(jnp.int32, dist_i.shape, 1)
    base = j * db_chunk
    hit = (dist_i <= radius) & ((base + col) < nvalid_ref[0, 0])
    keys = jnp.where(hit, (dist_i << COL_SHIFT) | col, KEY_INVALID)

    # One cheap pass decides whether this (tile, chunk) pair has any
    # within-radius hit; if not, the k-round extraction is skipped and the
    # step runs at the matmul + row-min floor. No scratch is read to form the
    # predicate, so it adds no loop-carried dependency.
    any_hit = keys.min() < KEY_INVALID

    @pl.when(any_hit)
    def _extract_and_merge():
        chunk_top = _extract_topk(keys, k)                   # (q_tile, k)
        invalid_top = chunk_top >= KEY_INVALID
        chunk_d = chunk_top >> COL_SHIFT
        chunk_i = jnp.where(invalid_top, -1,
                            (chunk_top & ((1 << COL_SHIFT) - 1)) + base)
        chunk_d = jnp.where(invalid_top, KEY_INVALID, chunk_d)

        # merge running best (first k cols) with this chunk's top-k: re-key
        # by (dist, merge position); the carry sits first so earlier chunks
        # win distance ties (deterministic lowest-index-first).
        merged_d = jnp.concatenate([best_ref[:, :k], chunk_d], axis=1)
        merged_i = jnp.concatenate([best_ref[:, k:], chunk_i], axis=1)
        pos = jax.lax.broadcasted_iota(jnp.int32, merged_d.shape, 1)
        merge_keys = jnp.where(merged_d >= KEY_INVALID, KEY_INVALID,
                               (merged_d << 5) | pos)
        top = _extract_topk(merge_keys, k)                    # (T, k)
        bad = top >= KEY_INVALID
        sel = top & 31
        new_d = _select_by_pos(merged_d, sel)
        new_i = _select_by_pos(merged_i, sel)
        best_ref[:, :k] = jnp.where(bad, KEY_INVALID, new_d)
        best_ref[:, k:] = jnp.where(bad, -1, new_i)

    @pl.when(j == n_chunks - 1)
    def _emit():
        d = best_ref[:, :k]
        out_d_ref[:] = jnp.where(d >= KEY_INVALID, jnp.float32(1e9),
                                 d.astype(jnp.float32))
        out_i_ref[:] = best_ref[:, k:]


def hamming_topk_fused(query_u8: jax.Array, db_bits_t: jax.Array,
                       db_pop: jax.Array, n_db_valid, k: int = 5,
                       radius: Optional[float] = None,
                       q_tile: int = Q_TILE,
                       db_chunk: int = DB_CHUNK) -> Tuple[jax.Array, jax.Array]:
    """Exact epsilon-k-NN by Hamming distance in one fused Pallas kernel.

    ``query_u8``: (Q, 32) uint8, Q a multiple of ``q_tile`` (pad with zeros);
    ``db_bits_t``: (256, N) int8/bf16 pre-unpacked TRANSPOSED db bits (see
    ``pack_db_bits``), N a multiple of ``db_chunk``; ``db_pop``: (1, N).
    ``radius``: keep only matches with dist <= radius (None = all = plain
    top-k; tighter radii run faster). Returns ``(dist (Q,k) f32 ascending
    (1e9 for missing), idx (Q,k) i32, -1 for missing)``.
    """
    q = query_u8.shape[0]
    n = db_bits_t.shape[1]
    if n % db_chunk and n % 2048 == 0:
        db_chunk = 2048  # small DBs: fall back to the finer chunk
    if q % q_tile or n % db_chunk:
        raise ValueError(f"Q ({q}) must divide {q_tile}, N ({n}) {db_chunk}")
    if k > 8:
        raise ValueError("k <= 8 (merge key packs position in 5 bits)")
    if db_chunk > (1 << COL_SHIFT):
        raise ValueError(f"db_chunk > {1 << COL_SHIFT} breaks key packing")
    n_chunks = n // db_chunk
    radius_i = 256 if radius is None else int(radius)

    dtype = db_bits_t.dtype
    q_bits = unpack_bits(query_u8, dtype)                    # (Q, 256)
    if dtype == jnp.int8:
        q_pop = popcount_rows(query_u8).astype(jnp.int32)[:, None]
        db_pop = db_pop.astype(jnp.int32)
    else:
        q_pop = popcount_rows(query_u8)[:, None]
    n_valid = jnp.asarray(n_db_valid, jnp.int32).reshape(1, 1)

    kernel = functools.partial(_hamming_topk_kernel, k=k, n_chunks=n_chunks,
                               q_tile=q_tile, db_chunk=db_chunk,
                               radius=radius_i)
    grid = (q // q_tile, n_chunks)
    interpret = jax.default_backend() == "cpu"  # tests run interpreted
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((q_tile, 256), lambda i, j: (i, 0)),
            pl.BlockSpec((256, db_chunk), lambda i, j: (0, j)),
            pl.BlockSpec((q_tile, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, db_chunk), lambda i, j: (0, j)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_tile, k), lambda i, j: (i, 0)),
            pl.BlockSpec((q_tile, k), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, k), jnp.float32),
            jax.ShapeDtypeStruct((q, k), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((q_tile, 2 * k), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(q_bits, db_bits_t, q_pop, db_pop, n_valid)
    return out_d, out_i


def pack_db_bits(db_u8: jax.Array, dtype=jnp.bfloat16
                 ) -> Tuple[jax.Array, jax.Array]:
    """Precompute the kernel's DB operands once at index-build time:
    (256, N) transposed unpacked bits (bf16 or int8) + (1, N) popcounts."""
    bits = unpack_bits(db_u8, dtype).T
    pop = popcount_rows(db_u8)[None, :]
    if dtype == jnp.int8:
        pop = pop.astype(jnp.int32)
    return bits, pop


def pad_queries(query_u8: np.ndarray,
                q_tile: int = Q_TILE) -> Tuple[np.ndarray, int]:
    qn = query_u8.shape[0]
    pad = (-qn) % q_tile
    if pad:
        query_u8 = np.concatenate(
            [query_u8, np.zeros((pad, 32), query_u8.dtype)])
    return query_u8, qn
