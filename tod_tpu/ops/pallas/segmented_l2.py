"""Object-segmented per-(query, object) nearest-neighbor kernel, L2/SIFT.

The float-descriptor counterpart of ops/pallas/segmented.py — the serving
matcher for the SIFT/L2 path (the reference's detection.ros.ork pipeline
runs SIFT through the same DescriptorMatcher cell contract,
src/detection/DescriptorMatcher.cpp:195-252; tod_tpu additionally serves
it through the segmented two-tier pipeline).

Exactness strategy: SIFT descriptors are unit-normalized floats; both
sides are quantized to int8 with ``round(d * 256) clipped to [0, 127]``
(cv2 stores SIFT as ``saturate_cast<uchar>(d * 512)`` — same idea, one bit
narrower so the MXU's int8 path applies). Squared L2 then decomposes as
``|q|^2 + |r|^2 - 2 q.r`` in EXACT int32 arithmetic: the Mosaic kernel's
int8 matmul and the XLA reference's f32 matmul (integers < 2^24, exact)
produce identical distances, so the fused-vs-XLA parity gate is bitwise,
like the Hamming kernel's.

Unlike the Hamming kernel's single packed key (dist << 18 | row), scaled
squared distances need ~18 bits, so the running per-(query, object) best
lives in TWO VMEM scratches (distance + row-within-object); ties keep the
lowest row in chunk order — the same tie rule as the packed key.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tod_tpu.ops.pallas.segmented import (ROW_BITS, VMEM_LIMIT,
                                          max_chunks_per_object)

DB_CHUNK = 4096
Q_TILE = 1024
QUANT_SCALE = 256.0     # descriptor quantization: round(d * 256) in [0, 127]
DIST_INVALID = 0x7FFFFFFF
PAD_NORM = 1 << 28      # padding-row |r|^2: beyond any real distance


def quantize_descriptors(desc: jax.Array) -> jax.Array:
    """Unit-norm float descriptors -> int8 (round(d * 256), clip [0, 127])."""
    return jnp.clip(jnp.round(desc * QUANT_SCALE), 0, 127).astype(jnp.int8)


class SegmentedDbF(NamedTuple):
    """Object-contiguous packed float-descriptor DB (chunk-aligned segments).

    Same layout contract as SegmentedDb (ops/pallas/segmented.py): rows of
    object ``o`` occupy [obj_start[o], obj_start[o] + n_rows[o]), obj_start
    is a multiple of the chunk size, chunk_obj/chunk_base are the
    scalar-prefetch chunk->object map. Pytree of device arrays."""

    vecs_t: jax.Array      # (128, N_pad) int8 quantized descriptors, transposed
    norm_sq: jax.Array     # (1, N_pad) int32 |r|^2 (PAD_NORM on padding)
    points: jax.Array      # (N_pad, 3) f32 model points (0 on padding)
    obj_start: jax.Array   # (O,) int32 first global row of each object
    n_rows: jax.Array      # (O,) int32 real row count of each object
    spans: jax.Array       # (O,) f32 model AABB diagonals
    chunk_obj: jax.Array   # (n_chunks,) int32 object of each chunk
    chunk_base: jax.Array  # (n_chunks,) int32 first row-within-object


def pack_segmented_l2(models: Sequence, db_chunk: int = DB_CHUNK,
                      reserve_rows: int = 0) -> SegmentedDbF:
    """Pack float-descriptor TodModels into the segmented layout.
    ``reserve_rows``: uniform per-object row reservation (poisoned padding)
    so re-packs after catalog updates keep the same array shapes — see
    pack_segmented."""
    vecs, pts, starts, nrows, spans = [], [], [], [], []
    chunk_obj, chunk_base = [], []
    cursor = 0
    for o, m in enumerate(models):
        n = m.n_points
        if n > (1 << ROW_BITS):
            raise ValueError(
                f"object {o} has {n} rows > 2^{ROW_BITS}: row indices "
                "would alias — split the model or raise ROW_BITS")
        n_pad = -(-max(n, 1, reserve_rows) // db_chunk) * db_chunk
        d = np.zeros((n_pad, 128), np.float32)
        d[:n] = m.descriptors
        p = np.zeros((n_pad, 3), np.float32)
        p[:n] = m.points
        vecs.append(d)
        pts.append(p)
        starts.append(cursor)
        nrows.append(n)
        spans.append(m.span)
        for c in range(n_pad // db_chunk):
            chunk_obj.append(o)
            chunk_base.append(c * db_chunk)
        cursor += n_pad
    if not models:
        vecs = [np.zeros((db_chunk, 128), np.float32)]
        pts = [np.zeros((db_chunk, 3), np.float32)]
        chunk_obj, chunk_base = [0], [0]
    desc = np.concatenate(vecs)
    q8 = np.clip(np.round(desc * QUANT_SCALE), 0, 127).astype(np.int8)
    norm = (q8.astype(np.int32) ** 2).sum(axis=1)
    valid_row = np.zeros(len(desc), bool)
    for s, n in zip(starts, nrows):
        valid_row[s:s + n] = True
    norm = np.where(valid_row, norm, PAD_NORM)
    return SegmentedDbF(
        vecs_t=jnp.asarray(np.ascontiguousarray(q8.T)),
        norm_sq=jnp.asarray(norm[None, :].astype(np.int32)),
        points=jnp.asarray(np.concatenate(pts)),
        obj_start=jnp.asarray(np.asarray(starts, np.int32)),
        n_rows=jnp.asarray(np.asarray(nrows, np.int32)),
        spans=jnp.asarray(np.asarray(spans, np.float32)),
        chunk_obj=jnp.asarray(np.asarray(chunk_obj, np.int32)),
        chunk_base=jnp.asarray(np.asarray(chunk_base, np.int32)))


def _object_top1_l2_kernel(chunk_obj_ref, chunk_base_ref, q_ref, dbt_ref,
                           norm_ref, qnorm_ref, out_d_ref, out_i_ref,
                           best_d_ref, best_i_ref, *, n_chunks: int,
                           q_tile: int, o_pad: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_d_ref[:] = jnp.full((q_tile, o_pad), DIST_INVALID, jnp.int32)
        best_i_ref[:] = jnp.zeros((q_tile, o_pad), jnp.int32)

    dot = jnp.dot(q_ref[:], dbt_ref[:], preferred_element_type=jnp.int32)
    dist = qnorm_ref[:] + norm_ref[:] - 2 * dot        # (q_tile, db_chunk)
    dmin = dist.min(axis=1, keepdims=True)             # (q_tile, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    # earliest minimal row within the chunk (the packed-key tie rule)
    imin = jnp.where(dist == dmin, chunk_base_ref[j] + col,
                     DIST_INVALID).min(axis=1, keepdims=True)

    o = chunk_obj_ref[j]
    lane = jax.lax.broadcasted_iota(jnp.int32, (q_tile, o_pad), 1)
    # strict '<' keeps the earliest chunk on ties; chunks of one object are
    # visited in ascending chunk_base order, so ties resolve to lowest row
    take = (lane == o) & (dmin < best_d_ref[:])
    best_d_ref[:] = jnp.where(take, dmin, best_d_ref[:])
    best_i_ref[:] = jnp.where(take, imin, best_i_ref[:])

    @pl.when(j == n_chunks - 1)
    def _emit():
        out_d_ref[:] = best_d_ref[:]
        out_i_ref[:] = best_i_ref[:]


def db_chunk_of_f(db: SegmentedDbF) -> int:
    return db.vecs_t.shape[1] // max(db.chunk_obj.shape[0], 1)


def _to_l2(d_sq_int: jax.Array) -> jax.Array:
    """Scaled-int squared distance -> plain L2 in descriptor units (the
    convention the DescriptorMatcher L2 cell reports, cv::BFMatcher-style)."""
    return jnp.sqrt(jnp.maximum(d_sq_int, 0).astype(jnp.float32)
                    ) * (1.0 / QUANT_SCALE)


def object_top1_l2_fused(query_i8: jax.Array, db: SegmentedDbF,
                         q_tile: int = Q_TILE,
                         db_chunk: Optional[int] = None
                         ) -> Tuple[jax.Array, jax.Array]:
    """Per-(query, object) nearest row over int8-quantized descriptors.
    Returns ``(dist (Q, O) f32 plain L2, row (Q, O) i32 within-object)``.
    Q must be a multiple of 128; zero-row objects report huge distance."""
    q = query_i8.shape[0]
    n = db.vecs_t.shape[1]
    if db_chunk is None:
        db_chunk = db_chunk_of_f(db)
    if q % q_tile:
        q_tile = next((t for t in (512, 256, 128) if q % t == 0), None)
        if q_tile is None:
            raise ValueError(f"Q ({q}) must be a multiple of 128")
    if n % db_chunk:
        raise ValueError(f"N ({n}) % {db_chunk} != 0 (repack the DB)")
    n_chunks = n // db_chunk
    n_objects = int(db.obj_start.shape[0]) or 1
    o_pad = -(-n_objects // 128) * 128

    q_norm = (query_i8.astype(jnp.int32) ** 2).sum(axis=1)[:, None]

    kernel = functools.partial(
        _object_top1_l2_kernel, n_chunks=n_chunks, q_tile=q_tile,
        o_pad=o_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(q // q_tile, n_chunks),
        in_specs=[
            pl.BlockSpec((q_tile, 128), lambda i, j, *_: (i, 0)),
            pl.BlockSpec((128, db_chunk), lambda i, j, *_: (0, j)),
            pl.BlockSpec((1, db_chunk), lambda i, j, *_: (0, j)),
            pl.BlockSpec((q_tile, 1), lambda i, j, *_: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((q_tile, o_pad), lambda i, j, *_: (i, 0)),
            pl.BlockSpec((q_tile, o_pad), lambda i, j, *_: (i, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((q_tile, o_pad), jnp.int32),
                        pltpu.VMEM((q_tile, o_pad), jnp.int32)],
    )
    out_d, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q, o_pad), jnp.int32),
            jax.ShapeDtypeStruct((q, o_pad), jnp.int32),
        ],
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(db.chunk_obj, db.chunk_base, query_i8, db.vecs_t, db.norm_sq, q_norm)
    return _to_l2(out_d[:, :n_objects]), out_i[:, :n_objects]


def object_top1_l2_xla(query_i8: jax.Array, db: SegmentedDbF,
                       db_chunk: Optional[int] = None,
                       vary: Tuple[str, ...] = ()
                       ) -> Tuple[jax.Array, jax.Array]:
    """XLA reference for :func:`object_top1_l2_fused` — identical results.

    f32 matmuls over int8-valued operands are exact (integers < 2^24), so
    the distances match the kernel's int32 arithmetic bit-for-bit."""
    if db_chunk is None:
        db_chunk = db_chunk_of_f(db)
    qf = query_i8.astype(jnp.float32)
    q_norm = (query_i8.astype(jnp.int32) ** 2).sum(axis=1)[:, None]
    n = db.vecs_t.shape[1]
    n_chunks = n // db_chunk
    n_objects = int(db.obj_start.shape[0]) or 1
    qn = query_i8.shape[0]

    vecs_chunks = db.vecs_t.reshape(128, n_chunks, db_chunk)
    norm_chunks = db.norm_sq.reshape(n_chunks, db_chunk)

    init_d = jnp.full((qn, n_objects), DIST_INVALID, jnp.int32)
    init_i = jnp.zeros((qn, n_objects), jnp.int32)
    if vary:
        init_d = jax.lax.pvary(init_d, vary)
        init_i = jax.lax.pvary(init_i, vary)

    def body(carry, inp):
        best_d, best_i = carry
        vecs_c, norm_c, obj_c, base_c = inp
        # the matmul runs in f32 (exact: int8 operands, |dot| < 2^24) but the
        # norm terms are added in int32 — PAD_NORM (2^28) + a small integer
        # is not f32-representable, and f32 rounding there would diverge
        # from the kernel's int32 arithmetic on zero-row (padding) objects
        dot = jnp.dot(qf, vecs_c.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
        dist = q_norm + norm_c[None, :] - 2 * dot.astype(jnp.int32)
        dmin = dist.min(axis=1)
        col = jnp.arange(db_chunk, dtype=jnp.int32)[None, :]
        imin = jnp.where(dist == dmin[:, None], base_c + col,
                         DIST_INVALID).min(axis=1)
        take = dmin < best_d[:, obj_c]
        return (best_d.at[:, obj_c].set(jnp.where(take, dmin,
                                                  best_d[:, obj_c])),
                best_i.at[:, obj_c].set(jnp.where(take, imin,
                                                  best_i[:, obj_c]))), None

    (best_d, best_i), _ = jax.lax.scan(
        body, (init_d, init_i),
        (jnp.moveaxis(vecs_chunks, 1, 0), norm_chunks,
         db.chunk_obj, db.chunk_base))
    return _to_l2(best_d), best_i


def object_top1_l2(query_i8: jax.Array, db: SegmentedDbF,
                   q_tile: int = Q_TILE,
                   db_chunk: Optional[int] = None,
                   vary: Tuple[str, ...] = ()) -> Tuple[jax.Array, jax.Array]:
    """Backend dispatch: fused Mosaic kernel on TPU, XLA scan on CPU."""
    if jax.default_backend() == "cpu":
        return object_top1_l2_xla(query_i8, db, db_chunk, vary)
    return object_top1_l2_fused(query_i8, db, q_tile, db_chunk)


# ---------------------------------------------------------------------------
# Gathered (selected-object) variant: the fine pass of coarse->fine matching
# for the L2/SIFT path. Mirrors the gathered Hamming kernel
# (ops/pallas/segmented.py) — grid (q_tiles, C * max_chunks) with per-step
# chunk/slot/row-base scalar-prefetch operands — but with the L2 kernel's
# two-scratch (dist, row) fold and its lowest-row tie rule. Selected
# objects' columns are bitwise identical to the full sweep; empty slots
# (sel == -1) report the same values a never-taken lane emits:
# dist = _to_l2(DIST_INVALID), row = 0.
# ---------------------------------------------------------------------------

HOLE_ROW_L2 = 0


# One shared chunk-bound computation for both DB flavors (dispatches on
# bits_t/vecs_t); re-exported under the L2 name for this module's callers.
max_chunks_per_object_f = max_chunks_per_object


def _gathered_l2_kernel(chunk_ref, slot_ref, base_ref, q_ref, dbt_ref,
                        norm_ref, qnorm_ref, out_d_ref, out_i_ref,
                        best_d_ref, best_i_ref, *, n_steps: int,
                        q_tile: int, o_pad: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_d_ref[:] = jnp.full((q_tile, o_pad), DIST_INVALID, jnp.int32)
        best_i_ref[:] = jnp.zeros((q_tile, o_pad), jnp.int32)

    dot = jnp.dot(q_ref[:], dbt_ref[:], preferred_element_type=jnp.int32)
    dist = qnorm_ref[:] + norm_ref[:] - 2 * dot
    dmin = dist.min(axis=1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    imin = jnp.where(dist == dmin, base_ref[j] + col,
                     DIST_INVALID).min(axis=1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, (q_tile, o_pad), 1)
    # strict '<' + ascending step order per slot preserves the full
    # sweep's earliest-chunk / lowest-row tie rule
    take = (lane == slot_ref[j]) & (dmin < best_d_ref[:])
    best_d_ref[:] = jnp.where(take, dmin, best_d_ref[:])
    best_i_ref[:] = jnp.where(take, imin, best_i_ref[:])

    @pl.when(j == n_steps - 1)
    def _emit():
        out_d_ref[:] = best_d_ref[:]
        out_i_ref[:] = best_i_ref[:]


def object_top1_l2_gathered_fused(query_i8: jax.Array, db: SegmentedDbF,
                                  sel: jax.Array, max_chunks: int,
                                  q_tile: int = Q_TILE
                                  ) -> Tuple[jax.Array, jax.Array]:
    """Per-(query, selected-object) nearest row over int8-quantized
    descriptors; only the selected objects' chunks are visited. ``sel``:
    (C,) int32 object indices, -1 = empty slot. Returns ``(dist (Q, C) f32
    plain L2, row (Q, C) i32 within-object)``."""
    from tod_tpu.ops.pallas.segmented import _gathered_steps

    q = query_i8.shape[0]
    c = sel.shape[0]
    db_chunk = db_chunk_of_f(db)
    if q % q_tile:
        q_tile = next((t for t in (512, 256, 128) if q % t == 0), None)
        if q_tile is None:
            raise ValueError(f"Q ({q}) must be a multiple of 128")
    o_pad = -(-(c + 1) // 128) * 128      # +1: trash lane for padding steps
    n_steps = c * max_chunks
    if n_steps == 0:
        return (jnp.full((q, c), _to_l2(jnp.int32(DIST_INVALID)),
                         jnp.float32),
                jnp.full((q, c), HOLE_ROW_L2, jnp.int32))
    chunk, slot, base = _gathered_steps(db, sel, max_chunks, db_chunk, c)

    q_norm = (query_i8.astype(jnp.int32) ** 2).sum(axis=1)[:, None]
    kernel = functools.partial(_gathered_l2_kernel, n_steps=n_steps,
                               q_tile=q_tile, o_pad=o_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(q // q_tile, n_steps),
        in_specs=[
            pl.BlockSpec((q_tile, 128), lambda i, j, *_: (i, 0)),
            pl.BlockSpec((128, db_chunk),
                         lambda i, j, ck, sl, bs: (0, ck[j])),
            pl.BlockSpec((1, db_chunk),
                         lambda i, j, ck, sl, bs: (0, ck[j])),
            pl.BlockSpec((q_tile, 1), lambda i, j, *_: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((q_tile, o_pad), lambda i, j, *_: (i, 0)),
            pl.BlockSpec((q_tile, o_pad), lambda i, j, *_: (i, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((q_tile, o_pad), jnp.int32),
                        pltpu.VMEM((q_tile, o_pad), jnp.int32)],
    )
    out_d, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q, o_pad), jnp.int32),
            jax.ShapeDtypeStruct((q, o_pad), jnp.int32),
        ],
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(chunk, slot, base, query_i8, db.vecs_t, db.norm_sq, q_norm)
    return _to_l2(out_d[:, :c]), out_i[:, :c]


def object_top1_l2_gathered_xla(query_i8: jax.Array, db: SegmentedDbF,
                                sel: jax.Array,
                                db_chunk: Optional[int] = None,
                                vary: Tuple[str, ...] = ()
                                ) -> Tuple[jax.Array, jax.Array]:
    """XLA reference for :func:`object_top1_l2_gathered_fused`: the full
    sweep's columns at ``sel`` (bitwise-identical contract)."""
    d, r = object_top1_l2_xla(query_i8, db, db_chunk, vary)
    sel_safe = jnp.maximum(sel, 0)
    hole = (sel < 0)[None, :]
    return (jnp.where(hole, _to_l2(jnp.int32(DIST_INVALID)), d[:, sel_safe]),
            jnp.where(hole, HOLE_ROW_L2, r[:, sel_safe]))


def object_top1_l2_gathered(query_i8: jax.Array, db: SegmentedDbF,
                            sel: jax.Array, max_chunks: int,
                            q_tile: int = Q_TILE,
                            vary: Tuple[str, ...] = ()
                            ) -> Tuple[jax.Array, jax.Array]:
    """Backend dispatch: gathered Mosaic kernel on TPU, full-sweep gather
    on CPU."""
    if jax.default_backend() == "cpu":
        return object_top1_l2_gathered_xla(query_i8, db, sel, vary=vary)
    return object_top1_l2_gathered_fused(query_i8, db, sel, max_chunks,
                                         q_tile)
