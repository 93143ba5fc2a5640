"""Object-segmented per-(query, object) nearest-neighbor Pallas kernel.

Motivation (measured on the honest 100-distinct-object bench DB,
tools/diag_hypotheses.py / diag_segmented.py): on weakly-distinctive textures
the *global* k-NN contract of the reference matcher
(src/detection/DescriptorMatcher.cpp:211-220) destroys most of the true
signal — junk rows from 1.6M other-object descriptors are as close (median
Hamming ~29) as correct matches (~25), so a global top-8 keeps only 12-16
correct unique keypoints per present object where per-object top-1 keeps
49-72. On a CPU with an LSH index, per-object exact search over 100 objects
is unaffordable — on the MXU it is one segmented matmul sweep. This is the
framework's native matching primitive; the DescriptorMatcher cell keeps the
reference's global contract for `.ork` parity.

Kernel shape: the DB is packed object-contiguous with every object's rows
padded to a multiple of ``db_chunk``, so each grid step's chunk belongs to
exactly ONE object (the chunk->object map is a host-computed scalar-prefetch
operand). Each step computes one (q_tile x db_chunk) Hamming-distance tile on
the MXU (int8), reduces it to a per-query row-min, and folds that into a
per-(query, object) running best in VMEM scratch — a (Q, O) result instead of
the global (Q, k): extraction is ONE min-reduction per tile instead of k
rounds of (min, mask), which is what made the global kernel extraction-bound
at permissive radii (~94ms/frame; this kernel is matmul/VMEM-floor bound).

Key packing: key = min(dist, 511) << 18 | row_within_object. Distances for
32-byte descriptors are <= 256; rows-within-object up to 2^18 = 262144.
Padding rows carry popcount 1024 so their (clamped) distance 511 can never
beat a real row (<= 256).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tod_tpu.ops.matching import unpack_bits, popcount_rows

DB_CHUNK = 4096         # best measured (tools/bench_segmented_sweep.py):
Q_TILE = 1024           # 8.2ms @ 1.7M rows / 2048 queries on the v5e
ROW_BITS = 18
ROW_MASK = (1 << ROW_BITS) - 1
DIST_CLAMP = 511
KEY_INVALID = 0x7FFFFFFF
PAD_POP = 1024          # padding-row popcount: dist >= 1024 - 256 > DIST_CLAMP
VMEM_LIMIT = 100 * 1024 * 1024


class SegmentedDb(NamedTuple):
    """Object-contiguous packed model DB with chunk-aligned object segments.

    Rows of object ``o`` occupy [obj_start[o], obj_start[o] + n_rows[o]);
    obj_start is a multiple of the chunk size. ``points`` rows align with
    descriptor rows. Pytree of device arrays (sharding-friendly).
    """

    bits_t: jax.Array      # (256, N_pad) int8 transposed unpacked bits
    pop: jax.Array         # (1, N_pad) int32 popcounts (PAD_POP on padding)
    points: jax.Array      # (N_pad, 3) f32 model points (0 on padding)
    obj_start: jax.Array   # (O,) int32 first global row of each object
    n_rows: jax.Array      # (O,) int32 real row count of each object
    spans: jax.Array       # (O,) f32 model AABB diagonals
    chunk_obj: jax.Array   # (n_chunks,) int32 object of each chunk
    chunk_base: jax.Array  # (n_chunks,) int32 first row-within-object


def pack_segmented(models: Sequence, db_chunk: int = DB_CHUNK,
                   reserve_rows: int = 0) -> SegmentedDb:
    """Pack TodModels into the segmented layout (host-side, at load time).

    ``reserve_rows``: pad EVERY object's segment to at least this many rows
    (poisoned padding, never matches). With a uniform reservation the packed
    array shapes are a function of (n_objects, reserve) alone, so a later
    re-pack after swapping models reuses every compiled program —
    the hot-catalog-update path (FusedDetector.update_models)."""
    descs, pts, starts, nrows, spans = [], [], [], [], []
    chunk_obj, chunk_base = [], []
    cursor = 0
    for o, m in enumerate(models):
        n = m.n_points
        if n > (1 << ROW_BITS):
            raise ValueError(
                f"object {o} has {n} rows > 2^{ROW_BITS}: the key packing "
                "(dist << 18 | row) would silently corrupt results — split "
                "the model or raise ROW_BITS")
        n_pad = -(-max(n, 1, reserve_rows) // db_chunk) * db_chunk
        d = np.zeros((n_pad, 32), np.uint8)
        d[:n] = m.descriptors
        p = np.zeros((n_pad, 3), np.float32)
        p[:n] = m.points
        descs.append(d)
        pts.append(p)
        starts.append(cursor)
        nrows.append(n)
        spans.append(m.span)
        for c in range(n_pad // db_chunk):
            chunk_obj.append(o)
            chunk_base.append(c * db_chunk)
        cursor += n_pad
    if not models:
        descs = [np.zeros((db_chunk, 32), np.uint8)]
        pts = [np.zeros((db_chunk, 3), np.float32)]
        chunk_obj, chunk_base = [0], [0]
    desc = np.concatenate(descs)
    bits = np.unpackbits(desc, axis=1, bitorder="little").astype(np.int8)
    pop = bits.sum(axis=1, dtype=np.int32)
    # poison padding rows so they can never win a min
    valid_row = np.zeros(len(desc), bool)
    for s, n in zip(starts, nrows):
        valid_row[s:s + n] = True
    pop = np.where(valid_row, pop, PAD_POP)
    return SegmentedDb(
        bits_t=jnp.asarray(np.ascontiguousarray(bits.T)),
        pop=jnp.asarray(pop[None, :]),
        points=jnp.asarray(np.concatenate(pts)),
        obj_start=jnp.asarray(np.asarray(starts, np.int32)),
        n_rows=jnp.asarray(np.asarray(nrows, np.int32)),
        spans=jnp.asarray(np.asarray(spans, np.float32)),
        chunk_obj=jnp.asarray(np.asarray(chunk_obj, np.int32)),
        chunk_base=jnp.asarray(np.asarray(chunk_base, np.int32)))


def _object_top1_kernel(chunk_obj_ref, chunk_base_ref, q_ref, dbt_ref,
                        pop_ref, qpop_ref, out_d_ref, out_i_ref, best_ref,
                        *, n_chunks: int, q_tile: int, db_chunk: int,
                        o_pad: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_ref[:] = jnp.full((q_tile, o_pad), KEY_INVALID, jnp.int32)

    dot = jnp.dot(q_ref[:], dbt_ref[:], preferred_element_type=jnp.int32)
    dist = qpop_ref[:] + pop_ref[:] - 2 * dot          # (q_tile, db_chunk)
    dist = jnp.minimum(dist, DIST_CLAMP)
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    keys = (dist << ROW_BITS) | (chunk_base_ref[j] + col)
    rowmin = keys.min(axis=1, keepdims=True)           # (q_tile, 1)

    # fold into the object's slot: a masked full-width min (512 x o_pad is
    # ~256KB — cheaper and safer than a dynamic lane-dim slice in Mosaic)
    o = chunk_obj_ref[j]
    lane = jax.lax.broadcasted_iota(jnp.int32, (q_tile, o_pad), 1)
    upd = jnp.where(lane == o, rowmin, KEY_INVALID)
    best_ref[:] = jnp.minimum(best_ref[:], upd)

    @pl.when(j == n_chunks - 1)
    def _emit():
        b = best_ref[:]
        out_d_ref[:] = (b >> ROW_BITS).astype(jnp.float32)
        out_i_ref[:] = b & ROW_MASK


def db_chunk_of(db: SegmentedDb) -> int:
    """The chunk size a SegmentedDb was packed with (static)."""
    return db.bits_t.shape[1] // max(db.chunk_obj.shape[0], 1)


def object_top1_fused(query_u8: jax.Array, db: SegmentedDb,
                      q_tile: int = Q_TILE,
                      db_chunk: Optional[int] = None
                      ) -> Tuple[jax.Array, jax.Array]:
    """Per-(query, object) nearest row. Returns ``(dist (Q, O) f32,
    row (Q, O) i32 row-within-object)``. Q must be a multiple of 128
    (q_tile falls back to the largest of 512/256/128 dividing Q); objects
    with zero real rows report dist 511 (never within any sane radius)."""
    q = query_u8.shape[0]
    n = db.bits_t.shape[1]
    if db_chunk is None:
        db_chunk = db_chunk_of(db)
    if q % q_tile:
        q_tile = next((t for t in (512, 256, 128) if q % t == 0), None)
        if q_tile is None:
            raise ValueError(f"Q ({q}) must be a multiple of 128")
    if n % db_chunk:
        raise ValueError(f"N ({n}) % {db_chunk} != 0 (repack the DB)")
    n_chunks = n // db_chunk
    n_objects = int(db.obj_start.shape[0]) or 1
    o_pad = -(-n_objects // 128) * 128

    q_bits = unpack_bits(query_u8, jnp.int8)
    q_pop = popcount_rows(query_u8).astype(jnp.int32)[:, None]

    kernel = functools.partial(
        _object_top1_kernel, n_chunks=n_chunks, q_tile=q_tile,
        db_chunk=db_chunk, o_pad=o_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(q // q_tile, n_chunks),
        in_specs=[
            pl.BlockSpec((q_tile, 256), lambda i, j, *_: (i, 0)),
            pl.BlockSpec((256, db_chunk), lambda i, j, *_: (0, j)),
            pl.BlockSpec((1, db_chunk), lambda i, j, *_: (0, j)),
            pl.BlockSpec((q_tile, 1), lambda i, j, *_: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((q_tile, o_pad), lambda i, j, *_: (i, 0)),
            pl.BlockSpec((q_tile, o_pad), lambda i, j, *_: (i, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((q_tile, o_pad), jnp.int32)],
    )
    out_d, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q, o_pad), jnp.float32),
            jax.ShapeDtypeStruct((q, o_pad), jnp.int32),
        ],
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(db.chunk_obj, db.chunk_base, q_bits, db.bits_t, db.pop, q_pop)
    return out_d[:, :n_objects], out_i[:, :n_objects]


def object_top1_xla(query_u8: jax.Array, db: SegmentedDb,
                    db_chunk: Optional[int] = None,
                    vary: Tuple[str, ...] = ()
                    ) -> Tuple[jax.Array, jax.Array]:
    """XLA reference implementation of :func:`object_top1_fused` (exact same
    results; used on CPU and in parity tests).

    ``vary``: mesh axis names this call varies over inside ``shard_map`` —
    the scan's constant carry init must be marked varying (jax.lax.pvary)
    or the varying-across-mesh type check rejects it."""
    if db_chunk is None:
        db_chunk = db_chunk_of(db)
    q_bits = unpack_bits(query_u8, jnp.bfloat16)
    q_pop = popcount_rows(query_u8)[:, None]
    n = db.bits_t.shape[1]
    n_chunks = n // db_chunk
    n_objects = int(db.obj_start.shape[0]) or 1
    qn = query_u8.shape[0]

    bits_chunks = db.bits_t.reshape(256, n_chunks, db_chunk)
    pop_chunks = db.pop.reshape(n_chunks, db_chunk)

    init = jnp.full((qn, n_objects), KEY_INVALID, jnp.int32)
    if vary:
        init = jax.lax.pvary(init, vary)

    def body(best, inp):
        bits_c, pop_c, obj_c, base_c = inp
        dot = jnp.dot(q_bits, bits_c.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        dist = jnp.minimum((q_pop + pop_c[None, :].astype(jnp.float32)
                            - 2.0 * dot).astype(jnp.int32), DIST_CLAMP)
        col = jnp.arange(db_chunk, dtype=jnp.int32)[None, :]
        keys = (dist << ROW_BITS) | (base_c + col)
        rowmin = keys.min(axis=1)
        cur = best[:, obj_c]
        return best.at[:, obj_c].set(jnp.minimum(cur, rowmin)), None

    best, _ = jax.lax.scan(
        body, init,
        (jnp.moveaxis(bits_chunks, 1, 0), pop_chunks,
         db.chunk_obj, db.chunk_base))
    return ((best >> ROW_BITS).astype(jnp.float32), best & ROW_MASK)


def object_top1(query_u8: jax.Array, db: SegmentedDb,
                q_tile: int = Q_TILE,
                db_chunk: Optional[int] = None,
                vary: Tuple[str, ...] = ()) -> Tuple[jax.Array, jax.Array]:
    """Backend dispatch: fused Mosaic kernel on TPU, XLA scan on CPU."""
    if jax.default_backend() == "cpu":
        return object_top1_xla(query_u8, db, db_chunk, vary)
    return object_top1_fused(query_u8, db, q_tile, db_chunk)


# ---------------------------------------------------------------------------
# Gathered (selected-object) variant: the fine pass of coarse->fine matching.
#
# The full sweep above is linear in TOTAL catalog rows (8.5ms @ 1.6M rows,
# ~68ms @ 12.9M) — the single-chip scaling wall at large catalogs. The
# coarse->fine serving mode first sweeps a stride-subsampled companion DB
# (1/stride the rows) to rank objects by the prescreen margin statistic, then
# runs this kernel over ONLY the selected objects' chunks: the grid is
# (q_tiles, C * max_chunks_per_object) and every step's chunk index comes
# from a per-frame scalar-prefetch operand, so unselected objects cost
# nothing. Results for selected objects are bitwise identical to the full
# sweep's columns (same chunks, same min fold).
# ---------------------------------------------------------------------------

HOLE_DIST = float(KEY_INVALID >> ROW_BITS)   # 8191.0 — empty sel slots
HOLE_ROW = KEY_INVALID & ROW_MASK            # 262143


def subsample_models(models: Sequence, stride: int) -> list:
    """Stride-subsampled copies of TodModels (the coarse companion DB).
    Every object keeps >= 1 row; spans are preserved (object-size prior)."""
    out = []
    for m in models:
        sub = type(m)(object_id=m.object_id,
                      descriptors=np.ascontiguousarray(
                          m.descriptors[::stride]),
                      points=np.ascontiguousarray(m.points[::stride]))
        out.append(sub)
    return out


def max_chunks_per_object(db) -> int:
    """Largest per-object chunk count (static; one-time host download).

    Accepts both segmented DB flavors — Hamming (``bits_t``) and L2
    (``vecs_t``) — so the Hamming and coarse->fine L2 paths share one
    chunk-bound computation."""
    starts = np.asarray(jax.device_get(db.obj_start))
    total = int(db.chunk_obj.shape[0])
    if starts.size == 0:
        return 0
    rows = db.bits_t if hasattr(db, "bits_t") else db.vecs_t
    db_chunk = rows.shape[1] // max(total, 1)
    bounds = np.concatenate([starts // db_chunk, [total]])
    return int(np.max(np.diff(bounds)))


def _gathered_steps(db: SegmentedDb, sel: jax.Array, max_chunks: int,
                    db_chunk: int, trash_slot: int):
    """Per-grid-step scalar-prefetch operands for the gathered kernel:
    (chunk index, output slot, row-within-object base) per step, flattened
    (C * max_chunks,). Padding steps point at chunk 0 / the trash slot."""
    c = sel.shape[0]
    sel_safe = jnp.maximum(sel, 0)
    chunk_start = db.obj_start // db_chunk                     # (O,)
    total_chunks = db.chunk_obj.shape[0]
    bounds = jnp.concatenate(
        [chunk_start[1:], jnp.array([total_chunks], jnp.int32)])
    n_chunks_obj = bounds - chunk_start                        # (O,)
    steps = jnp.arange(max_chunks, dtype=jnp.int32)
    valid = (steps[None, :] < n_chunks_obj[sel_safe][:, None]) \
        & (sel >= 0)[:, None]                                  # (C, maxc)
    chunk = jnp.where(valid, chunk_start[sel_safe][:, None] + steps[None, :],
                      0)
    slot = jnp.where(valid,
                     jnp.broadcast_to(
                         jnp.arange(c, dtype=jnp.int32)[:, None],
                         (c, max_chunks)),
                     trash_slot)
    base = steps[None, :] * db_chunk + jnp.zeros((c, 1), jnp.int32)
    return (chunk.reshape(-1), slot.reshape(-1).astype(jnp.int32),
            base.reshape(-1))


def _gathered_top1_kernel(chunk_ref, slot_ref, base_ref, q_ref, dbt_ref,
                          pop_ref, qpop_ref, out_d_ref, out_i_ref, best_ref,
                          *, n_steps: int, q_tile: int, o_pad: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_ref[:] = jnp.full((q_tile, o_pad), KEY_INVALID, jnp.int32)

    dot = jnp.dot(q_ref[:], dbt_ref[:], preferred_element_type=jnp.int32)
    dist = jnp.minimum(qpop_ref[:] + pop_ref[:] - 2 * dot, DIST_CLAMP)
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    keys = (dist << ROW_BITS) | (base_ref[j] + col)
    rowmin = keys.min(axis=1, keepdims=True)

    lane = jax.lax.broadcasted_iota(jnp.int32, (q_tile, o_pad), 1)
    upd = jnp.where(lane == slot_ref[j], rowmin, KEY_INVALID)
    best_ref[:] = jnp.minimum(best_ref[:], upd)

    @pl.when(j == n_steps - 1)
    def _emit():
        b = best_ref[:]
        out_d_ref[:] = (b >> ROW_BITS).astype(jnp.float32)
        out_i_ref[:] = b & ROW_MASK


def object_top1_gathered_fused(query_u8: jax.Array, db: SegmentedDb,
                               sel: jax.Array, max_chunks: int,
                               q_tile: int = Q_TILE
                               ) -> Tuple[jax.Array, jax.Array]:
    """Per-(query, selected-object) nearest row; only the selected objects'
    chunks are visited. ``sel``: (C,) int32 object indices, -1 = empty slot
    (reported as dist HOLE_DIST / row HOLE_ROW). Returns ``(dist (Q, C) f32,
    row (Q, C) i32 row-within-object)``."""
    q = query_u8.shape[0]
    c = sel.shape[0]
    db_chunk = db_chunk_of(db)
    if q % q_tile:
        q_tile = next((t for t in (512, 256, 128) if q % t == 0), None)
        if q_tile is None:
            raise ValueError(f"Q ({q}) must be a multiple of 128")
    # trash lane C absorbs padding steps' folds; +1 guarantees it exists
    o_pad = -(-(c + 1) // 128) * 128
    n_steps = c * max_chunks
    if n_steps == 0:
        return (jnp.full((q, c), HOLE_DIST, jnp.float32),
                jnp.full((q, c), HOLE_ROW, jnp.int32))
    chunk, slot, base = _gathered_steps(db, sel, max_chunks, db_chunk, c)

    q_bits = unpack_bits(query_u8, jnp.int8)
    q_pop = popcount_rows(query_u8).astype(jnp.int32)[:, None]

    kernel = functools.partial(_gathered_top1_kernel, n_steps=n_steps,
                               q_tile=q_tile, o_pad=o_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(q // q_tile, n_steps),
        in_specs=[
            pl.BlockSpec((q_tile, 256), lambda i, j, *_: (i, 0)),
            pl.BlockSpec((256, db_chunk),
                         lambda i, j, ck, sl, bs: (0, ck[j])),
            pl.BlockSpec((1, db_chunk),
                         lambda i, j, ck, sl, bs: (0, ck[j])),
            pl.BlockSpec((q_tile, 1), lambda i, j, *_: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((q_tile, o_pad), lambda i, j, *_: (i, 0)),
            pl.BlockSpec((q_tile, o_pad), lambda i, j, *_: (i, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((q_tile, o_pad), jnp.int32)],
    )
    out_d, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q, o_pad), jnp.float32),
            jax.ShapeDtypeStruct((q, o_pad), jnp.int32),
        ],
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(chunk, slot, base, q_bits, db.bits_t, db.pop, q_pop)
    return out_d[:, :c], out_i[:, :c]


def object_top1_gathered_xla(query_u8: jax.Array, db: SegmentedDb,
                             sel: jax.Array,
                             db_chunk: Optional[int] = None,
                             vary: Tuple[str, ...] = ()
                             ) -> Tuple[jax.Array, jax.Array]:
    """XLA reference for :func:`object_top1_gathered_fused`: the full sweep's
    columns at ``sel`` (bitwise-identical contract; used on CPU/tests)."""
    d, r = object_top1_xla(query_u8, db, db_chunk, vary)
    sel_safe = jnp.maximum(sel, 0)
    hole = (sel < 0)[None, :]
    return (jnp.where(hole, HOLE_DIST, d[:, sel_safe]),
            jnp.where(hole, HOLE_ROW, r[:, sel_safe]))


def object_top1_gathered(query_u8: jax.Array, db: SegmentedDb,
                         sel: jax.Array, max_chunks: int,
                         q_tile: int = Q_TILE,
                         vary: Tuple[str, ...] = ()
                         ) -> Tuple[jax.Array, jax.Array]:
    """Backend dispatch: gathered Mosaic kernel on TPU, full-sweep gather
    on CPU. ``vary``: mesh axes the operands vary over (forwarded to the
    XLA path's pvary annotations for shard_map's varying-type checks)."""
    if jax.default_backend() == "cpu":
        return object_top1_gathered_xla(query_u8, db, sel, vary=vary)
    return object_top1_gathered_fused(query_u8, db, sel, max_chunks, q_tile)
