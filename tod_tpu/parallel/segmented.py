"""Object-sharded segmented matching: the multi-chip form of the serving
matcher (ops/pallas/segmented.py).

Sharding layout: the OBJECT axis of the model DB is distributed across the
'db' mesh axis — each device packs a SegmentedDb of its own object subset
(whole objects only, so the per-object reduction never crosses devices).
Every device runs the per-(query, object) kernel against its local objects;
one all_gather over ICI assembles the (Q, O_total) result. Unlike the
row-sharded global matcher (parallel/matching.py), no top-k merge is needed:
per-object results are disjoint by construction — the collective is a pure
concatenation, exact by construction.

Queries may additionally be sharded along 'data' (frames), giving the 2D
form: each device owns a (frame-block x object-shard) tile.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tod_tpu.db.models import TodModel
from tod_tpu.ops.pallas.segmented import (DB_CHUNK, PAD_POP, SegmentedDb,
                                          object_top1, pack_segmented)


def pack_segmented_sharded(models: Sequence[TodModel], n_shards: int,
                           db_chunk: int = DB_CHUNK
                           ) -> Tuple[SegmentedDb, List[str]]:
    """Pack models into ``n_shards`` equal-shape SegmentedDbs stacked on a
    leading shard axis (shard s owns objects s, s+n_shards, ... round-robin;
    short shards are padded with empty objects whose rows never match).

    Returns ``(stacked SegmentedDb with leading dim n_shards, object_ids in
    concatenated shard-major order — the object axis of the gathered
    (Q, O) result)``. Padding slots (short shards) appear as ``None`` in the
    id list; their rows never match (PAD_POP sentinel), so consumers can
    either filter by ``id is None`` or ignore them (their distances are
    +inf-like)."""
    per = [list(models[s::n_shards]) for s in range(n_shards)]
    o_max = max((len(p) for p in per), default=0)
    pad_slots = [[False] * len(p) + [True] * (o_max - len(p)) for p in per]
    n_rows_max = 0
    packed = []
    for p in per:
        while len(p) < o_max:
            p.append(TodModel("", np.zeros((0, 32), np.uint8),
                              np.zeros((0, 3), np.float32)))
        db = pack_segmented(p, db_chunk)
        packed.append(db)
        n_rows_max = max(n_rows_max, db.bits_t.shape[1])

    def pad_rows(db: SegmentedDb) -> SegmentedDb:
        n = db.bits_t.shape[1]
        extra = n_rows_max - n
        if not extra:
            return db
        return SegmentedDb(
            bits_t=jnp.concatenate(
                [db.bits_t, jnp.zeros((256, extra), db.bits_t.dtype)], 1),
            pop=jnp.concatenate(
                [db.pop, jnp.full((1, extra), PAD_POP, db.pop.dtype)], 1),
            points=jnp.concatenate(
                [db.points, jnp.zeros((extra, 3), jnp.float32)]),
            obj_start=db.obj_start,
            n_rows=db.n_rows,
            spans=db.spans,
            chunk_obj=jnp.concatenate(
                [db.chunk_obj,
                 jnp.zeros(extra // db_chunk, jnp.int32)]),
            chunk_base=jnp.concatenate(
                [db.chunk_base,
                 jnp.zeros(extra // db_chunk, jnp.int32)]))

    packed = [pad_rows(db) for db in packed]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *packed)
    ids = [None if is_pad else m.object_id
           for p, pads in zip(per, pad_slots)
           for m, is_pad in zip(p, pads)]
    return stacked, ids


def sharded_object_top1(mesh: Mesh, query_u8: jax.Array,
                        sdb_stacked: SegmentedDb
                        ) -> Tuple[jax.Array, jax.Array]:
    """Per-(query, object) nearest rows across an object-sharded DB.

    ``query_u8``: (Q, 32), sharded over 'data' (Q divisible by the data
    axis); ``sdb_stacked``: SegmentedDb with leading shard axis == size of
    'db'. Returns (Q, O_total) dist/row in shard-major object order —
    bitwise equal to the single-device kernel on the same object order."""
    n_db = mesh.shape["db"]
    assert sdb_stacked.bits_t.shape[0] == n_db, "shard count != db axis"

    def local(q, sdb):
        sdb = jax.tree.map(lambda x: x[0], sdb)           # drop shard dim
        d, r = object_top1(q, sdb, vary=("data", "db"))
        # concatenation over 'db' assembles the full object axis; all devices
        # then hold identical values, but all_gather does not clear the
        # varying-across-mesh type — finish with a psum of shard 0's values
        # (type-safe replication, same trick as parallel/matching.py)
        d = jax.lax.all_gather(d, "db", axis=1, tiled=True)
        r = jax.lax.all_gather(r, "db", axis=1, tiled=True)
        first = (jax.lax.axis_index("db") == 0)
        return (jax.lax.psum(jnp.where(first, d, 0.0), "db"),
                jax.lax.psum(jnp.where(first, r, 0), "db"))

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("data", None), P("db")),
        out_specs=(P("data", None), P("data", None)))
    return fn(query_u8, sdb_stacked)
