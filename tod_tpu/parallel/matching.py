"""DB-sharded descriptor matching.

The tensor-parallel analog for this workload (SURVEY.md section 2c): the model
descriptor database — the biggest tensor in the system — is sharded along its
row axis across the 'db' mesh axis. Each device computes the exact Hamming
top-k of every query against its local shard (an MXU matmul over the local
rows), then the per-shard candidates are all_gather-ed over ICI and reduced to
the global top-k. Exact: top-k of per-shard top-k's equals the global top-k.

Queries can additionally be sharded along 'data' (frames/keypoints), making
this the 2D-parallel form: each device owns a (query-block x db-shard) tile.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tod_tpu.ops.matching import BIG_DIST, hamming_topk


def _merge_topk_by_index(best_d, best_i, new_d, new_i, k):
    """Merge two top-k lists with (distance, global index) ordering — fold-
    order independent, so every ring device converges to identical results
    (the deterministic lowest-index-wins tie-break of the single-device
    matcher). Indices must be < 2^22; integer distances above 510 (possible
    only for descriptors wider than 63 bytes) collapse into one "far" bucket
    but still rank behind every nearer match and ahead of empty slots — the
    invalid sentinel 0x7FFFFFFF sits strictly above the largest packable key
    (510 << 22 | (2^22-1))."""
    d = jnp.concatenate([best_d, new_d], axis=1)
    i = jnp.concatenate([best_i, new_i], axis=1)
    d_int = jnp.minimum(d, 510.0).astype(jnp.int32)
    keys = jnp.where(i >= 0, (d_int << 22) | i, jnp.int32(0x7FFFFFFF))
    _, pos = jax.lax.top_k(-keys, k)
    return (jnp.take_along_axis(d, pos, axis=1),
            jnp.take_along_axis(i, pos, axis=1))


def _replicate_over_db(dist, idx):
    """Mark value-identical per-device results as replicated over 'db'.

    Both matchers end with every 'db'-ring device holding the SAME merged
    top-k, but the varying-across-mesh type system can't infer that (only
    psum-family collectives clear variance), so out_specs=P('data', None)
    would be rejected. A psum of shard 0's values is a type-safe,
    value-preserving way to finish: one tiny (q_blk, k) collective."""
    first = (jax.lax.axis_index("db") == 0)
    return (jax.lax.psum(jnp.where(first, dist, 0.0), "db"),
            jax.lax.psum(jnp.where(first, idx, 0), "db"))


def sharded_hamming_topk(mesh: Mesh, query_u8: jax.Array, db_u8: jax.Array,
                         n_db_valid, k: int = 5,
                         chunk: int = 16384) -> Tuple[jax.Array, jax.Array]:
    """Exact kNN with the DB sharded over mesh axis 'db' and queries sharded
    over 'data'. ``db_u8`` rows must divide evenly by (n_db_shards * chunk);
    pad with tod_tpu.ops.matching.pad_db and pass the true row count.

    Returns globally-indexed ``(dist (Q,k), idx (Q,k))`` replicated over 'db'.
    """
    n_rows = db_u8.shape[0]
    n_db_shards = mesh.shape["db"]
    shard_rows = n_rows // n_db_shards
    if shard_rows * n_db_shards != n_rows or shard_rows % chunk != 0:
        raise ValueError(
            f"db rows {n_rows} must divide into {n_db_shards} shards of "
            f"chunk-multiple size (chunk={chunk})")

    def local(q_blk, db_shard, n_valid):
        shard_id = jax.lax.axis_index("db")
        offset = shard_id * shard_rows
        local_valid = jnp.clip(n_valid[0] - offset, 0, shard_rows)
        dist, idx = hamming_topk(q_blk, db_shard, local_valid, k=k,
                                 chunk=chunk, vary=("data", "db"))
        idx = jnp.where(idx >= 0, idx + offset, -1)
        # merge the per-shard top-k over the db axis (ICI all_gather)
        all_d = jax.lax.all_gather(dist, "db", axis=0)   # (D, q_blk, k)
        all_i = jax.lax.all_gather(idx, "db", axis=0)
        d_flat = jnp.moveaxis(all_d, 0, 1).reshape(q_blk.shape[0], -1)
        i_flat = jnp.moveaxis(all_i, 0, 1).reshape(q_blk.shape[0], -1)
        nd, pos = jax.lax.top_k(-d_flat, k)
        return _replicate_over_db(-nd, jnp.take_along_axis(i_flat, pos,
                                                           axis=1))

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("data", None), P("db", None), P()),
        out_specs=(P("data", None), P("data", None)))
    n_valid_arr = jnp.asarray([n_db_valid], jnp.int32)
    return fn(query_u8, db_u8, n_valid_arr)


def ring_hamming_topk(mesh: Mesh, query_u8: jax.Array, db_u8: jax.Array,
                      n_db_valid, k: int = 5,
                      chunk: int = 16384) -> Tuple[jax.Array, jax.Array]:
    """Ring-pass variant of :func:`sharded_hamming_topk` — the ring-attention
    analog for brute-force matching (SURVEY.md section 5 "long-context").

    Instead of an end-of-pass all_gather of per-shard candidates (O(devices)
    concatenation at the merge), the DB shards rotate around the 'db' ring
    via ``ppermute``; each device folds one shard per step into its running
    top-k, overlapping the next shard's transfer with the current shard's
    matmul. Exact: after D steps every device has folded every shard.
    """
    n_rows = db_u8.shape[0]
    n_db_shards = mesh.shape["db"]
    shard_rows = n_rows // n_db_shards
    if shard_rows * n_db_shards != n_rows or shard_rows % chunk != 0:
        raise ValueError(
            f"db rows {n_rows} must divide into {n_db_shards} shards of "
            f"chunk-multiple size (chunk={chunk})")
    if n_rows >= (1 << 22):
        raise ValueError("ring merge packs (dist, idx) into int32: "
                         f"db rows must be < 2^22, got {n_rows}")
    perm = [(j, (j - 1) % n_db_shards) for j in range(n_db_shards)]

    def local(q_blk, db_shard, n_valid):
        my = jax.lax.axis_index("db")
        qn = q_blk.shape[0]
        init_best = jax.tree.map(
            lambda x: jax.lax.pvary(x, ("data", "db")),
            (jnp.full((qn, k), BIG_DIST), jnp.full((qn, k), -1, jnp.int32)))

        def step(i, carry):
            (best_d, best_i), shard = carry
            src = (my + i) % n_db_shards        # original owner of `shard`
            offset = src * shard_rows
            local_valid = jnp.clip(n_valid[0] - offset, 0, shard_rows)
            d, idx = hamming_topk(q_blk, shard, local_valid, k=k, chunk=chunk,
                                  vary=("data", "db"))
            idx = jnp.where(idx >= 0, idx + offset, -1)
            merged = _merge_topk_by_index(best_d, best_i, d, idx, k)
            shard = jax.lax.ppermute(shard, "db", perm)
            return merged, shard

        (best_d, best_i), _ = jax.lax.fori_loop(
            0, n_db_shards, step, (init_best, db_shard))
        return _replicate_over_db(best_d, best_i)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("data", None), P("db", None), P()),
        out_specs=(P("data", None), P("data", None)))
    n_valid_arr = jnp.asarray([n_db_valid], jnp.int32)
    return fn(query_u8, db_u8, n_valid_arr)
