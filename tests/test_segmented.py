"""Object-segmented per-(query, object) matcher: packing + kernel parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tod_tpu.db.models import TodModel
from tod_tpu.ops.pallas.segmented import (
    DIST_CLAMP,
    SegmentedDb,
    object_top1,
    object_top1_fused,
    object_top1_xla,
    pack_segmented,
)


def _models(rng, sizes):
    return [TodModel(f"o{i}", rng.integers(0, 256, (n, 32), dtype=np.uint8),
                     rng.uniform(-0.1, 0.1, (n, 3)).astype(np.float32))
            for i, n in enumerate(sizes)]


def _brute(q, models):
    """Per-object nearest row by brute force numpy."""
    qb = np.unpackbits(q, axis=1, bitorder="little")
    d_all, i_all = [], []
    for m in models:
        db = np.unpackbits(np.asarray(m.descriptors), axis=1,
                           bitorder="little")
        d = (qb[:, None, :] != db[None]).sum(-1)        # (Q, n)
        i_all.append(d.argmin(1))
        d_all.append(d.min(1))
    return np.stack(d_all, 1), np.stack(i_all, 1)       # (Q, O)


def test_pack_segmented_layout(rng):
    models = _models(rng, [5, 2049, 700])
    db = pack_segmented(models, db_chunk=2048)
    starts = np.asarray(db.obj_start)
    assert (starts % 2048 == 0).all()
    assert np.asarray(db.n_rows).tolist() == [5, 2049, 700]
    # chunk maps cover each object's padded range in order
    co = np.asarray(db.chunk_obj)
    assert co.tolist() == [0, 1, 1, 2]
    # padding rows are poisoned
    pop = np.asarray(db.pop)[0]
    assert pop[5] >= 1024 and pop[0] < 257
    # points aligned with rows
    np.testing.assert_allclose(np.asarray(db.points)[starts[2]:starts[2]+700],
                               models[2].points)


def test_object_top1_matches_bruteforce(rng):
    models = _models(rng, [100, 3000, 777, 2048])
    db = pack_segmented(models, db_chunk=2048)
    q = rng.integers(0, 256, (512, 32), dtype=np.uint8)
    d, i = jax.jit(lambda qq: object_top1_xla(qq, db, db_chunk=2048))(
        jnp.asarray(q))
    d_b, i_b = _brute(q, models)
    np.testing.assert_array_equal(np.asarray(d), d_b)
    # ties: realized distance at the returned row must equal the min
    i = np.asarray(i)
    for o, m in enumerate(models):
        db_o = np.unpackbits(np.asarray(m.descriptors), axis=1,
                             bitorder="little")
        qb = np.unpackbits(q, axis=1, bitorder="little")
        dd = (qb != db_o[i[:, o]]).sum(-1)
        np.testing.assert_array_equal(dd, d_b[:, o])


def test_fused_interpret_matches_xla(rng):
    models = _models(rng, [500, 2048, 64])
    db = pack_segmented(models, db_chunk=2048)
    q = rng.integers(0, 256, (512, 32), dtype=np.uint8)
    d_x, i_x = object_top1_xla(jnp.asarray(q), db, db_chunk=2048)
    d_f, i_f = object_top1_fused(jnp.asarray(q), db, q_tile=512,
                                 db_chunk=2048)
    np.testing.assert_array_equal(np.asarray(d_x), np.asarray(d_f))
    np.testing.assert_array_equal(np.asarray(i_x), np.asarray(i_f))


def test_empty_object_reports_clamp(rng):
    models = _models(rng, [64, 0, 64])
    db = pack_segmented(models, db_chunk=2048)
    q = rng.integers(0, 256, (512, 32), dtype=np.uint8)
    d, _ = object_top1(jnp.asarray(q), db, db_chunk=2048)
    assert (np.asarray(d)[:, 1] == DIST_CLAMP).all()
    assert (np.asarray(d)[:, [0, 2]] <= 256).all()


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="compiled Mosaic kernel needs TPU")
def test_fused_compiled_matches_xla_on_tpu(rng):
    models = _models(rng, [9000, 5000, 12000, 100])
    db = pack_segmented(models)
    q = rng.integers(0, 256, (1024, 32), dtype=np.uint8)
    d_x, i_x = jax.jit(lambda qq: object_top1_xla(qq, db))(jnp.asarray(q))
    d_f, i_f = jax.jit(lambda qq: object_top1_fused(qq, db))(jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(d_x), np.asarray(d_f))
    np.testing.assert_array_equal(np.asarray(i_x), np.asarray(i_f))


# ---------------------------------------------------------------------------
# Gathered (coarse->fine fine pass) kernel
# ---------------------------------------------------------------------------


def test_gathered_interpret_matches_xla(rng):
    from tod_tpu.ops.pallas.segmented import (
        HOLE_DIST, HOLE_ROW, max_chunks_per_object,
        object_top1_gathered_fused, object_top1_gathered_xla)

    models = _models(rng, [500, 4099, 64, 2048, 1])
    db = pack_segmented(models, db_chunk=2048)
    q = rng.integers(0, 256, (512, 32), dtype=np.uint8)
    maxc = max_chunks_per_object(db)
    assert maxc == 3  # 4099 rows / 2048 chunk
    # holes, out-of-order selection, and every object size class
    sel = jnp.asarray(np.array([3, -1, 0, 4, 2], np.int32))
    d_x, i_x = object_top1_gathered_xla(jnp.asarray(q), db, sel,
                                        db_chunk=2048)
    d_f, i_f = object_top1_gathered_fused(jnp.asarray(q), db, sel, maxc,
                                          q_tile=512)
    np.testing.assert_array_equal(np.asarray(d_x), np.asarray(d_f))
    np.testing.assert_array_equal(np.asarray(i_x), np.asarray(i_f))
    # hole slots report the sentinel
    assert (np.asarray(d_f)[:, 1] == HOLE_DIST).all()
    assert (np.asarray(i_f)[:, 1] == HOLE_ROW).all()
    # selected columns equal the full sweep's columns
    d_full, i_full = object_top1_xla(jnp.asarray(q), db, db_chunk=2048)
    for c, o in enumerate([3, -1, 0, 4, 2]):
        if o < 0:
            continue
        np.testing.assert_array_equal(np.asarray(d_f)[:, c],
                                      np.asarray(d_full)[:, o])
        np.testing.assert_array_equal(np.asarray(i_f)[:, c],
                                      np.asarray(i_full)[:, o])


def test_gathered_under_jit_with_traced_sel(rng):
    """The selection is a per-frame device value (computed by the coarse
    screen inside jit); the kernel's scalar-prefetch operands must trace."""
    from tod_tpu.ops.pallas.segmented import (max_chunks_per_object,
                                              object_top1_gathered)

    models = _models(rng, [300, 900, 77])
    db = pack_segmented(models, db_chunk=512)
    q = rng.integers(0, 256, (256, 32), dtype=np.uint8)
    maxc = max_chunks_per_object(db)

    @jax.jit
    def run(qq, order_scores):
        _, sel = jax.lax.top_k(order_scores, 2)
        return object_top1_gathered(qq, db, sel.astype(jnp.int32), maxc)

    d, i = run(jnp.asarray(q), jnp.asarray([0.1, 0.9, 0.5]))
    d_full, _ = object_top1_xla(jnp.asarray(q), db, db_chunk=512)
    np.testing.assert_array_equal(np.asarray(d)[:, 0],
                                  np.asarray(d_full)[:, 1])
    np.testing.assert_array_equal(np.asarray(d)[:, 1],
                                  np.asarray(d_full)[:, 2])


def test_subsample_models_preserves_alignment(rng):
    from tod_tpu.ops.pallas.segmented import subsample_models

    models = _models(rng, [100, 7])
    subs = subsample_models(models, 4)
    assert subs[0].n_points == 25 and subs[1].n_points == 2
    np.testing.assert_array_equal(subs[0].descriptors,
                                  models[0].descriptors[::4])
    np.testing.assert_allclose(subs[0].points, models[0].points[::4])
    assert subs[0].object_id == models[0].object_id


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="compiled Mosaic kernel needs TPU")
def test_gathered_compiled_matches_xla_on_tpu(rng):
    from tod_tpu.ops.pallas.segmented import (max_chunks_per_object,
                                              object_top1_gathered_fused,
                                              object_top1_gathered_xla)

    models = _models(rng, [9000, 5000, 12000, 100, 6000])
    db = pack_segmented(models)
    q = rng.integers(0, 256, (1024, 32), dtype=np.uint8)
    maxc = max_chunks_per_object(db)
    sel = jnp.asarray(np.array([4, 2, -1, 0], np.int32))
    d_x, i_x = jax.jit(lambda qq: object_top1_gathered_xla(qq, db, sel))(
        jnp.asarray(q))
    d_f, i_f = jax.jit(
        lambda qq: object_top1_gathered_fused(qq, db, sel, maxc))(
            jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(d_x), np.asarray(d_f))
    np.testing.assert_array_equal(np.asarray(i_x), np.asarray(i_f))
