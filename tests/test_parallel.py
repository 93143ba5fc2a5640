"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tod_tpu.models.fused import FusedDetectorConfig, pack_models
from tod_tpu.db.models import TodModel
from tod_tpu.geometry.detection import GuessConfig
from tod_tpu.geometry.ransac import RansacConfig, SeedPose
from tod_tpu.ops.matching import hamming_topk, pad_db
from tod_tpu.parallel import (
    detect_batch_sharded,
    make_mesh,
    sharded_hamming_topk,
    train_views_sharded,
)
from tod_tpu.parallel.detect import jit_detect_batch


@pytest.fixture(scope="module")
def devices8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()


def test_make_mesh_shapes(devices8):
    mesh = make_mesh(n_data=4, n_db=2)
    assert mesh.shape == {"data": 4, "db": 2}
    mesh = make_mesh()  # all devices on data
    assert mesh.shape["data"] == 8


def test_sharded_matching_exact(devices8, rng):
    mesh = make_mesh(n_data=2, n_db=4)
    chunk = 128
    q = rng.integers(0, 256, (64, 32), dtype=np.uint8)
    db = rng.integers(0, 256, (4 * chunk * 2, 32), dtype=np.uint8)
    n_valid = len(db) - 37  # exercise the tail-masking path
    dist_s, idx_s = sharded_hamming_topk(
        mesh, jnp.asarray(q), jnp.asarray(db), n_valid, k=5, chunk=chunk)
    dist_r, idx_r = hamming_topk(jnp.asarray(q), jnp.asarray(db), n_valid,
                                 k=5, chunk=chunk)
    np.testing.assert_array_equal(np.asarray(dist_s), np.asarray(dist_r))
    # indices may differ only on exact distance ties; verify distances match
    ref = np.asarray(dist_r)
    got_idx = np.asarray(idx_s)
    qb = np.unpackbits(q, axis=1, bitorder="little")
    dbb = np.unpackbits(db, axis=1, bitorder="little")
    for i in range(0, 64, 7):
        d = (qb[i][None, :] != dbb[got_idx[i]]).sum(-1)
        np.testing.assert_array_equal(d, ref[i])


def test_train_views_sharded_runs(devices8, rng):
    mesh = make_mesh(n_data=8, n_db=1)
    v, h, w = 8, 96, 128
    grays = jnp.asarray(rng.uniform(0, 255, (v, h, w)), jnp.float32)
    masks = jnp.asarray(np.ones((v, h, w), np.uint8))
    depths = jnp.full((v, h, w), 0.8, jnp.float32)
    Ks = jnp.broadcast_to(jnp.asarray(
        [[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]], jnp.float32), (v, 3, 3))
    Rs = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (v, 3, 3))
    Ts = jnp.zeros((v, 3), jnp.float32)
    with mesh:
        fn = train_views_sharded(mesh, n_features=64, n_levels=1)
        desc, world, valid = fn(grays, masks, depths, Ks, Rs, Ts)
    assert desc.shape == (v, 64, 32)
    assert world.shape == (v, 64, 3)
    assert np.asarray(valid).any()


def test_detect_batch_sharded_runs(devices8, rng):
    mesh = make_mesh(n_data=2, n_db=4)
    chunk = 128
    # tiny synthetic db: 2 objects
    models = [
        TodModel(f"o{i}",
                 rng.integers(0, 256, (100, 32), dtype=np.uint8),
                 rng.uniform(-0.1, 0.1, (100, 3)).astype(np.float32))
        for i in range(2)]
    cfg = FusedDetectorConfig(
        n_features=128, n_levels=1, db_chunk=chunk,
        guess=GuessConfig(
            ransac=RansacConfig(n_hypotheses=64, max_instances=2),
            max_matches_per_object=64, object_batch=2))
    db, ids = pack_models(models, chunk * 4)  # pad to 4 db-shards
    b, h, w = 2, 96, 128
    keys = jax.random.split(jax.random.PRNGKey(0), b)
    grays = jnp.asarray(rng.uniform(0, 255, (b, h, w)), jnp.float32)
    depths = jnp.full((b, h, w), 800, jnp.uint16)
    Ks = jnp.broadcast_to(jnp.asarray(
        [[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]], jnp.float32), (b, 3, 3))
    with mesh:
        det = detect_batch_sharded(mesh, keys, grays, depths, Ks, db, cfg)
    assert det.R.shape == (b, 2, 2, 3, 3)
    assert det.accepted.shape == (b, 2, 2)


def test_jit_detect_batch_compiles(devices8, rng):
    mesh = make_mesh(n_data=2, n_db=4)
    chunk = 128
    models = [TodModel("o0", rng.integers(0, 256, (64, 32), dtype=np.uint8),
                       rng.uniform(-0.1, 0.1, (64, 3)).astype(np.float32))]
    cfg = FusedDetectorConfig(
        n_features=128, n_levels=1, db_chunk=chunk,
        guess=GuessConfig(
            ransac=RansacConfig(n_hypotheses=64, max_instances=1),
            max_matches_per_object=64, object_batch=1))
    db, _ = pack_models(models, chunk * 4)
    b, h, w = 2, 96, 128
    keys = jax.random.split(jax.random.PRNGKey(1), b)
    grays = jnp.asarray(rng.uniform(0, 255, (b, h, w)), jnp.float32)
    depths = jnp.full((b, h, w), 800, jnp.uint16)
    Ks = jnp.broadcast_to(jnp.asarray(
        [[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]], jnp.float32), (b, 3, 3))
    with mesh:
        fn = jit_detect_batch(mesh, cfg)
        det = fn(keys, grays, depths, Ks, db)
        det.accepted.block_until_ready()
    assert det.accepted.shape == (b, 1, 1)


def test_ring_matching_exact(devices8, rng):
    from tod_tpu.parallel import ring_hamming_topk

    mesh = make_mesh(n_data=2, n_db=4)
    chunk = 128
    q = rng.integers(0, 256, (64, 32), dtype=np.uint8)
    db = rng.integers(0, 256, (4 * chunk * 2, 32), dtype=np.uint8)
    n_valid = len(db) - 19
    d_ring, i_ring = ring_hamming_topk(
        mesh, jnp.asarray(q), jnp.asarray(db), n_valid, k=5, chunk=chunk)
    d_ref, i_ref = hamming_topk(jnp.asarray(q), jnp.asarray(db), n_valid,
                                k=5, chunk=chunk)
    np.testing.assert_array_equal(np.asarray(d_ring), np.asarray(d_ref))
    np.testing.assert_array_equal(np.asarray(i_ring), np.asarray(i_ref))


def test_ring_matching_exact_at_max_distance(devices8):
    """Regression: a valid match at the maximum Hamming distance (256 — the
    query's exact complement) must beat empty slots in the ring merge (the
    old sort key collided with the invalid sentinel above distance 255)."""
    from tod_tpu.parallel import ring_hamming_topk

    mesh = make_mesh(n_data=2, n_db=4)
    chunk = 128
    q = np.zeros((8, 32), np.uint8)
    db = np.full((4 * chunk, 32), 255, np.uint8)  # every row is dist 256
    n_valid = 3  # only 3 real rows -> k=5 has 2 empty slots
    d_ring, i_ring = ring_hamming_topk(
        mesh, jnp.asarray(q), jnp.asarray(db), n_valid, k=5, chunk=chunk)
    d_ref, i_ref = hamming_topk(jnp.asarray(q), jnp.asarray(db), n_valid,
                                k=5, chunk=chunk)
    np.testing.assert_array_equal(np.asarray(d_ring), np.asarray(d_ref))
    np.testing.assert_array_equal(np.asarray(i_ring), np.asarray(i_ref))
    assert (np.asarray(i_ring)[:, :3] >= 0).all()


@pytest.mark.slow
def test_sharded_detection_pose_parity(devices8):
    """E2E multi-chip parity: train real models, then the SAME frames +
    PRNG keys through (a) the single-device fused path and (b) the
    ('data','db')-sharded batch path must produce the same accepted poses."""
    from tod_tpu.db import InMemoryDb, insert_observation, load_models_for_objects
    from tod_tpu.models import TodTrainer
    from tod_tpu.models.fused import detect_frame
    from tod_tpu.ops.image import rgb_to_gray
    from tod_tpu.utils.synthetic import (DEFAULT_K, SyntheticObject,
                                         compose_scene, facing_pose,
                                         turntable_observations)
    import json as _json

    InMemoryDb.reset_shared()
    db = InMemoryDb.shared("par_e2e")
    objects = []
    hw = (240, 320)
    K = DEFAULT_K.copy()
    K[:2] //= 2  # half-res camera for speed
    for i in range(2):
        obj = SyntheticObject.make(f"pobj{i}", seed=200 + i)
        objects.append(obj)
        for obs in turntable_observations(obj, n_views=6,
                                          elevations_deg=(60.0,), hw=hw, K=K):
            insert_observation(db, obj.object_id, obs["frame_number"],
                               obs["image"], obs["depth"], obs["mask"],
                               obs["K"], obs["R"], obs["T"])
        TodTrainer("t", object_id=obj.object_id,
                   json_db=_json.dumps({"type": "mem",
                                        "collection": "par_e2e"}),
                   json_feature_params=_json.dumps(
                       {"type": "ORB", "n_features": 300})).process()
    models = load_models_for_objects(db, "all")

    from tod_tpu.models.fused import FusedDetectorConfig, pack_models
    from tod_tpu.geometry.detection import GuessConfig
    from tod_tpu.geometry.ransac import RansacConfig

    cfg = FusedDetectorConfig(
        n_features=600, db_chunk=512,
        guess=GuessConfig(ransac=RansacConfig(n_hypotheses=256,
                                              min_inliers=8),
                          max_matches_per_object=256))
    mdb, _ = pack_models(models, 4 * 512)  # rows divide (n_db=4) x chunk=512

    rng = np.random.default_rng(5)
    frames = []
    for b in range(2):
        image, depth = compose_scene(
            objects, [facing_pose(rng, z=0.7, max_tilt=0.3, xy_extent=0.1),
                      facing_pose(rng, z=0.9, max_tilt=0.3, xy_extent=0.1)],
            hw=hw, K=K)
        gray = np.asarray(rgb_to_gray(jnp.asarray(image, jnp.float32)))
        frames.append((gray, depth))
    grays = jnp.stack([jnp.asarray(f[0]) for f in frames])
    depths = jnp.stack([jnp.asarray(f[1]) for f in frames])
    Ks = jnp.stack([jnp.asarray(K, jnp.float32)] * 2)
    keys = jax.random.split(jax.random.PRNGKey(42), 2)

    # single-device reference
    ref = [detect_frame(keys[b], grays[b], depths[b], Ks[b], mdb, cfg)[1]
           for b in range(2)]

    mesh = make_mesh(n_data=2, n_db=4)
    with mesh:
        fn = jit_detect_batch(mesh, cfg)
        det = fn(keys, grays, depths, Ks, mdb)
        acc_s = np.asarray(det.accepted)

    for b in range(2):
        acc_r = np.asarray(ref[b].accepted)
        assert acc_r.any(), "reference found no poses (bad test setup)"
        np.testing.assert_array_equal(acc_s[b], acc_r)
        sel = acc_r
        np.testing.assert_allclose(np.asarray(det.T[b])[sel],
                                   np.asarray(ref[b].T)[sel], atol=1e-3)
        np.testing.assert_allclose(np.asarray(det.R[b])[sel],
                                   np.asarray(ref[b].R)[sel], atol=1e-3)
        np.testing.assert_array_equal(np.asarray(det.n_inliers[b])[sel],
                                      np.asarray(ref[b].n_inliers)[sel])


def test_pipelined_detector_matches_single_device(devices8, rng):
    """PP analog (SURVEY 2c): the 3-stage device-pipelined detector placed on
    three distinct devices must produce the same detections as the
    single-device staged detector."""
    from tod_tpu.db.models import TodModel
    from tod_tpu.models import FusedDetector, FusedDetectorConfig
    from tod_tpu.parallel import PipelinedDetector
    from tod_tpu.geometry.detection import GuessConfig
    from tod_tpu.geometry.ransac import RansacConfig

    desc = rng.integers(0, 256, (600, 32), dtype=np.uint8)
    pts = rng.uniform(-0.1, 0.1, (600, 3)).astype(np.float32)
    models = [TodModel(f"o{i}", desc[i * 200:(i + 1) * 200],
                       pts[i * 200:(i + 1) * 200]) for i in range(3)]
    cfg = FusedDetectorConfig(
        n_features=256, db_chunk=512,
        guess=GuessConfig(ransac=RansacConfig(n_hypotheses=128),
                          max_matches_per_object=64))
    image = rng.integers(0, 255, (96, 128)).astype(np.float32)
    depth = np.full((96, 128), 0.8, np.float32)
    K = np.array([[100, 0, 64], [0, 100, 48], [0, 0, 1]], np.float32)

    ref = FusedDetector(models, cfg, seed=0)
    g, d, k = ref.prepare_frame(image, depth, K)
    _, det_ref = ref.detect_raw(g, d, k)

    pipe = PipelinedDetector(models, cfg, devices=jax.devices()[:3], seed=0)
    frames = [pipe.prepare_frame(image, depth, K)]
    dets = pipe.detect_stream(frames)
    for f in ("R", "T", "n_inliers", "accepted"):
        np.testing.assert_allclose(np.asarray(getattr(dets[0], f)),
                                   np.asarray(getattr(det_ref, f)),
                                   atol=1e-6)
    # stage outputs really live on the intended devices
    assert list(dets[0].R.devices())[0] == jax.devices()[2]


def test_sharded_object_top1_exact(devices8, rng):
    """Object-sharded segmented matching == single-device kernel on the
    same (shard-major) object order."""
    from tod_tpu.ops.pallas.segmented import object_top1, pack_segmented
    from tod_tpu.parallel import make_mesh, pack_segmented_sharded, \
        sharded_object_top1

    mesh = make_mesh(n_data=2, n_db=4)
    models = [TodModel(f"o{i}",
                       rng.integers(0, 256, (100 + 37 * i, 32), np.uint8),
                       rng.uniform(-0.1, 0.1, (100 + 37 * i, 3))
                       .astype(np.float32))
              for i in range(7)]  # 7 objects over 4 shards -> one pad object
    q = rng.integers(0, 256, (128, 32), dtype=np.uint8)

    stacked, ids = pack_segmented_sharded(models, n_shards=4, db_chunk=2048)
    d_s, r_s = jax.jit(lambda qq, db: sharded_object_top1(mesh, qq, db))(
        jnp.asarray(q), stacked)

    # reference: single-device kernel over the SAME shard-major order
    # (pad slots carry id None and an empty model)
    by_id = {m.object_id: m for m in models}
    ordered = [TodModel("", np.zeros((0, 32), np.uint8),
                        np.zeros((0, 3), np.float32))
               if i is None else by_id[i] for i in ids]
    db1 = pack_segmented(ordered, db_chunk=2048)
    d_1, r_1 = object_top1(jnp.asarray(q), db1, db_chunk=2048)

    assert len(ids) == 8 and ids.count(None) == 1
    np.testing.assert_array_equal(np.asarray(d_s), np.asarray(d_1))
    np.testing.assert_array_equal(np.asarray(r_s), np.asarray(r_1))


def test_sharded_object_top1_l2_exact(devices8, rng):
    """Object-sharded segmented matching on the SIFT/L2 path (SegmentedDbF
    int8-quantized descriptors) == single-device L2 kernel on the same
    shard-major object order, including pad-object slots."""
    from tod_tpu.ops.pallas.segmented_l2 import (object_top1_l2,
                                                 pack_segmented_l2,
                                                 quantize_descriptors)
    from tod_tpu.parallel import make_mesh, sharded_object_top1
    from tod_tpu.parallel.segmented import pack_segmented_l2_sharded

    mesh = make_mesh(n_data=2, n_db=4)
    models = []
    for i in range(7):  # 7 objects over 4 shards -> one pad object
        n = 100 + 37 * i
        d = rng.random((n, 128)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        models.append(TodModel(f"o{i}", d,
                               rng.uniform(-0.1, 0.1, (n, 3))
                               .astype(np.float32)))
    qf = rng.random((128, 128)).astype(np.float32)
    qf /= np.linalg.norm(qf, axis=1, keepdims=True)
    qi = np.asarray(quantize_descriptors(jnp.asarray(qf)))

    stacked, ids = pack_segmented_l2_sharded(models, n_shards=4,
                                             db_chunk=2048)
    d_s, r_s = jax.jit(lambda qq, db: sharded_object_top1(mesh, qq, db))(
        jnp.asarray(qi), stacked)

    by_id = {m.object_id: m for m in models}
    ordered = [TodModel("", np.zeros((0, 128), np.float32),
                        np.zeros((0, 3), np.float32))
               if i is None else by_id[i] for i in ids]
    db1 = pack_segmented_l2(ordered, db_chunk=2048)
    d_1, r_1 = object_top1_l2(jnp.asarray(qi), db1, db_chunk=2048)

    assert len(ids) == 8 and ids.count(None) == 1
    np.testing.assert_array_equal(np.asarray(d_s), np.asarray(d_1))
    np.testing.assert_array_equal(np.asarray(r_s), np.asarray(r_1))


@pytest.mark.parametrize("prescreen", [0, 4])
def test_serving_step_sharded_matches_single_device(devices8, rng, prescreen):
    """The one-program multi-chip segmented serving step (matching + tier-1
    activation + tier-2 RANSAC, objects/actives over 'db', frames over
    'data') equals detect_frame_segmented on one device over the same
    shard-major object order — with and without the tier-1 pre-screen
    (whose top-P id list is sliced positionally over 'db')."""
    from tod_tpu.geometry.detection import (ActivationConfig, GuessConfig,
                                            detect_frame_segmented)
    from tod_tpu.models.fused import FusedDetectorConfig
    from tod_tpu.ops.pallas.segmented import pack_segmented
    from tod_tpu.parallel import make_mesh, pack_segmented_sharded
    from tod_tpu.parallel.segmented import serving_step_sharded

    mesh = make_mesh(n_data=2, n_db=4)
    # 8 objects over 4 shards; give 3 of them real scene support
    models = []
    scene_qp, scene_xy, scene_dsc = [], [], []
    for i in range(8):
        n = 120 + 17 * i
        desc = rng.integers(0, 256, (n, 32), np.uint8)
        pts = rng.uniform(-0.1, 0.1, (n, 3)).astype(np.float32)
        models.append(TodModel(f"o{i}", desc, pts))
    q_n = 256
    qp = np.full((2, q_n, 3), np.nan, np.float32)
    xy = np.zeros((2, q_n, 2), np.float32)
    dsc = rng.integers(0, 256, (2, q_n, 32), np.uint8)
    ok = np.zeros((2, q_n), bool)
    for f in range(2):
        cursor = 0
        for i in (0, 3, 5):                       # objects present in frame f
            m = models[i]
            take = 50
            sel = rng.choice(m.n_points, take, replace=False)
            Rg = np.linalg.qr(rng.normal(size=(3, 3)))[0]
            if np.linalg.det(Rg) < 0:
                Rg[:, 0] *= -1
            Tg = np.array([0.1 * i - 0.3, 0.05 * f, 0.8], np.float32)
            qp[f, cursor:cursor + take] = m.points[sel] @ Rg.T + Tg
            xy[f, cursor:cursor + take] = rng.uniform(30, 600, (take, 2))
            dsc[f, cursor:cursor + take] = m.descriptors[sel]
            ok[f, cursor:cursor + take] = True
            cursor += take
    cfg = FusedDetectorConfig(
        pipeline="segmented", radius=60.0, q_cap=q_n,
        activation=ActivationConfig(m_cap=64, n_hypotheses=64,
                                    object_batch=2, prescreen=prescreen),
        guess=GuessConfig(
            ransac=RansacConfig(n_hypotheses=128, min_inliers=8,
                                max_instances=2),
            max_matches_per_object=64, max_active_objects=4,
            object_batch=2))

    stacked, ids = pack_segmented_sharded(models, n_shards=4, db_chunk=2048)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    with mesh:
        fn = serving_step_sharded(mesh, cfg)
        det_s = fn(keys, jnp.asarray(xy), jnp.asarray(qp), jnp.asarray(ok),
                   jnp.asarray(dsc), stacked)

    # single-device reference over the SAME shard-major object order
    by_id = {m.object_id: m for m in models}
    ordered = [by_id[i] for i in ids]   # 8 objects over 4 shards: no pads
    db1 = pack_segmented(ordered, db_chunk=2048)
    for f in range(2):
        from tod_tpu.ops.pallas.segmented import object_top1

        d1, r1 = object_top1(jnp.asarray(dsc[f]), db1, db_chunk=2048)
        _, det_1 = jax.jit(detect_frame_segmented, static_argnums=(9, 10, 11))(
            keys[f], d1, r1, jnp.asarray(ok[f]), jnp.asarray(qp[f]),
            jnp.asarray(xy[f]), db1.points, db1.obj_start, db1.spans,
            cfg.guess, cfg.activation, cfg.radius)
        np.testing.assert_array_equal(np.asarray(det_s.accepted[f]),
                                      np.asarray(det_1.accepted))
        acc = np.asarray(det_1.accepted)
        np.testing.assert_allclose(np.asarray(det_s.T[f])[acc],
                                   np.asarray(det_1.T)[acc], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(det_s.n_inliers[f]),
                                      np.asarray(det_1.n_inliers))
    # sanity: the planted objects are actually detected
    assert np.asarray(det_s.accepted).any()


@pytest.mark.parametrize("fine_width", [4, 8])
def test_serving_step_sharded_coarse_fine_matches_single_device(
        devices8, rng, fine_width):
    """The multi-chip coarse->fine serving step (per-shard coarse sweep ->
    global top-fine_width slab -> per-shard gathered fine pass merged by a
    pmin of packed keys -> slab-sharded tier-1/tier-2) equals the
    single-device coarse->fine path (coarse_select + object_top1_gathered +
    detect_frame_gathered) over the same shard-major object order.
    fine_width=8 covers the slab == whole-catalog case."""
    from tod_tpu.geometry.detection import (ActivationConfig, GuessConfig,
                                            coarse_select,
                                            detect_frame_gathered)
    from tod_tpu.models.fused import FusedDetectorConfig
    from tod_tpu.ops.pallas.segmented import (object_top1,
                                              object_top1_gathered_xla,
                                              pack_segmented,
                                              subsample_models)
    from tod_tpu.parallel import make_mesh, pack_segmented_sharded
    from tod_tpu.parallel.segmented import (serving_step_sharded,
                                            stacked_max_chunks)

    mesh = make_mesh(n_data=2, n_db=4)
    models = []
    for i in range(8):
        n = 120 + 17 * i
        desc = rng.integers(0, 256, (n, 32), np.uint8)
        pts = rng.uniform(-0.1, 0.1, (n, 3)).astype(np.float32)
        models.append(TodModel(f"o{i}", desc, pts))
    q_n = 256
    qp = np.full((2, q_n, 3), np.nan, np.float32)
    xy = np.zeros((2, q_n, 2), np.float32)
    dsc = rng.integers(0, 256, (2, q_n, 32), np.uint8)
    ok = np.zeros((2, q_n), bool)
    for f in range(2):
        cursor = 0
        for i in (0, 3, 5):
            m = models[i]
            take = 50
            sel_rows = rng.choice(m.n_points, take, replace=False)
            Rg = np.linalg.qr(rng.normal(size=(3, 3)))[0]
            if np.linalg.det(Rg) < 0:
                Rg[:, 0] *= -1
            Tg = np.array([0.1 * i - 0.3, 0.05 * f, 0.8], np.float32)
            qp[f, cursor:cursor + take] = m.points[sel_rows] @ Rg.T + Tg
            xy[f, cursor:cursor + take] = rng.uniform(30, 600, (take, 2))
            dsc[f, cursor:cursor + take] = m.descriptors[sel_rows]
            ok[f, cursor:cursor + take] = True
            cursor += take
    cfg = FusedDetectorConfig(
        pipeline="segmented", radius=60.0, q_cap=q_n,
        coarse_stride=3, fine_width=fine_width,
        activation=ActivationConfig(m_cap=64, n_hypotheses=64,
                                    object_batch=2, prescreen=0),
        guess=GuessConfig(
            ransac=RansacConfig(n_hypotheses=128, min_inliers=8,
                                max_instances=2),
            max_matches_per_object=64, max_active_objects=4,
            object_batch=2))

    stacked, ids = pack_segmented_sharded(models, n_shards=4, db_chunk=2048)
    cstacked, _ = pack_segmented_sharded(
        subsample_models(models, cfg.coarse_stride), n_shards=4,
        db_chunk=2048)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    with mesh:
        fn = serving_step_sharded(mesh, cfg,
                                  fine_max_chunks=stacked_max_chunks(stacked))
        det_s = fn(keys, jnp.asarray(xy), jnp.asarray(qp), jnp.asarray(ok),
                   jnp.asarray(dsc), stacked, cstacked)

    by_id = {m.object_id: m for m in models}
    ordered = [by_id[i] for i in ids]
    db1 = pack_segmented(ordered, db_chunk=2048)
    cdb1 = pack_segmented(subsample_models(ordered, cfg.coarse_stride),
                          db_chunk=2048)
    for f in range(2):
        dc1, _ = object_top1(jnp.asarray(dsc[f]), cdb1, db_chunk=2048)
        sel1 = coarse_select(dc1, jnp.asarray(ok[f]), cfg.radius,
                             cfg.resolved_coarse_slack, cfg.fine_width,
                             cfg.activation.prescreen_top)
        df1, rf1 = object_top1_gathered_xla(jnp.asarray(dsc[f]), db1, sel1,
                                            db_chunk=2048)
        _, det_1 = jax.jit(detect_frame_gathered,
                           static_argnums=(10, 11, 12))(
            keys[f], df1, rf1, sel1, jnp.asarray(ok[f]), jnp.asarray(qp[f]),
            jnp.asarray(xy[f]), db1.points, db1.obj_start, db1.spans,
            cfg.guess, cfg.activation, cfg.radius)
        np.testing.assert_array_equal(np.asarray(det_s.accepted[f]),
                                      np.asarray(det_1.accepted))
        acc = np.asarray(det_1.accepted)
        np.testing.assert_allclose(np.asarray(det_s.T[f])[acc],
                                   np.asarray(det_1.T)[acc], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(det_s.n_inliers[f]),
                                      np.asarray(det_1.n_inliers))
    assert np.asarray(det_s.accepted).any()


@pytest.mark.parametrize("prescreen,fine_width", [(0, 12), (4, 12),
                                                  (0, 16)])
def test_serving_step_sharded_streaming_slots_matches_single_device(
        devices8, rng, prescreen, fine_width):
    """The multi-chip coarse->fine serving step with STREAMING SLOTS
    (track_width + explore_width reserved slab slots, per-frame id arrays
    supplied by the driver) equals the single-device _stage_coarse_select
    construction: coarse top-(fine_width - reserved), then merge tracked,
    then merge explore — including dedup of a tracked/explored object the
    coarse screen also selected, and -1 holes. With ``prescreen`` > 0 the
    reserved slots bypass the in-slab tier-1 prescreen and EXPAND the
    tier-1 set (n_pre = prescreen + reserved = 8 < slab 12) identically on
    both paths (reserved_force_mask / n_forced). fine_width=16 > catalog
    (8) + reserved (4) covers the CLAMPED slab: coarse_select returns only
    8 coarse slots, the step must slice the clamped coarse prefix (not
    fine_width - reserved = 12 of a 12-long sel), and the single-device
    reference constructs the identical slab."""
    from tod_tpu.geometry.detection import (ActivationConfig, GuessConfig,
                                            coarse_select,
                                            detect_frame_gathered,
                                            merge_tracked,
                                            reserved_force_mask)
    from tod_tpu.models.fused import FusedDetectorConfig
    from tod_tpu.ops.pallas.segmented import (object_top1,
                                              object_top1_gathered_xla,
                                              pack_segmented,
                                              subsample_models)
    from tod_tpu.parallel import make_mesh, pack_segmented_sharded
    from tod_tpu.parallel.segmented import (serving_step_sharded,
                                            stacked_max_chunks)

    mesh = make_mesh(n_data=2, n_db=4)
    models = []
    for i in range(8):
        n = 120 + 17 * i
        desc = rng.integers(0, 256, (n, 32), np.uint8)
        pts = rng.uniform(-0.1, 0.1, (n, 3)).astype(np.float32)
        models.append(TodModel(f"o{i}", desc, pts))
    q_n = 256
    qp = np.full((2, q_n, 3), np.nan, np.float32)
    xy = np.zeros((2, q_n, 2), np.float32)
    dsc = rng.integers(0, 256, (2, q_n, 32), np.uint8)
    ok = np.zeros((2, q_n), bool)
    for f in range(2):
        cursor = 0
        for i in (0, 3, 5):
            m = models[i]
            take = 50
            sel_rows = rng.choice(m.n_points, take, replace=False)
            Rg = np.linalg.qr(rng.normal(size=(3, 3)))[0]
            if np.linalg.det(Rg) < 0:
                Rg[:, 0] *= -1
            Tg = np.array([0.1 * i - 0.3, 0.05 * f, 0.8], np.float32)
            qp[f, cursor:cursor + take] = m.points[sel_rows] @ Rg.T + Tg
            xy[f, cursor:cursor + take] = rng.uniform(30, 600, (take, 2))
            dsc[f, cursor:cursor + take] = m.descriptors[sel_rows]
            ok[f, cursor:cursor + take] = True
            cursor += take
            if (f, i) == (0, 5):
                gt_r5, gt_t5 = Rg.astype(np.float32), Tg
    cfg = FusedDetectorConfig(
        pipeline="segmented", radius=60.0, q_cap=q_n,
        coarse_stride=3, fine_width=fine_width, track_width=1,
        explore_width=3,
        activation=ActivationConfig(m_cap=64, n_hypotheses=64,
                                    object_batch=2, prescreen=prescreen),
        guess=GuessConfig(
            ransac=RansacConfig(n_hypotheses=128, min_inliers=8,
                                max_instances=2),
            max_matches_per_object=64, max_active_objects=4,
            object_batch=2))
    # frame 0: a tracked object the coarse screen will also rank (dedup) +
    # rotation slots incl. one duplicating the tracked id; frame 1: empty
    # tracked slot (-1 hole)
    tracked = np.asarray([[5], [-1]], np.int32)
    explore = np.asarray([[2, 5, 7], [3, 4, 6]], np.int32)

    stacked, ids = pack_segmented_sharded(models, n_shards=4, db_chunk=2048)
    cstacked, _ = pack_segmented_sharded(
        subsample_models(models, cfg.coarse_stride), n_shards=4,
        db_chunk=2048)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    # tracked-pose seeding operands (track_width > 0): frame 0 seeds the
    # tracked object o5 with its TRUE pose (shard-major object axis)
    n_total = len(ids)
    seed_r = np.broadcast_to(np.eye(3, dtype=np.float32),
                             (2, n_total, 3, 3)).copy()
    seed_t = np.zeros((2, n_total, 3), np.float32)
    seed_ok = np.zeros((2, n_total), bool)
    o5 = ids.index("o5")
    seed_r[0, o5], seed_t[0, o5], seed_ok[0, o5] = gt_r5, gt_t5, True
    with mesh:
        fn = serving_step_sharded(mesh, cfg,
                                  fine_max_chunks=stacked_max_chunks(stacked))
        det_s, last_sel = fn(
            keys, jnp.asarray(xy), jnp.asarray(qp), jnp.asarray(ok),
            jnp.asarray(dsc), stacked, cstacked,
            jnp.asarray(tracked), jnp.asarray(explore),
            jnp.asarray(seed_r), jnp.asarray(seed_t), jnp.asarray(seed_ok))
    # with track_width > 0 the step also returns the coarse-slot prefix
    # (the driver's needy-first eviction input)
    n_coarse = min(cfg.fine_width - cfg.track_width - cfg.explore_width,
                   len(ids))
    assert np.asarray(last_sel).shape == (2, n_coarse)

    by_id = {m.object_id: m for m in models}
    ordered = [by_id[i] for i in ids]
    db1 = pack_segmented(ordered, db_chunk=2048)
    cdb1 = pack_segmented(subsample_models(ordered, cfg.coarse_stride),
                          db_chunk=2048)
    reserved = cfg.track_width + cfg.explore_width
    for f in range(2):
        dc1, _ = object_top1(jnp.asarray(dsc[f]), cdb1, db_chunk=2048)
        sel1 = coarse_select(dc1, jnp.asarray(ok[f]), cfg.radius,
                             cfg.resolved_coarse_slack,
                             cfg.fine_width - reserved,
                             cfg.activation.prescreen_top)
        sel1 = merge_tracked(sel1, jnp.asarray(tracked[f]))
        sel1 = merge_tracked(sel1, jnp.asarray(explore[f]))
        force1 = reserved_force_mask(sel1, jnp.asarray(tracked[f]),
                                     jnp.asarray(explore[f]))
        force_act1 = reserved_force_mask(sel1, jnp.asarray(tracked[f]))
        df1, rf1 = object_top1_gathered_xla(jnp.asarray(dsc[f]), db1, sel1,
                                            db_chunk=2048)
        seeds1 = SeedPose(R=jnp.asarray(seed_r[f]), T=jnp.asarray(seed_t[f]),
                          ok=jnp.asarray(seed_ok[f]))
        _, det_1 = jax.jit(detect_frame_gathered,
                           static_argnums=(10, 11, 12, 14))(
            keys[f], df1, rf1, sel1, jnp.asarray(ok[f]), jnp.asarray(qp[f]),
            jnp.asarray(xy[f]), db1.points, db1.obj_start, db1.spans,
            cfg.guess, cfg.activation, cfg.radius, force1,
            cfg.track_width + cfg.explore_width, force_act1, seeds1)
        np.testing.assert_array_equal(
            np.asarray(last_sel[f]), np.asarray(sel1)[:n_coarse])
        np.testing.assert_array_equal(np.asarray(det_s.accepted[f]),
                                      np.asarray(det_1.accepted))
        acc = np.asarray(det_1.accepted)
        np.testing.assert_allclose(np.asarray(det_s.T[f])[acc],
                                   np.asarray(det_1.T)[acc], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(det_s.n_inliers[f]),
                                      np.asarray(det_1.n_inliers))
    assert np.asarray(det_s.accepted).any()


def test_serving_step_sharded_coarse_fine_l2_matches_single_device(
        devices8, rng):
    """The multi-chip coarse->fine serving step on the SIFT/L2 path (float
    DB, int8-quantized gathered fine kernel, pmin/psum slab merge) equals
    the single-device L2 coarse->fine composition."""
    from tod_tpu.geometry.detection import (ActivationConfig, GuessConfig,
                                            coarse_select,
                                            detect_frame_gathered)
    from tod_tpu.models.fused import FusedDetectorConfig
    from tod_tpu.ops.pallas.segmented import subsample_models
    from tod_tpu.ops.pallas.segmented_l2 import (
        object_top1_l2, object_top1_l2_gathered_xla, pack_segmented_l2,
        quantize_descriptors)
    from tod_tpu.parallel import make_mesh
    from tod_tpu.parallel.segmented import (pack_segmented_l2_sharded,
                                            serving_step_sharded,
                                            stacked_max_chunks)

    mesh = make_mesh(n_data=2, n_db=4)
    models = []
    for i in range(8):
        n = 120 + 17 * i
        d = rng.random((n, 128)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        pts = rng.uniform(-0.1, 0.1, (n, 3)).astype(np.float32)
        models.append(TodModel(f"o{i}", d, pts))
    q_n = 256
    qp = np.full((2, q_n, 3), np.nan, np.float32)
    xy = np.zeros((2, q_n, 2), np.float32)
    dsc_f32 = rng.random((2, q_n, 128)).astype(np.float32)
    dsc_f32 /= np.linalg.norm(dsc_f32, axis=2, keepdims=True)
    ok = np.zeros((2, q_n), bool)
    for f in range(2):
        cursor = 0
        for i in (0, 3, 5):
            m = models[i]
            take = 50
            sel_rows = rng.choice(m.n_points, take, replace=False)
            Rg = np.linalg.qr(rng.normal(size=(3, 3)))[0]
            if np.linalg.det(Rg) < 0:
                Rg[:, 0] *= -1
            Tg = np.array([0.1 * i - 0.3, 0.05 * f, 0.8], np.float32)
            qp[f, cursor:cursor + take] = m.points[sel_rows] @ Rg.T + Tg
            xy[f, cursor:cursor + take] = rng.uniform(30, 600, (take, 2))
            dsc_f32[f, cursor:cursor + take] = m.descriptors[sel_rows]
            ok[f, cursor:cursor + take] = True
            cursor += take
    dsc = np.asarray(quantize_descriptors(jnp.asarray(dsc_f32)))
    cfg = FusedDetectorConfig(
        pipeline="segmented", feature="SIFT", radius=0.9, q_cap=q_n,
        coarse_stride=3, fine_width=4,
        activation=ActivationConfig(m_cap=64, n_hypotheses=64,
                                    object_batch=2, prescreen=0),
        guess=GuessConfig(
            ransac=RansacConfig(n_hypotheses=128, min_inliers=8,
                                max_instances=2),
            max_matches_per_object=64, max_active_objects=4,
            object_batch=2))

    stacked, ids = pack_segmented_l2_sharded(models, n_shards=4,
                                             db_chunk=2048)
    cstacked, _ = pack_segmented_l2_sharded(
        subsample_models(models, cfg.coarse_stride), n_shards=4,
        db_chunk=2048)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    with mesh:
        fn = serving_step_sharded(mesh, cfg,
                                  fine_max_chunks=stacked_max_chunks(stacked))
        det_s = fn(keys, jnp.asarray(xy), jnp.asarray(qp), jnp.asarray(ok),
                   jnp.asarray(dsc), stacked, cstacked)

    by_id = {m.object_id: m for m in models}
    ordered = [by_id[i] for i in ids]
    db1 = pack_segmented_l2(ordered, db_chunk=2048)
    cdb1 = pack_segmented_l2(subsample_models(ordered, cfg.coarse_stride),
                             db_chunk=2048)
    for f in range(2):
        dc1, _ = object_top1_l2(jnp.asarray(dsc[f]), cdb1, db_chunk=2048)
        sel1 = coarse_select(dc1, jnp.asarray(ok[f]), cfg.radius,
                             cfg.resolved_coarse_slack, cfg.fine_width,
                             cfg.activation.prescreen_top)
        df1, rf1 = object_top1_l2_gathered_xla(jnp.asarray(dsc[f]), db1,
                                               sel1, db_chunk=2048)
        _, det_1 = jax.jit(detect_frame_gathered,
                           static_argnums=(10, 11, 12))(
            keys[f], df1, rf1, sel1, jnp.asarray(ok[f]), jnp.asarray(qp[f]),
            jnp.asarray(xy[f]), db1.points, db1.obj_start, db1.spans,
            cfg.guess, cfg.activation, cfg.radius)
        np.testing.assert_array_equal(np.asarray(det_s.accepted[f]),
                                      np.asarray(det_1.accepted))
        acc = np.asarray(det_1.accepted)
        np.testing.assert_allclose(np.asarray(det_s.T[f])[acc],
                                   np.asarray(det_1.T)[acc], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(det_s.n_inliers[f]),
                                      np.asarray(det_1.n_inliers))
    assert np.asarray(det_s.accepted).any()


def test_sharded_serving_detector_matches_fused_streaming_loop(devices8,
                                                               rng):
    """ShardedServingDetector (the multi-chip STREAMING driver: host state
    for tracked ages, needy-first eviction, the exploration rotation, and
    tracked-pose seeds around serving_step_sharded) evolves each 'data'
    stream exactly like the single-device FusedDetector streaming loop:
    4 frames of the same queries through both must agree bitwise on every
    frame — i.e. the driver's state plumbing (keys, tracked, explore,
    seeds, age/pose updates, last-coarse-sel) is the same state machine."""
    from tod_tpu.geometry.detection import (ActivationConfig, GuessConfig,
                                            AGE_NEVER)
    from tod_tpu.models.fused import (FusedDetectorConfig, _jit_age,
                                      _jit_seeds, _jit_tracked,
                                      _jit_tracked_needy, _jit_update_pose,
                                      _stage_coarse_select,
                                      _stage_geometry_gathered)
    from tod_tpu.ops.pallas.segmented import (object_top1,
                                              object_top1_gathered_xla,
                                              pack_segmented,
                                              subsample_models)
    from tod_tpu.parallel import ShardedServingDetector, make_mesh
    import functools
    import jax as _jax

    mesh = make_mesh(n_data=2, n_db=4)
    models = []
    for i in range(8):
        n = 120 + 17 * i
        desc = rng.integers(0, 256, (n, 32), np.uint8)
        pts = rng.uniform(-0.1, 0.1, (n, 3)).astype(np.float32)
        models.append(TodModel(f"o{i}", desc, pts))
    q_n = 256
    qp = np.full((2, q_n, 3), np.nan, np.float32)
    xy = np.zeros((2, q_n, 2), np.float32)
    dsc = rng.integers(0, 256, (2, q_n, 32), np.uint8)
    ok = np.zeros((2, q_n), bool)
    for f in range(2):
        cursor = 0
        for i in (0, 3, 5):
            m = models[i]
            take = 50
            sel_rows = rng.choice(m.n_points, take, replace=False)
            Rg = np.linalg.qr(rng.normal(size=(3, 3)))[0]
            if np.linalg.det(Rg) < 0:
                Rg[:, 0] *= -1
            Tg = np.array([0.1 * i - 0.3, 0.05 * f, 0.8], np.float32)
            qp[f, cursor:cursor + take] = m.points[sel_rows] @ Rg.T + Tg
            xy[f, cursor:cursor + take] = rng.uniform(30, 600, (take, 2))
            dsc[f, cursor:cursor + take] = m.descriptors[sel_rows]
            ok[f, cursor:cursor + take] = True
            cursor += take
    cfg = FusedDetectorConfig(
        pipeline="segmented", radius=60.0, q_cap=q_n,
        coarse_stride=3, fine_width=12, track_width=2, explore_width=2,
        track_ttl=2,
        activation=ActivationConfig(m_cap=64, n_hypotheses=64,
                                    object_batch=2, prescreen=4),
        guess=GuessConfig(
            ransac=RansacConfig(n_hypotheses=128, min_inliers=8,
                                max_instances=2),
            max_matches_per_object=64, max_active_objects=4,
            object_batch=2))

    with mesh:
        drv = ShardedServingDetector(mesh, models, cfg, seed=0)
        dets_s = []
        for _ in range(4):
            dets_s.append(drv.step(jnp.asarray(xy), jnp.asarray(qp),
                                   jnp.asarray(ok), jnp.asarray(dsc)))

    # single-device reference: the FusedDetector streaming loop (its own
    # jitted state helpers + stage functions) per stream, shard-major order
    by_id = {m.object_id: m for m in models}
    ordered = [by_id[i] for i in drv.object_ids]
    db1 = pack_segmented(ordered, db_chunk=4096)
    cdb1 = pack_segmented(subsample_models(ordered, cfg.coarse_stride),
                          db_chunk=4096)
    c1 = _jax.jit(functools.partial(_stage_coarse_select, cfg=cfg))
    c3 = _jax.jit(functools.partial(_stage_geometry_gathered, cfg=cfg))
    n_coarse = cfg.fine_width - cfg.track_width - cfg.explore_width
    n_obj = len(ordered)
    for b in range(2):
        key = _jax.random.PRNGKey(b)
        age = jnp.full(n_obj, AGE_NEVER, jnp.int32)
        last_r = jnp.zeros((n_obj, 3, 3), jnp.float32)
        last_t = jnp.zeros((n_obj, 3), jnp.float32)
        last_sel = None
        epos = 0
        for t in range(4):
            key, sub = _jax.random.split(key)
            tracked = (_jit_tracked_needy(age, last_sel, cfg.track_width,
                                          cfg.track_ttl)
                       if last_sel is not None else
                       _jit_tracked(age, cfg.track_width, cfg.track_ttl))
            e_ids = jnp.asarray(
                (epos + np.arange(cfg.explore_width)) % n_obj, jnp.int32)
            epos = (epos + cfg.explore_width) % n_obj
            seeds = _jit_seeds(age, last_r, last_t, cfg.track_ttl)
            sel, force, force_act = c1(jnp.asarray(dsc[b]),
                                       jnp.asarray(ok[b]), cdb1, tracked,
                                       e_ids)
            last_sel = sel[:n_coarse]
            df, rf = object_top1_gathered_xla(jnp.asarray(dsc[b]), db1, sel,
                                              db_chunk=4096)
            det_1 = c3(sub, jnp.asarray(xy[b]), jnp.asarray(qp[b]),
                       jnp.asarray(ok[b]), df, rf, sel, db1.points,
                       db1.obj_start, db1.spans, force, force_act, seeds)
            age = _jit_age(age, det_1)
            last_r, last_t = _jit_update_pose(last_r, last_t, det_1)
            det_s = dets_s[t]
            np.testing.assert_array_equal(np.asarray(det_s.accepted[b]),
                                          np.asarray(det_1.accepted))
            np.testing.assert_array_equal(np.asarray(det_s.n_inliers[b]),
                                          np.asarray(det_1.n_inliers))
            acc = np.asarray(det_1.accepted)
            np.testing.assert_allclose(np.asarray(det_s.T[b])[acc],
                                       np.asarray(det_1.T)[acc], atol=1e-6)
    assert any(np.asarray(d.accepted).any() for d in dets_s)
