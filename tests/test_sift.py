"""SIFT/float descriptor path: invariance sanity + the full end-to-end
train -> detect flow through the cell graph with L2 matching (the
reference's ``type: SIFT`` config option, doc/source/index.rst:45)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tod_tpu.utils.synthetic import (
    DEFAULT_K,
    SyntheticObject,
    compose_scene,
    facing_pose,
    turntable_observations,
)


def test_sift_rotation_invariance():
    """Descriptors of the same physical points under a 30-degree in-plane
    rotation must be much closer than unrelated descriptors."""
    from scipy.spatial import cKDTree

    from tod_tpu.ops.sift import sift_detect_and_compute
    from tod_tpu.utils.synthetic import render_plane

    obj = SyntheticObject.make("s", seed=77)
    K = DEFAULT_K

    def render(deg):
        a = np.radians(deg)
        R = np.array([[np.cos(a), -np.sin(a), 0],
                      [np.sin(a), np.cos(a), 0], [0, 0, 1]])
        T = np.array([0.0, 0.0, 0.8])
        canvas, _, _ = render_plane(obj.texture, obj.size_m, R, T, K,
                                    (480, 640))
        return canvas.astype(np.float32), R, T

    base, R0, T0 = render(0)
    kps0, d0 = sift_detect_and_compute(jnp.asarray(base), n_features=400)
    v0 = np.asarray(kps0.valid)
    xy0 = np.asarray(kps0.xy)[v0]
    d0 = np.asarray(d0)[v0]
    img, R1, T1 = render(30)
    kps1, d1 = sift_detect_and_compute(jnp.asarray(img), n_features=400)
    v1 = np.asarray(kps1.valid)
    xy1 = np.asarray(kps1.xy)[v1]
    d1 = np.asarray(d1)[v1]

    rays = np.concatenate([(xy0 - [K[0, 2], K[1, 2]]) / [K[0, 0], K[1, 1]],
                           np.ones((len(xy0), 1))], 1)
    lam = (R0.T @ T0)[2] / (rays @ R0[:, 2])
    obj_pts = (rays * lam[:, None] - T0) @ R0
    cam1 = obj_pts @ R1.T + T1
    pix1 = cam1 @ K.T
    pix1 = pix1[:, :2] / pix1[:, 2:3]
    dd, ii = cKDTree(xy1).query(pix1, k=1)
    ok = dd < 1.0
    assert ok.sum() > 50
    same = np.linalg.norm(d0[ok] - d1[ii[ok]], axis=1)
    rng = np.random.default_rng(0)
    rand = np.linalg.norm(
        d0[ok] - d1[rng.integers(0, len(d1), int(ok.sum()))], axis=1)
    # corresponding descriptors must be clearly below the unrelated cloud
    assert np.median(same) < 0.6 * np.median(rand), \
        f"same {np.median(same):.3f} vs random {np.median(rand):.3f}"


def test_segmented_l2_matches_numpy():
    """The L2 segmented per-(query, object) top-1 (XLA path on CPU) equals
    a numpy brute force over the same int8-quantized descriptors, including
    the lowest-row tie rule, across uneven object sizes."""
    from tod_tpu.db.models import TodModel
    from tod_tpu.ops.pallas.segmented_l2 import (QUANT_SCALE, object_top1_l2,
                                                 pack_segmented_l2,
                                                 quantize_descriptors)

    rng = np.random.default_rng(11)
    # the zero-row model pins the PAD_NORM arithmetic: 2^28 + small ints is
    # not f32-representable, so the XLA path must add norms in int32 to
    # stay bitwise-equal to the kernel (and to this int32 brute force)
    sizes = [700, 130, 1500, 1, 0]
    models = []
    for o, n in enumerate(sizes):
        d = rng.random((n, 128)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        models.append(TodModel(f"m{o}", d,
                               rng.random((n, 3)).astype(np.float32)))
    db = pack_segmented_l2(models, db_chunk=256)

    q = rng.random((128, 128)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    # force exact ties: query 0 duplicates model-2 row 40, which itself is
    # duplicated at rows 40 and 41 -> the tie rule must report row 40
    models[2].descriptors[41] = models[2].descriptors[40]
    q[0] = models[2].descriptors[40]
    db = pack_segmented_l2(models, db_chunk=256)

    qi = np.asarray(quantize_descriptors(jnp.asarray(q)))
    dist, row = object_top1_l2(jnp.asarray(qi), db)
    dist, row = np.asarray(dist), np.asarray(row)

    from tod_tpu.ops.pallas.segmented_l2 import PAD_NORM

    for o, m in enumerate(models):
        if m.n_points == 0:
            # zero-row object: only PAD_NORM rows exist; the reported
            # distance must be exactly sqrt(q_norm + 2^28)/scale, bitwise
            # identical between kernel and XLA int32 arithmetic
            qn = (qi.astype(np.int64) ** 2).sum(-1)
            np.testing.assert_array_equal(
                dist[:, o].astype(np.float64) ** 2 * QUANT_SCALE ** 2
                > PAD_NORM / 2, True)
            np.testing.assert_allclose(
                dist[:, o], np.sqrt(qn + PAD_NORM) / QUANT_SCALE, rtol=1e-6)
            np.testing.assert_array_equal(row[:, o], 0)
            continue
        di = np.clip(np.round(m.descriptors * QUANT_SCALE), 0,
                     127).astype(np.int32)
        d2 = ((qi.astype(np.int32)[:, None, :] - di[None, :, :]) ** 2
              ).sum(-1)
        ref_rows = d2.argmin(1)                      # argmin = lowest index
        np.testing.assert_allclose(
            dist[:, o], np.sqrt(d2.min(1)) / QUANT_SCALE, rtol=1e-6)
        np.testing.assert_array_equal(row[:, o], ref_rows)
    assert row[0, 2] == 40 and dist[0, 2] == 0.0


@pytest.mark.slow
def test_sift_segmented_serving_e2e():
    """The segmented serving pipeline on the SIFT/L2 path: float models are
    int8-quantized into the L2 segmented kernel, two-tier geometry runs on
    plain-L2 distances, and the pose is recovered (the detection.ros.ork
    SIFT pipeline served TPU-native)."""
    from tod_tpu.db import InMemoryDb, insert_observation, load_models_for_objects
    from tod_tpu.geometry.detection import ActivationConfig, GuessConfig
    from tod_tpu.geometry.ransac import RansacConfig
    from tod_tpu.models import TodTrainer
    from tod_tpu.models.fused import FusedDetector, FusedDetectorConfig

    InMemoryDb.reset_shared()
    db = InMemoryDb.shared("sift_seg")
    hw = (240, 320)
    K = DEFAULT_K.copy()
    K[:2] //= 2
    obj = SyntheticObject.make("sift_sobj", seed=56)
    for obs in turntable_observations(obj, n_views=8,
                                      elevations_deg=(75.0, 55.0),
                                      hw=hw, K=K):
        insert_observation(db, "sift_sobj", obs["frame_number"],
                           obs["image"], obs["depth"], obs["mask"],
                           obs["K"], obs["R"], obs["T"])
    TodTrainer(
        "t", object_id="sift_sobj",
        json_db=json.dumps({"type": "mem", "collection": "sift_seg"}),
        json_feature_params=json.dumps(
            {"type": "SIFT", "n_features": 400})).process()
    models = load_models_for_objects(db, "all")

    rng = np.random.default_rng(4)
    gt_R, gt_T = facing_pose(rng, z=0.75, max_tilt=0.25, xy_extent=0.05)
    image, depth = compose_scene([obj], [(gt_R, gt_T)], hw=hw, K=K)

    cfg = FusedDetectorConfig(
        n_features=800, feature="SIFT", pipeline="segmented",
        q_cap=512, radius=0.9,
        activation=ActivationConfig(m_cap=128, n_hypotheses=128),
        guess=GuessConfig(
            ransac=RansacConfig(n_hypotheses=512, min_inliers=8,
                                sensor_error=0.01, tight_final_fit=True),
            max_active_objects=1))
    det = FusedDetector(models, cfg)
    results = det.detect(image, depth, K)
    assert results, "no pose through the SIFT segmented serving path"
    best = max(results, key=lambda r: r.confidence)
    assert np.linalg.norm(best.T - gt_T) < 0.02

    # the same detection through the SIFT serving .ork (L5/L6 surface):
    # identical config + seed -> identical poses
    import os

    from tod_tpu.pipeline.ork import build_pipeline_from_ork

    conf = os.path.join(os.path.dirname(__file__), "..", "conf",
                        "detection.sift.serving.ork")
    p = build_pipeline_from_ork(conf, overrides={
        "source1": {"frames": [{"image": image, "depth": depth, "K": K}]},
        "pipeline1": {
            "db": {"type": "mem", "collection": "sift_seg"},
            "feature": {"type": "SIFT", "n_features": 800},
            "q_cap": 512, "n_ransac_iterations": 512, "min_inliers": 8,
            "max_active_objects": 1, "activation_m_cap": 128,
            "activation_hypotheses": 128, "activation_prescreen": 0,
            # match the direct config's RansacConfig/GuessConfig defaults
            "max_instances": 5, "max_matches_per_object": 512,
            # neutralize serving extras so the parity target is cfg above
            # (min_quality: the shipped .ork gates on fused confidence)
            "bucket_grid": "", "min_confidence": 0, "min_quality": 0},
    })
    p.execute(1)
    ork_results = p.cells["pipeline1"].outputs["pose_results"]
    assert ork_results, "no pose through the SIFT serving .ork"
    key = lambda r: (r.object_id, round(float(r.confidence)))
    assert sorted(map(key, ork_results)) == sorted(map(key, results))
    for a, b in zip(sorted(ork_results, key=key), sorted(results, key=key)):
        np.testing.assert_allclose(a.T, b.T, atol=1e-5)


@pytest.mark.slow
def test_sift_train_detect_e2e():
    """Full float path: SIFT training -> model DB (float32 attachments) ->
    TodDetector cell graph with L2 search -> pose recovered."""
    from tod_tpu.db import InMemoryDb, insert_observation, load_models_for_objects
    from tod_tpu.models import TodDetector, TodTrainer

    InMemoryDb.reset_shared()
    db = InMemoryDb.shared("sift_e2e")
    hw = (240, 320)
    K = DEFAULT_K.copy()
    K[:2] //= 2
    obj = SyntheticObject.make("sift_obj", seed=55)
    for obs in turntable_observations(obj, n_views=8,
                                      elevations_deg=(75.0, 55.0),
                                      hw=hw, K=K):
        insert_observation(db, "sift_obj", obs["frame_number"], obs["image"],
                           obs["depth"], obs["mask"], obs["K"], obs["R"],
                           obs["T"])
    TodTrainer(
        "t", object_id="sift_obj",
        json_db=json.dumps({"type": "mem", "collection": "sift_e2e"}),
        json_feature_params=json.dumps(
            {"type": "SIFT", "n_features": 400})).process()
    models = load_models_for_objects(db, "all")
    assert models[0].descriptors.dtype == np.float32
    assert models[0].descriptors.shape[1] == 128

    rng = np.random.default_rng(3)
    gt_R, gt_T = facing_pose(rng, z=0.75, max_tilt=0.25, xy_extent=0.05)
    image, depth = compose_scene([obj], [(gt_R, gt_T)], hw=hw, K=K)

    det = TodDetector(
        "detector",
        json_feature_params=json.dumps({"type": "SIFT", "n_features": 800}),
        search=json.dumps({"type": "L2", "radius": 0.9}),
        json_db=json.dumps({"type": "mem", "collection": "sift_e2e"}),
        n_ransac_iterations=512, min_inliers=8, sensor_error=0.01)
    det.inputs["image"] = image
    det.inputs["depth"] = depth
    det.inputs["K_image"] = K
    det.inputs["mask"] = None
    det.process()
    poses = det.outputs["pose_results"]
    assert poses, "no pose found through the SIFT/L2 path"
    best = max(poses, key=lambda p: p.confidence)
    assert np.linalg.norm(best.T - gt_T) < 0.02


def _l2_models(rng, sizes):
    from tod_tpu.db.models import TodModel

    models = []
    for o, n in enumerate(sizes):
        d = rng.random((n, 128)).astype(np.float32)
        d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-9)
        models.append(TodModel(f"m{o}", d,
                               rng.random((n, 3)).astype(np.float32)))
    return models


def test_l2_gathered_interpret_matches_xla():
    """The gathered L2 fine-pass kernel (interpret mode on CPU) is bitwise
    equal to the XLA full-sweep gather: holes, out-of-order selection,
    multi-chunk / single-row / zero-row objects."""
    from tod_tpu.ops.pallas.segmented_l2 import (
        HOLE_ROW_L2, max_chunks_per_object_f, object_top1_l2_gathered_fused,
        object_top1_l2_gathered_xla, object_top1_l2_xla, pack_segmented_l2,
        quantize_descriptors)

    rng = np.random.default_rng(23)
    models = _l2_models(rng, [500, 1100, 64, 1, 0])
    db = pack_segmented_l2(models, db_chunk=256)
    q = rng.random((128, 128)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qi = jnp.asarray(quantize_descriptors(jnp.asarray(q)))
    maxc = max_chunks_per_object_f(db)
    assert maxc == 5  # 1100 rows / 256 chunk

    sel = jnp.asarray(np.array([3, -1, 0, 4, 2], np.int32))
    d_x, i_x = object_top1_l2_gathered_xla(qi, db, sel, db_chunk=256)
    d_f, i_f = object_top1_l2_gathered_fused(qi, db, sel, maxc, q_tile=128)
    np.testing.assert_array_equal(np.asarray(d_x), np.asarray(d_f))
    np.testing.assert_array_equal(np.asarray(i_x), np.asarray(i_f))
    assert (np.asarray(i_f)[:, 1] == HOLE_ROW_L2).all()
    d_full, i_full = object_top1_l2_xla(qi, db, db_chunk=256)
    # hole slots report exactly the never-taken-lane value (beyond any
    # real distance)
    assert (np.asarray(d_f)[:, 1] > np.asarray(d_full).max()).all()
    for c, o in enumerate([3, -1, 0, 4, 2]):
        if o < 0:
            continue
        np.testing.assert_array_equal(np.asarray(d_f)[:, c],
                                      np.asarray(d_full)[:, o])
        np.testing.assert_array_equal(np.asarray(i_f)[:, c],
                                      np.asarray(i_full)[:, o])


def test_l2_gathered_under_jit_with_traced_sel():
    """The coarse screen computes the selection inside jit; the L2 gathered
    kernel's scalar-prefetch operands must trace."""
    import jax

    from tod_tpu.ops.pallas.segmented_l2 import (
        max_chunks_per_object_f, object_top1_l2_gathered, object_top1_l2_xla,
        pack_segmented_l2, quantize_descriptors)

    rng = np.random.default_rng(29)
    models = _l2_models(rng, [300, 700, 77])
    db = pack_segmented_l2(models, db_chunk=256)
    q = rng.random((128, 128)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qi = jnp.asarray(quantize_descriptors(jnp.asarray(q)))
    maxc = max_chunks_per_object_f(db)

    @jax.jit
    def run(qq, order_scores):
        _, sel = jax.lax.top_k(order_scores, 2)
        return object_top1_l2_gathered(qq, db, sel.astype(jnp.int32), maxc)

    d, _ = run(qi, jnp.asarray([0.1, 0.9, 0.5]))
    d_full, _ = object_top1_l2_xla(qi, db, db_chunk=256)
    np.testing.assert_array_equal(np.asarray(d)[:, 0],
                                  np.asarray(d_full)[:, 1])
    np.testing.assert_array_equal(np.asarray(d)[:, 1],
                                  np.asarray(d_full)[:, 2])


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="compiled Mosaic kernel needs TPU")
def test_l2_gathered_compiled_matches_xla_on_tpu():
    from tod_tpu.ops.pallas.segmented_l2 import (
        max_chunks_per_object_f, object_top1_l2_gathered_fused,
        object_top1_l2_gathered_xla, pack_segmented_l2,
        quantize_descriptors)

    rng = np.random.default_rng(31)
    models = _l2_models(rng, [9000, 5000, 12000, 100, 6000])
    db = pack_segmented_l2(models)
    q = rng.random((1024, 128)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qi = jnp.asarray(quantize_descriptors(jnp.asarray(q)))
    maxc = max_chunks_per_object_f(db)
    sel = jnp.asarray(np.array([4, 2, -1, 0], np.int32))
    d_x, i_x = jax.jit(
        lambda qq: object_top1_l2_gathered_xla(qq, db, sel))(qi)
    d_f, i_f = jax.jit(
        lambda qq: object_top1_l2_gathered_fused(qq, db, sel, maxc))(qi)
    np.testing.assert_array_equal(np.asarray(d_x), np.asarray(d_f))
    np.testing.assert_array_equal(np.asarray(i_x), np.asarray(i_f))


def test_sift_coarse_fine_fused_detector():
    """SIFT/L2 coarse->fine serving end to end: train a SIFT model through
    the real trainer, detect with coarse_stride > 0 (coarse subsampled L2
    sweep -> gathered exact fine pass -> slab geometry), pose recovered."""
    from tod_tpu.db import (InMemoryDb, insert_observation,
                            load_models_for_objects)
    from tod_tpu.geometry.detection import ActivationConfig, GuessConfig
    from tod_tpu.geometry.ransac import RansacConfig
    from tod_tpu.models import FusedDetector, FusedDetectorConfig, TodTrainer

    InMemoryDb.reset_shared()
    db = InMemoryDb.shared("sift_cf")
    hw = (240, 320)
    K = DEFAULT_K.copy()
    K[:2] //= 2
    obj = SyntheticObject.make("sift_cf_obj", seed=56)
    for obs in turntable_observations(obj, n_views=6,
                                      elevations_deg=(65.0,),
                                      hw=hw, K=K):
        insert_observation(db, "sift_cf_obj", obs["frame_number"],
                           obs["image"], obs["depth"], obs["mask"],
                           obs["K"], obs["R"], obs["T"])
    TodTrainer(
        "t", object_id="sift_cf_obj",
        json_db=json.dumps({"type": "mem", "collection": "sift_cf"}),
        json_feature_params=json.dumps(
            {"type": "SIFT", "n_features": 400})).process()
    models = load_models_for_objects(db, "all")

    rng = np.random.default_rng(4)
    gt_R, gt_T = facing_pose(rng, z=0.75, max_tilt=0.25, xy_extent=0.05)
    image, depth = compose_scene([obj], [(gt_R, gt_T)], hw=hw, K=K)

    cfg = FusedDetectorConfig(
        feature="SIFT", pipeline="segmented", n_features=800, q_cap=512,
        radius=0.9, coarse_stride=2, fine_width=1,
        activation=ActivationConfig(m_cap=128, n_hypotheses=128),
        guess=GuessConfig(ransac=RansacConfig(
            n_hypotheses=512, min_inliers=8, sensor_error=0.01),
            max_active_objects=1))
    det = FusedDetector(models, cfg)
    assert det._coarse is not None
    results = det.detect(image, depth, K)
    assert results, "no pose through the SIFT coarse->fine path"
    best = max(results, key=lambda p: p.confidence)
    assert np.linalg.norm(best.T - gt_T) < 0.02
    InMemoryDb.reset_shared()
