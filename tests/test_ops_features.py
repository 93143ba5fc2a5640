"""Golden tests: FAST/Harris/ORB kernels vs OpenCV, matching vs numpy oracle."""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from tod_tpu.ops.fast import (
    fast_score,
    features_per_level,
    harris_response,
    nms3x3,
    select_topk_keypoints,
)
from tod_tpu.ops.matching import (
    hamming_topk,
    l2_topk,
    pad_db,
    popcount_rows,
    radius_truncate,
    unpack_bits,
)
from tod_tpu.ops.orb import (
    Keypoints,
    brief_descriptors,
    brief_pattern,
    keypoint_angles,
    orb_detect_and_compute,
)


@pytest.fixture(scope="module")
def textured():
    """A deterministic textured test image (smoothed noise + blobs)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (120, 160), dtype=np.uint8)
    img = cv2.GaussianBlur(img, (5, 5), 1.2)
    cv2.circle(img, (50, 60), 14, 255, -1)
    cv2.rectangle(img, (90, 30), (130, 70), 0, -1)
    return img


def test_fast_corner_set_matches_opencv(textured):
    img = textured
    t = 20
    score, is_corner = fast_score(jnp.asarray(img, dtype=jnp.float32), t)
    ours = np.asarray(is_corner)
    det = cv2.FastFeatureDetector_create(
        threshold=t, nonmaxSuppression=False,
        type=cv2.FAST_FEATURE_DETECTOR_TYPE_9_16)
    ref = np.zeros_like(ours)
    for kp in det.detect(img):
        ref[int(kp.pt[1]), int(kp.pt[0])] = True
    # interior only (our border handling is masked; OpenCV also insets by 3)
    inner = np.s_[4:-4, 4:-4]
    mism = (ours[inner] != ref[inner])
    assert mism.sum() == 0, f"{mism.sum()} mismatching corner pixels"


def test_fast_score_matches_opencv_ranking(textured):
    img = textured
    det = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=True)
    kps = det.detect(img)
    score, _ = fast_score(jnp.asarray(img, dtype=jnp.float32), 20)
    score = np.asarray(score)
    # OpenCV's nms-surviving corners should also survive our nms
    nms = np.asarray(nms3x3(jnp.asarray(score)))
    hits = sum(nms[int(kp.pt[1]), int(kp.pt[0])] for kp in kps)
    assert hits >= 0.9 * len(kps)
    # and scores should track OpenCV's response (same quantity)
    resp_ref = np.array([kp.response for kp in kps])
    resp_ours = np.array([score[int(kp.pt[1]), int(kp.pt[0])] for kp in kps])
    assert np.abs(resp_ref - resp_ours).max() <= 1.0


def test_harris_ranks_corners_over_edges():
    img = np.zeros((64, 64), np.float32)
    img[20:44, 20:44] = 200.0  # square: 4 corners + edges
    h = np.asarray(harris_response(jnp.asarray(img)))
    corner = h[20, 20]
    edge = h[32, 20]
    flat = h[10, 10]
    assert corner > 0 and corner > 5 * abs(edge)
    assert edge < 0  # edges have negative Harris response
    assert abs(flat) < 1e-6


def test_features_per_level_budget():
    counts = features_per_level(500, 3, 1.2)
    assert sum(counts) == 500
    assert counts[0] > counts[1] > counts[2] > 0


def test_select_topk_masks_and_pads(textured):
    img = jnp.asarray(textured, dtype=jnp.float32)
    score, is_corner = fast_score(img, 20)
    harris = harris_response(img)
    xy, resp, valid = select_topk_keypoints(score, harris, is_corner, 2000,
                                            edge_threshold=31)
    assert xy.shape == (2000, 2)
    n_valid = int(np.asarray(valid).sum())
    assert 10 < n_valid < 2000  # padded
    v_xy = np.asarray(xy)[np.asarray(valid)]
    assert (v_xy >= 31).all()
    assert (v_xy[:, 0] < 160 - 31).all() and (v_xy[:, 1] < 120 - 31).all()


def test_orientation_matches_opencv(textured):
    """Our intensity-centroid angle should match cv::ORB's within a few deg."""
    img = textured
    orb = cv2.ORB_create(nfeatures=50, nlevels=1, edgeThreshold=31)
    kps = orb.detect(img)
    if not kps:
        pytest.skip("no opencv keypoints")
    xy = np.array([[int(round(k.pt[0])), int(round(k.pt[1]))] for k in kps],
                  np.int32)
    ours = np.degrees(np.asarray(
        keypoint_angles(jnp.asarray(img, jnp.float32), jnp.asarray(xy)))) % 360
    ref = np.array([k.angle for k in kps])
    delta = np.abs((ours - ref + 180) % 360 - 180)
    assert np.median(delta) < 5.0


def test_brief_pattern_deterministic():
    p1 = brief_pattern()
    p2 = brief_pattern()
    assert p1 is p2  # cached
    assert p1.shape == (256, 2, 2)
    assert np.abs(p1).max() <= 13
    assert not (p1[:, 0] == p1[:, 1]).all(axis=1).any()


def test_brief_descriptor_rotation_invariance(textured):
    """Descriptors of the same patch under image rotation should be close in
    Hamming distance when steered by the measured angle."""
    img = textured.astype(np.float32)
    center = (80, 60)
    rot = cv2.getRotationMatrix2D(center, 30.0, 1.0)
    img_r = cv2.warpAffine(img, rot, (160, 120), flags=cv2.INTER_LINEAR)

    xy = np.array([[80, 60]], np.int32)
    from tod_tpu.ops.image import gaussian_blur

    def describe(image):
        j = jnp.asarray(image)
        ang = keypoint_angles(j, jnp.asarray(xy))
        return np.asarray(brief_descriptors(gaussian_blur(j), jnp.asarray(xy),
                                            ang))[0]

    d0 = describe(img)
    d1 = describe(img_r)
    dist = np.unpackbits(d0 ^ d1).sum()
    assert dist < 80  # well below the ~128 expectation for unrelated patches


def test_orb_detect_and_compute_shapes(textured):
    kps, desc = orb_detect_and_compute(jnp.asarray(textured, jnp.float32),
                                       n_features=300, n_levels=3,
                                       scale_factor=1.2)
    assert kps.xy.shape == (300, 2)
    assert desc.shape == (300, 32)
    assert desc.dtype == jnp.uint8
    n_valid = int(np.asarray(kps.valid).sum())
    assert n_valid > 20
    # valid keypoints must carry nonzero descriptors
    v = np.asarray(kps.valid)
    assert (np.asarray(desc)[v].sum(axis=1) > 0).all()
    # level-0 coords scale with the level
    lv = np.asarray(kps.level)[v]
    assert lv.max() >= 1  # multiple levels contribute


def test_orb_mask_restricts_detection(textured):
    mask = np.zeros_like(textured)
    mask[:, :80] = 1
    kps, _ = orb_detect_and_compute(jnp.asarray(textured, jnp.float32),
                                    n_features=200, mask=jnp.asarray(mask))
    v = np.asarray(kps.valid)
    assert v.sum() > 0
    assert (np.asarray(kps.xy)[v, 0] <= 82).all()  # level rounding slack


# ---------------------------------------------------------------------------
# Matching
# ---------------------------------------------------------------------------


def test_unpack_bits_roundtrip(rng):
    d = rng.integers(0, 256, (10, 32), dtype=np.uint8)
    bits = np.asarray(unpack_bits(jnp.asarray(d), jnp.float32))
    ref = np.unpackbits(d, axis=1, bitorder="little")
    np.testing.assert_array_equal(bits, ref)
    np.testing.assert_array_equal(np.asarray(popcount_rows(jnp.asarray(d))),
                                  ref.sum(1))


def _brute_hamming(q, db):
    qb = np.unpackbits(q, axis=1, bitorder="little").astype(np.int32)
    db_b = np.unpackbits(db, axis=1, bitorder="little").astype(np.int32)
    return (qb[:, None, :] != db_b[None, :, :]).sum(-1)


def test_hamming_topk_exact(rng):
    q = rng.integers(0, 256, (64, 32), dtype=np.uint8)
    db = rng.integers(0, 256, (1000, 32), dtype=np.uint8)
    db_p, n = pad_db(db, 256)
    dist, idx = hamming_topk(jnp.asarray(q), jnp.asarray(db_p), n, k=5,
                             chunk=256)
    dist, idx = np.asarray(dist), np.asarray(idx)
    ref = _brute_hamming(q, db)
    ref_sorted = np.sort(ref, axis=1)[:, :5]
    np.testing.assert_array_equal(dist.astype(np.int32), ref_sorted)
    # indices must realize those distances
    for i in range(64):
        np.testing.assert_array_equal(ref[i, idx[i]], dist[i].astype(np.int32))


def test_radius_truncate_contract(rng):
    dist = jnp.asarray([[1.0, 10.0, 40.0, 50.0, 60.0]])
    idx = jnp.asarray([[3, 5, 7, 9, 11]], jnp.int32)
    m = radius_truncate(dist, idx, 35.0, jnp.asarray([True]))
    np.testing.assert_array_equal(np.asarray(m.valid),
                                  [[True, True, False, False, False]])


def test_l2_topk_exact(rng):
    q = rng.normal(size=(16, 64)).astype(np.float32)
    db = rng.normal(size=(512, 64)).astype(np.float32)
    dist, idx = l2_topk(jnp.asarray(q), jnp.asarray(db), 512, k=3, chunk=128)
    ref = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    ref_idx = np.argsort(ref, axis=1)[:, :3]
    ref_d = np.take_along_axis(ref, ref_idx, 1)
    np.testing.assert_allclose(np.asarray(dist), ref_d, rtol=1e-4, atol=1e-4)


def test_subpixel_offsets_recover_parabola_peak(rng):
    """subpixel_offsets finds the continuous peak of a quadratic score bump
    and clamps to +-0.5px."""
    import jax.numpy as jnp

    from tod_tpu.ops.fast import subpixel_offsets

    h, w = 64, 64
    true = np.array([[30.3, 40.6], [10.0, 12.0]])   # (x, y) continuous peaks
    ys, xs = np.mgrid[0:h, 0:w]
    score = np.zeros((h, w), np.float32)
    for tx, ty in true:
        score += np.maximum(0.0, 25.0 - ((xs - tx) ** 2 + (ys - ty) ** 2))
    xy = jnp.asarray(np.round(true).astype(np.int32))          # (2,2) int
    off = np.asarray(subpixel_offsets(jnp.asarray(score), xy))
    refined = np.round(true) + off
    np.testing.assert_allclose(refined, true, atol=0.05)
    assert (np.abs(off) <= 0.5).all()


def test_subpixel_off_by_default(rng):
    """Default extraction reports integer keypoint coords (trainer snap
    parity); subpixel=True produces fractional ones."""
    from tod_tpu.ops.orb import orb_detect_and_compute

    img = jnp.asarray(rng.uniform(0, 255, (120, 160)), jnp.float32)
    # single level: higher levels scale coords by 1.2^l (fractional anyway)
    kps, _ = orb_detect_and_compute(img, n_features=100, n_levels=1)
    xy = np.asarray(kps.xy)[np.asarray(kps.valid)]
    np.testing.assert_array_equal(xy, np.round(xy))
    kps_s, _ = orb_detect_and_compute(img, n_features=100, n_levels=1,
                                      subpixel=True)
    xy_s = np.asarray(kps_s.xy)[np.asarray(kps_s.valid)]
    assert (np.abs(xy_s - np.round(xy_s)) > 1e-6).any()
