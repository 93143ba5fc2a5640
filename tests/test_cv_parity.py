"""Head-to-head parity vs the OpenCV-reference oracle (BASELINE.md: "poses
matching the OpenCV reference to sub-millimeter tolerance").

cv_oracle implements the reference pipeline's semantics sequentially on CPU
(cv2.ORB, brute-force Hamming knn+radius, FillAdjacency, graph-RANSAC with
the EXACT clique certificate, refinement + inversion). Feeding BOTH engines
the identical matches isolates the pose math: on clean scenes the accepted
poses must agree to sub-millimeter / sub-0.1-degree.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import cv_oracle
from tod_tpu.geometry.detection import GuessConfig, detect_frame_from_matches
from tod_tpu.geometry.ransac import RansacConfig
from tod_tpu.utils.synthetic import (
    DEFAULT_K,
    SyntheticObject,
    compose_scene,
    facing_pose,
    turntable_observations,
)


@pytest.fixture(scope="module")
def oracle_setup():
    """Train one object with the ORACLE trainer (cv2.ORB), render a clean
    scene, extract cv2.ORB features and exact matches — shared inputs."""
    obj = SyntheticObject.make("parity_obj", seed=31)
    obs = turntable_observations(obj, n_views=10,
                                 elevations_deg=(80.0, 55.0))
    desc_db, pts_db = cv_oracle.train_object(obs, n_features=800)
    assert len(desc_db) > 500

    rng = np.random.default_rng(2)
    gt_R, gt_T = facing_pose(rng, z=0.8, max_tilt=0.25, xy_extent=0.05)
    image, depth = compose_scene([obj], [(gt_R, gt_T)])
    gray = np.asarray(
        0.299 * image[..., 0] + 0.587 * image[..., 1] + 0.114 * image[..., 2]
    ).astype(np.uint8)
    xy, desc_q = cv_oracle.orb(gray, n_features=2000)
    # radius 64 instead of the .ork default 35: cv2.ORB cross-view distances
    # on these synthetic textures sit at ~40-75 (real-camera captures are
    # tighter); both engines receive the identical matches either way
    dist, idx, valid = cv_oracle.match_radius(desc_q, desc_db, radius=64.0)
    depth_m = depth.astype(np.float32) / 1000.0
    qpts = cv_oracle.backproject(depth_m, DEFAULT_K, xy)
    span = float(np.linalg.norm(pts_db.max(0) - pts_db.min(0)))
    return dict(obj=obj, gt=(gt_R, gt_T), xy=xy, dist=dist, idx=idx,
                valid=valid, qpts=qpts, pts_db=pts_db, span=span)


def _pose_diff(Ra, Ta, Rb, Tb):
    dt = float(np.linalg.norm(Ta - Tb))
    tr = (np.trace(Ra @ Rb.T) - 1.0) / 2.0
    ang = float(np.degrees(np.arccos(np.clip(tr, -1.0, 1.0))))
    return dt, ang


def test_estimator_parity_submm():
    """Sub-millimeter head-to-head on clean correspondences: the full
    RANSAC+refinement stacks (oracle sequential vs tod_tpu vmapped) given the
    SAME match set with mm-level noise + 30% outliers must agree to < 1 mm
    and land < 1 mm from ground truth. This isolates the pose math — with
    real cross-view ORB features the correspondence noise itself is ~1.3 cm
    median (see test_pose_parity_cv_features), which no estimator can beat.
    """
    rng = np.random.default_rng(11)
    n = 240
    tpts = rng.uniform(-0.12, 0.12, (n, 3)).astype(np.float32)
    tpts[:, 2] *= 0.02                       # planar-ish object like the ref
    gt_R, _ = facing_pose(rng, z=0.8)
    gt_T = np.array([0.03, -0.02, 0.8])
    qpts = (tpts @ gt_R.T + gt_T).astype(np.float32)
    qpts += rng.normal(0, 3e-4, qpts.shape).astype(np.float32)  # 0.3 mm
    n_out = int(0.3 * n)
    qpts[:n_out] = rng.uniform(-0.3, 0.3, (n_out, 3)) + [0, 0, 0.8]
    qxy = rng.uniform(0, 640, (n, 2)).astype(np.float32)
    qidx = np.arange(n, dtype=np.int32)
    span = float(np.linalg.norm(tpts.max(0) - tpts.min(0)))

    poses = cv_oracle.detect_object(np.random.default_rng(7), qpts, tpts,
                                    qxy, qidx, span, n_iterations=400)
    assert poses
    o = max(poses, key=lambda p: p.n_unique)

    cfg = GuessConfig(ransac=RansacConfig(n_hypotheses=512, min_inliers=8,
                                          sensor_error=0.01),
                      max_matches_per_object=256, max_active_objects=1)
    _, det = detect_frame_from_matches(
        jax.random.PRNGKey(3), jnp.zeros((n, 1), jnp.int32),
        jnp.zeros((n, 1)), jnp.ones((n, 1), bool),
        jnp.asarray(tpts[:, None, :]), jnp.asarray(qpts),
        jnp.asarray(qxy), jnp.asarray([span], jnp.float32), cfg)
    acc = np.asarray(det.accepted[0])
    assert acc.any()
    bi = int(np.argmax(np.where(acc, np.asarray(det.n_inliers[0]), -1)))
    t_R, t_T = np.asarray(det.R[0, bi]), np.asarray(det.T[0, bi])

    for (Ra, Ta, name) in ((o.R, o.T, "oracle"), (t_R, t_T, "tod_tpu")):
        dt, ang = _pose_diff(Ra, Ta, gt_R, gt_T)
        assert dt < 1e-3, f"{name} {dt * 1000:.3f} mm off ground truth"
    dt, ang = _pose_diff(o.R, o.T, t_R, t_T)
    assert dt < 1e-3, f"head-to-head differs by {dt * 1000:.3f} mm"
    assert ang < 0.2, f"head-to-head rotation differs by {ang:.4f} deg"


def test_pose_parity_cv_features(oracle_setup):
    """Head-to-head on REAL cv2.ORB features. The correspondence noise floor
    (cross-view cv2.ORB keypoint localization) is ~1.3 cm median on this
    scene, so the two engines' independently-selected inlier sets bound the
    agreement at the cm level; sub-mm parity is asserted on clean
    correspondences in test_estimator_parity_submm."""
    s = oracle_setup
    q, k = s["idx"].shape
    gt_R, gt_T = s["gt"]

    # --- oracle: sequential reference-semantics detection -----------------
    flat_valid = s["valid"] & np.isfinite(s["qpts"]).all(-1)[:, None]
    rows = np.nonzero(flat_valid)
    qidx = rows[0].astype(np.int32)
    qpts_m = s["qpts"][rows[0]]
    tpts_m = s["pts_db"][s["idx"][rows]]
    qxy_m = s["xy"][rows[0]]
    rng = np.random.default_rng(9)
    poses = cv_oracle.detect_object(rng, qpts_m, tpts_m, qxy_m, qidx,
                                    s["span"], n_iterations=600)
    assert poses, "oracle found no pose (bad test setup)"
    o_best = max(poses, key=lambda p: p.n_unique)
    dt_gt, ang_gt = _pose_diff(o_best.R, o_best.T, gt_R, gt_T)
    assert dt_gt < 0.02, f"oracle pose {dt_gt:.4f} m off ground truth"

    # --- tod_tpu: the same matches through the jitted geometry ------------
    obj_idx = np.where(flat_valid, 0, -1).astype(np.int32)
    train_pts = s["pts_db"][np.maximum(s["idx"], 0)].astype(np.float32)
    cfg = GuessConfig(
        ransac=RansacConfig(n_hypotheses=1024, min_inliers=8,
                            sensor_error=0.01),
        max_matches_per_object=1024, max_active_objects=1)
    _, det = detect_frame_from_matches(
        jax.random.PRNGKey(3), jnp.asarray(obj_idx),
        jnp.asarray(s["dist"]), jnp.asarray(flat_valid),
        jnp.asarray(train_pts), jnp.asarray(s["qpts"]),
        jnp.asarray(s["xy"]), jnp.asarray([s["span"]], jnp.float32), cfg)
    acc = np.asarray(det.accepted[0])
    assert acc.any(), "tod_tpu found no pose on oracle matches"
    best_i = int(np.argmax(np.where(acc, np.asarray(det.n_inliers[0]), -1)))
    t_R = np.asarray(det.R[0, best_i])
    t_T = np.asarray(det.T[0, best_i])

    # --- head-to-head at the correspondence noise floor -------------------
    dt, ang = _pose_diff(o_best.R, o_best.T, t_R, t_T)
    assert dt < 0.01, f"pose translation differs by {dt * 1000:.3f} mm"
    assert ang < 5.0, f"pose rotation differs by {ang:.4f} deg"
    dt_gt2, _ = _pose_diff(t_R, t_T, gt_R, gt_T)
    assert dt_gt2 < 0.02, f"tod_tpu pose {dt_gt2:.4f} m off ground truth"


def test_oracle_multi_instance_invalidation(oracle_setup):
    """After accepting the first instance its keypoints are invalidated:
    any further instance must reuse none of them (reference contract)."""
    s = oracle_setup
    flat_valid = s["valid"] & np.isfinite(s["qpts"]).all(-1)[:, None]
    rows = np.nonzero(flat_valid)
    qidx = rows[0].astype(np.int32)
    rng = np.random.default_rng(4)
    poses = cv_oracle.detect_object(
        rng, s["qpts"][rows[0]], s["pts_db"][s["idx"][rows]],
        s["xy"][rows[0]], qidx, s["span"], n_iterations=400,
        max_instances=3)
    seen = set()
    for p in poses:
        kps = set(qidx[p.inliers].tolist())
        assert not (kps & seen)
        seen |= kps
