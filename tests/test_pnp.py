"""2D-only path: quartic solver, P3P vs ground truth / cv2.solvePnP oracle,
reprojection RANSAC, and the end-to-end depthless detection the reference
never implemented (GuessGenerator.cpp:147-152, doc/source/index.rst:46)."""

import json

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tod_tpu.geometry.detection2d import Pnp2dConfig, detect_frame_2d
from tod_tpu.geometry.pnp import p3p, project, solve_quartic

K = np.array([[525.0, 0, 319.5], [0, 525.0, 239.5], [0, 0, 1]], np.float32)


def _random_pose(rng, z=0.9):
    ax = rng.uniform(-0.4, 0.4, 3)
    R, _ = cv2.Rodrigues(ax)
    T = np.array([rng.uniform(-0.15, 0.15), rng.uniform(-0.15, 0.15), z])
    return R.astype(np.float32), T.astype(np.float32)


def _bearings(uv):
    b = np.concatenate([(uv - K[:2, 2]) / np.diag(K)[:2],
                        np.ones((len(uv), 1))], 1)
    return (b / np.linalg.norm(b, axis=1, keepdims=True)).astype(np.float32)


def test_quartic_finds_all_real_roots(rng):
    for _ in range(50):
        n_real = int(rng.choice([0, 2, 4]))
        roots = np.sort(rng.uniform(-3, 3, n_real))
        cplx = [complex(1, 1), complex(1, -1)] * ((4 - n_real) // 2)
        coeffs = np.real(np.poly(list(roots) + cplx)).astype(np.float64)
        r, v = solve_quartic(*[jnp.asarray(c) for c in coeffs])
        found = np.asarray(r)[np.asarray(v)]
        for rt in roots:
            assert np.any(np.abs(found - rt) < 1e-4), (roots, found)


def test_p3p_recovers_ground_truth(rng):
    hits = 0
    for _ in range(40):
        R, T = _random_pose(rng)
        X = rng.uniform(-0.12, 0.12, (3, 3)).astype(np.float32)
        X[:, 2] *= 0.1
        cam = X @ R.T + T
        uv = cam @ K.T
        uv = uv[:, :2] / uv[:, 2:3]
        sol = p3p(jnp.asarray(_bearings(uv)), jnp.asarray(X))
        Ts, val = np.asarray(sol.T), np.asarray(sol.valid)
        best = min([np.linalg.norm(Ts[i] - T) for i in range(len(val))
                    if val[i]], default=1e9)
        hits += best < 1e-3
    # f32 quartic conditioning loses a few; RANSAC needs only a majority
    assert hits >= 30, f"only {hits}/40 P3P recoveries"


def test_p3p_agrees_with_cv2(rng):
    """On the same minimal sample, one of our candidates must match
    cv2.solvePnP(SOLVEPNP_P3P)."""
    agreements = 0
    for _ in range(20):
        R, T = _random_pose(rng)
        X = rng.uniform(-0.12, 0.12, (3, 3)).astype(np.float32)
        X[:, 2] *= 0.1
        cam = X @ R.T + T
        uv = cam @ K.T
        uv = (uv[:, :2] / uv[:, 2:3]).astype(np.float32)
        okcv, rvecs, tvecs = cv2.solveP3P(X, uv.reshape(-1, 1, 2), K,
                                          None, flags=cv2.SOLVEPNP_P3P)
        sol = p3p(jnp.asarray(_bearings(uv)), jnp.asarray(X))
        Ts, val = np.asarray(sol.T), np.asarray(sol.valid)
        ours = [Ts[i] for i in range(len(val)) if val[i]]
        for t_cv in (tvecs or []):
            if any(np.linalg.norm(t_cv.ravel() - t) < 2e-3 for t in ours):
                agreements += 1
                break
    assert agreements >= 15, f"cv2 agreement only {agreements}/20"


def test_detect_frame_2d_synthetic(rng):
    R, T = _random_pose(rng)
    Xt = rng.uniform(-0.12, 0.12, (60, 3)).astype(np.float32)
    Xt[:, 2] *= 0.05
    cam = Xt @ R.T + T
    uv = cam @ K.T
    uv = (uv[:, :2] / uv[:, 2:3]).astype(np.float32)
    uv += rng.normal(0, 0.3, uv.shape).astype(np.float32)

    q = 200
    query_xy = np.zeros((q, 2), np.float32)
    train = np.zeros((q, 1, 3), np.float32)
    query_xy[:60] = uv
    train[:60, 0] = Xt
    query_xy[60:] = rng.uniform(0, 600, (q - 60, 2))
    train[60:, 0] = rng.uniform(-0.12, 0.12, (q - 60, 3))

    cfg = Pnp2dConfig(n_hypotheses=256, min_inliers=8, max_instances=2)
    det = jax.jit(lambda key: detect_frame_2d(
        key, jnp.zeros((q, 1), jnp.int32), jnp.full((q, 1), 20.0),
        jnp.ones((q, 1), bool), jnp.asarray(train), jnp.asarray(query_xy),
        jnp.asarray(K), jnp.arange(1), 256, cfg))(jax.random.PRNGKey(0))
    acc = np.asarray(det.accepted)[0]
    assert acc[0], "true pose not accepted"
    dt = np.linalg.norm(np.asarray(det.T)[0][0] - T)
    assert dt < 0.02, f"2D pose off by {dt:.4f} m"
    assert int(np.asarray(det.n_inliers)[0][0]) >= 40


def test_e2e_depthless_detection():
    """Full cell-graph detection on a frame WITHOUT depth — the capability
    the reference's docs exclude ('does not work with 2D only input')."""
    from tod_tpu.db import InMemoryDb, insert_observation
    from tod_tpu.models import TodDetector, TodTrainer
    from tod_tpu.utils.synthetic import (DEFAULT_K, SyntheticObject,
                                         compose_scene, facing_pose,
                                         turntable_observations)

    InMemoryDb.reset_shared()
    db = InMemoryDb.shared("pnp2d")
    db_json = json.dumps({"type": "mem", "collection": "pnp2d"})
    obj = SyntheticObject.make("flat_obj", seed=21)
    for obs in turntable_observations(obj, n_views=8):
        insert_observation(db, "flat_obj", obs["frame_number"], obs["image"],
                           obs["depth"], obs["mask"], obs["K"], obs["R"],
                           obs["T"])
    TodTrainer("t", object_id="flat_obj", json_db=db_json,
               json_feature_params=json.dumps(
                   {"type": "ORB", "n_features": 800})).process()

    rng = np.random.default_rng(4)
    Rg, Tg = facing_pose(rng, z=0.75)
    image, _depth = compose_scene([obj], [(Rg, Tg)])

    det = TodDetector(
        "d", json_db=db_json,
        search=json.dumps({"type": "LSH", "radius": 35}),
        json_feature_params=json.dumps(
            {"type": "ORB", "n_features": 1500}),
        n_ransac_iterations=512, min_inliers=8)
    det.inputs["image"] = image
    det.inputs["depth"] = np.zeros((0, 0), np.uint16)   # NO depth
    det.inputs["K_image"] = DEFAULT_K
    det.process()
    results = det.outputs["pose_results"]
    mine = [r for r in results if r.object_id == "flat_obj"]
    assert mine, "2D-only path found nothing"
    best = max(mine, key=lambda r: r.confidence)
    dt = np.linalg.norm(best.T - Tg)
    ang = np.degrees(np.arccos(np.clip(
        (np.trace(best.R @ Rg.T) - 1) / 2, -1, 1)))
    # monocular planar pose without depth: translation resolves to 0.5-2.5cm
    # depending on the hypothesis draw and the tilt component keeps ~8deg of
    # slack (classic planar-PnP ambiguity; the ratio-gated consistency graph
    # recovers the full ~37-keypoint consensus). The reference supports no
    # 2D-only detection at all (doc/source/index.rst:46).
    assert dt < 0.03, f"2D pose translation error {dt:.4f} m"
    assert ang < 15.0, f"2D pose rotation error {ang:.2f} deg"
    InMemoryDb.reset_shared()
