"""OpenCV-reference oracle: the reference pipeline's semantics on CPU.

Head-to-head parity harness (BASELINE.md: "poses matching the OpenCV
reference to sub-millimeter tolerance"): cv2.ORB features, brute-force
Hamming knn(k=5) + radius truncation (DescriptorMatcher.cpp:211-220),
FillAdjacency (adjacency_ransac.cpp:128-172), the sequential graph-RANSAC
with the EXACT max-clique certificate (sac_model_registration_graph.h:
171-269, via tod_tpu.native's MaxCliqueDyn), the post-fit refinement loop
with pose inversion (adjacency_ransac.cpp:235-309), and the multi-instance
loop with query-keypoint invalidation (GuessGenerator.cpp:170-235,
adjacency_ransac.cpp:64-123).

Deliberate deviations, matching tod_tpu's documented defaults:
  * selectWithinDistance uses the intended sigma residual threshold (the
    reference leaves the SAC threshold at DBL_MAX, sac.h:71, making the
    residual test vacuous); pass ``use_residual_test=False`` for the
    bug-compatible behavior;
  * matching is exact brute-force Hamming (the reference's FLANN-LSH is a
    CPU approximation of exactly this).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import cv2
import numpy as np

from tod_tpu.native import Graph, hamming_knn_cpu

MIN_SAMPLE_NEIGHBORS = 3      # adjacency_ransac.h min_sample_size_
PIXEL_SEP_SQ = 400.0          # sample pixel separation > 20 px
CLIQUE_MINIMAL = 7            # min(best_inlier_number_ >= 8, 7) == 7 always


# ---------------------------------------------------------------------------
# Features + matching + back-projection
# ---------------------------------------------------------------------------


def orb(gray: np.ndarray, n_features: int = 5000, n_levels: int = 3,
        scale_factor: float = 1.2, mask: Optional[np.ndarray] = None):
    """cv::ORB detect+describe (Trainer.cpp:144-150 operating point)."""
    det = cv2.ORB_create(nfeatures=n_features, nlevels=n_levels,
                         scaleFactor=scale_factor)
    kps, desc = det.detectAndCompute(np.ascontiguousarray(gray, np.uint8),
                                     mask)
    if desc is None:
        return np.zeros((0, 2), np.float32), np.zeros((0, 32), np.uint8)
    xy = np.asarray([k.pt for k in kps], np.float32)
    return xy, desc.astype(np.uint8)


def match_radius(query: np.ndarray, db: np.ndarray, k: int = 5,
                 radius: float = 35.0) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """knnMatch(k) then radius truncation. Returns (dist, idx, valid)."""
    idx, dist = hamming_knn_cpu(query, db, k=k)
    valid = (idx >= 0) & (dist <= radius)
    return dist.astype(np.float32), idx, valid


def backproject(depth_m: np.ndarray, K: np.ndarray,
                xy: np.ndarray) -> np.ndarray:
    """Pinhole back-projection at rounded pixel coords; NaN where invalid."""
    h, w = depth_m.shape
    xi = np.clip(np.round(xy[:, 0]).astype(int), 0, w - 1)
    yi = np.clip(np.round(xy[:, 1]).astype(int), 0, h - 1)
    z = depth_m[yi, xi].astype(np.float64)
    z = np.where(z > 0, z, np.nan)
    x = (xy[:, 0] - K[0, 2]) / K[0, 0] * z
    y = (xy[:, 1] - K[1, 2]) / K[1, 1] * z
    return np.stack([x, y, z], -1).astype(np.float32)


def train_object(observations, n_features: int = 1000) -> Tuple[np.ndarray, np.ndarray]:
    """Reference training semantics (Trainer.cpp:134-187): per view run ORB
    on the 4x-eroded mask, keep keypoints with valid depth, back-project,
    world = (x_cam - T) @ R (training.cpp:175-195), stack across views."""
    desc_all, pts_all = [], []
    for obs in observations:
        img = np.asarray(obs["image"])
        gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY) if img.ndim == 3 else img
        mask = cv2.erode(np.asarray(obs["mask"]),
                         np.ones((3, 3), np.uint8), iterations=4)
        xy, desc = orb(gray, n_features=n_features, mask=mask)
        if not len(xy):
            continue
        depth = np.asarray(obs["depth"]).astype(np.float32)
        if obs["depth"].dtype == np.uint16:
            depth = depth / 1000.0
        cam = backproject(depth, np.asarray(obs["K"]), xy)
        ok = np.isfinite(cam).all(-1)
        R, T = np.asarray(obs["R"]), np.asarray(obs["T"]).reshape(3)
        world = (cam[ok] - T) @ R
        desc_all.append(desc[ok])
        pts_all.append(world.astype(np.float32))
    if not desc_all:
        return np.zeros((0, 32), np.uint8), np.zeros((0, 3), np.float32)
    return np.concatenate(desc_all), np.concatenate(pts_all)


# ---------------------------------------------------------------------------
# Geometry: adjacency + graph-RANSAC (sequential, reference control flow)
# ---------------------------------------------------------------------------


def horn(q: np.ndarray, t: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """estimateRigidTransformationSVD (sac_model_registration_graph.h:
    304-347): fit t ~= R q + T, H = sum t_c q_c^T, SVD reflection-fixed."""
    cq, ct = q.mean(0), t.mean(0)
    H = (t - ct).T @ (q - cq)
    U, _, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, 1.0, d])
    R = U @ D @ Vt
    return R, ct - R @ cq


def fill_adjacency(qpts, tpts, qxy, span, sigma):
    """FillAdjacency (adjacency_ransac.cpp:128-172), dense numpy."""
    dq = np.linalg.norm(qpts[:, None] - qpts[None], axis=-1)
    dt = np.linalg.norm(tpts[:, None] - tpts[None], axis=-1)
    dpix2 = ((qxy[:, None] - qxy[None]) ** 2).sum(-1)
    cons = np.abs(dt - dq)
    m = len(qpts)
    eye = np.eye(m, dtype=bool)
    physical = (dq <= span + 2 * sigma) & (cons <= 4 * sigma) & ~eye
    sample = physical & (dpix2 > PIXEL_SEP_SQ) & (cons < 2 * sigma)
    return physical, sample


def prune_low_degree(sample, valid):
    """InvalidateIndices (adjacency_ransac.cpp:64-89): iterate to fixpoint."""
    valid = valid.copy()
    while True:
        deg = (sample & valid[None, :]).sum(1)
        nxt = valid & (deg >= MIN_SAMPLE_NEIGHBORS)
        if (nxt == valid).all():
            return nxt
        valid = nxt


def _draw_sample(rng, sample, valid_idx, max_checks: int = 1000):
    """drawIndexSampleHelper semantics: rejection-sample a 3-clique in the
    sample adjacency (sac_model_registration_graph.h:102-168)."""
    for _ in range(max_checks):
        v1 = valid_idx[rng.integers(len(valid_idx))]
        n1 = np.nonzero(sample[v1])[0]
        n1 = n1[np.isin(n1, valid_idx)]
        if not len(n1):
            continue
        v2 = n1[rng.integers(len(n1))]
        n12 = n1[sample[v2][n1]]
        if not len(n12):
            continue
        v3 = n12[rng.integers(len(n12))]
        return v1, v2, v3
    return None


def _select_within(R, T, samples, qpts, tpts, physical, sample, valid,
                   sigma, use_residual_test=True):
    """selectWithinDistance (sac_model_registration_graph.h:171-269) with an
    EXACT clique certificate; returns the inlier index array or None."""
    cand = valid & physical[samples[0]] & physical[samples[1]] \
        & physical[samples[2]]
    cand = np.nonzero(cand)[0].tolist() + list(samples)
    cand = np.unique(cand)
    if use_residual_test:
        res = ((qpts[cand] @ R.T + T - tpts[cand]) ** 2).sum(-1)
        inl = cand[res < sigma * sigma]
    else:
        inl = cand
    if len(inl) <= CLIQUE_MINIMAL:
        return None
    # pre-filter: inliers need >= minimal sample-neighbors overall
    deg = (sample[inl] & valid[None, :]).sum(1)
    filtered = inl[deg >= CLIQUE_MINIMAL]
    if len(filtered) <= CLIQUE_MINIMAL:
        return None
    # exact clique among the filtered inliers
    g = Graph(len(filtered))
    sub = sample[np.ix_(filtered, filtered)]
    for a in range(len(filtered)):
        for b in range(a + 1, len(filtered)):
            if sub[a, b]:
                g.add_edge(a, b)
    if len(g.find_clique(CLIQUE_MINIMAL + 1)) <= CLIQUE_MINIMAL:
        return None
    return inl


@dataclasses.dataclass
class OraclePose:
    R: np.ndarray
    T: np.ndarray
    inliers: np.ndarray      # match indices
    n_unique: int            # distinct query keypoints


def ransac_once(rng, qpts, tpts, qxy, qidx, physical, sample, valid, sigma,
                n_iterations, use_residual_test=True,
                adaptive=False) -> Optional[OraclePose]:
    """One full RANSAC + refinement (RandomSampleConsensus::computeModel,
    ransac.h:80-143, + AdjacencyRansac::Ransac refinement,
    adjacency_ransac.cpp:235-309).

    ``adaptive``: the reference's early-termination rule (ransac.h:124-135):
    stop once k = log(1-p)/log(1-w^3) trials are done, w = best inlier
    ratio, p = 0.99. Off by default (fixed-budget, matching the tod_tpu
    parallel batch); turn on for bench-scale oracle runs where the
    sequential loop must exit like the reference does."""
    valid_idx = np.nonzero(valid)[0]
    if len(valid_idx) < 3:
        return None
    best_inl, best_R, best_T = None, None, None
    k_adaptive = float(n_iterations)
    trials = 0
    for _ in range(int(n_iterations)):
        if adaptive and trials >= k_adaptive:
            break
        s = _draw_sample(rng, sample & valid[None, :] & valid[:, None],
                         valid_idx)
        if s is None:
            break
        trials += 1
        R, T = horn(qpts[list(s)], tpts[list(s)])
        inl = _select_within(R, T, s, qpts, tpts, physical, sample, valid,
                             sigma, use_residual_test)
        if inl is not None and (best_inl is None or len(inl) > len(best_inl)):
            best_inl, best_R, best_T = inl, R, T
            if adaptive:
                w = len(inl) / max(len(valid_idx), 1)
                denom = np.log(max(1.0 - w ** 3, 1e-12))
                k_adaptive = min(k_adaptive, np.log(0.01) / denom)
    if best_inl is None:
        return None

    # refinement: optimize + absorb extra inliers; final pass at 4x thresh
    inliers = set(best_inl.tolist())
    rest = set(valid_idx.tolist()) - inliers
    R, T = best_R, best_T
    thresh = sigma * sigma
    do_final = False
    while True:
        il = np.asarray(sorted(inliers))
        R, T = horn(qpts[il], tpts[il])
        rl = np.asarray(sorted(rest), int)
        if len(rl):
            res = ((qpts[rl] @ R.T + T - tpts[rl]) ** 2).sum(-1)
            extra = rl[res < thresh]
        else:
            extra = np.zeros(0, int)
        inliers |= set(extra.tolist())
        rest -= set(extra.tolist())
        if do_final:
            break
        if not len(extra):
            do_final = True
            thresh *= 4
    R_out = R.T
    T_out = -R_out @ T
    il = np.asarray(sorted(inliers))
    return OraclePose(R=R_out, T=T_out, inliers=il,
                      n_unique=len(np.unique(qidx[il])))


def detect_object(rng, qpts, tpts, qxy, qidx, span, sigma=0.01,
                  n_iterations=1000, min_inliers=8, max_instances=5,
                  use_residual_test=True, adaptive=False) -> List[OraclePose]:
    """The multi-instance loop (GuessGenerator.cpp:170-235): RANSAC, accept
    at >= min_inliers unique keypoints, invalidate the inliers' keypoints
    (InvalidateQueryIndices, adjacency_ransac.cpp:94-123), repeat."""
    ok = np.isfinite(qpts).all(-1)
    qpts = np.where(ok[:, None], qpts, 0.0)
    physical, sample = fill_adjacency(qpts, tpts, qxy, span, sigma)
    physical &= ok[:, None] & ok[None, :]
    sample &= ok[:, None] & ok[None, :]
    valid = prune_low_degree(sample, ok)
    poses = []
    for _ in range(max_instances):
        pose = ransac_once(rng, qpts, tpts, qxy, qidx, physical, sample,
                           valid, sigma, n_iterations, use_residual_test,
                           adaptive)
        if pose is None or pose.n_unique < min_inliers:
            break
        poses.append(pose)
        shared = np.isin(qidx, qidx[pose.inliers])
        valid = prune_low_degree(sample, valid & ~shared)
    return poses
