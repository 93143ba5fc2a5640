"""Learn a decorrelated rBRIEF-256 test pattern (the ORB paper's greedy
construction: among a large candidate pool of pixel-pair tests, pick 256
whose responses over a patch corpus have mean near 0.5 and low pairwise
correlation).

Why: the i.i.d.-Gaussian BRIEF pattern produces heavily correlated bits on
blurred patches (measured: top-10 covariance eigenvalues carry ~57% of the
bit variance on trained models), which collapses the Hamming distance
distribution — at 10^6 DB rows the nearest JUNK descriptor sits at ~30/256,
indistinguishable from true matches. Decorrelated tests restore the distance
margin that the radius filter and kNN ranking depend on.

The corpus is OUR pipeline's patch distribution: FAST corners on synthetic
textures across the detection pyramid scales, patches blurred exactly like
the runtime (7x7 sigma 2), rotated to canonical orientation by the
intensity-centroid angle (what the runtime's binned steering approximates).

Output: tod_tpu/ops/data/brief_pattern_learned.npy, shape (256, 2, 2) int32,
loaded by tod_tpu.ops.orb.brief_pattern(). Deterministic (seeded).
"""

import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tod_tpu.utils.synthetic import make_texture

PATCH_CROP = 13          # tests live in [-13, 13] (ops/orb.py PATCH_RADIUS)
HALF = 18                # rotated-patch extraction radius before crop
N_TEXTURES = 60
N_SCALES = 3
KP_PER_IMAGE = 120
N_BITS = 256


def orientation(img, x, y, radius=15):
    """Intensity-centroid angle, same construction as the runtime."""
    dys, dxs = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    circle = (dxs**2 + dys**2) <= radius**2
    patch = img[y - radius:y + radius + 1, x - radius:x + radius + 1]
    m10 = float((dxs * circle * patch).sum())
    m01 = float((dys * circle * patch).sum())
    return np.arctan2(m01, m10)


def collect_patches(rng):
    """(N, 27, 27) float32 canonical-orientation blurred patches."""
    fast = cv2.FastFeatureDetector_create(threshold=20)
    out = []
    for i in range(N_TEXTURES):
        tex = make_texture(3000 + i)
        for s in range(N_SCALES):
            scale = 1.2 ** s
            img = cv2.resize(tex, None, fx=1 / scale, fy=1 / scale,
                             interpolation=cv2.INTER_LINEAR)
            blurred = cv2.GaussianBlur(img.astype(np.float32), (7, 7), 2.0)
            kps = list(fast.detect(img, None))
            rng.shuffle(kps)
            margin = HALF + 16
            taken = 0
            for kp in kps:
                if taken >= KP_PER_IMAGE:
                    break
                x, y = int(round(kp.pt[0])), int(round(kp.pt[1]))
                if not (margin <= x < img.shape[1] - margin
                        and margin <= y < img.shape[0] - margin):
                    continue
                ang = np.degrees(orientation(img.astype(np.float32), x, y))
                rot = cv2.getRotationMatrix2D((float(x), float(y)), ang, 1.0)
                warped = cv2.warpAffine(blurred, rot,
                                        (img.shape[1], img.shape[0]),
                                        flags=cv2.INTER_LINEAR)
                out.append(warped[y - PATCH_CROP:y + PATCH_CROP + 1,
                                  x - PATCH_CROP:x + PATCH_CROP + 1])
                taken += 1
    return np.asarray(out, np.float32)


def main():
    rng = np.random.default_rng(0)
    patches = collect_patches(rng)
    n = len(patches)
    print(f"corpus: {n} canonical patches")
    flat = patches.reshape(n, -1)                      # (N, 27*27)

    # candidate pool: all pairs over a stride-2 grid (the 7x7-sigma-2 blur
    # makes stride-1 neighbors redundant) = 196 points -> 19110 pairs
    coords = np.arange(-PATCH_CROP, PATCH_CROP + 1, 2)
    pts = np.stack(np.meshgrid(coords, coords), -1).reshape(-1, 2)
    w = 2 * PATCH_CROP + 1
    p_idx = (pts[:, 1] + PATCH_CROP) * w + (pts[:, 0] + PATCH_CROP)
    m = len(pts)
    ii, jj = np.triu_indices(m, k=1)
    print(f"candidates: {len(ii)} pairs over {m} grid points")

    vals = flat[:, p_idx]                              # (N, 196)
    bits = (vals[:, ii] < vals[:, jj])                 # (N, C) bool
    bits = bits.astype(np.float32)

    means = bits.mean(0)
    stds = bits.std(0) + 1e-9
    centered = (bits - means) / stds                   # for correlations
    order = np.argsort(np.abs(means - 0.5))

    selected = []
    max_corr = np.zeros(bits.shape[1], np.float32)
    tau = 0.20
    while len(selected) < N_BITS and tau <= 0.95:
        for c in order:
            if len(selected) >= N_BITS:
                break
            if max_corr[c] >= tau or any(c == s for s in selected):
                continue
            if np.abs(means[c] - 0.5) > 0.35:
                continue
            selected.append(c)
            corr = np.abs(centered.T @ centered[:, c]) / len(bits)
            max_corr = np.maximum(max_corr, corr.astype(np.float32))
        tau += 0.05
        print(f"tau={tau:.2f}: {len(selected)} selected")

    sel = np.asarray(selected[:N_BITS])
    pattern = np.zeros((N_BITS, 2, 2), np.int32)
    pattern[:, 0] = pts[ii[sel]]
    pattern[:, 1] = pts[jj[sel]]

    # diagnostics: bit balance + residual correlation on held-out textures
    sel_bits = bits[:, sel]
    c = np.corrcoef(sel_bits.T)
    off = np.abs(c - np.eye(N_BITS))
    print(f"selected: mean |p-0.5| = {np.abs(sel_bits.mean(0) - 0.5).mean():.3f}"
          f", mean |corr| = {off.mean():.3f}, max |corr| = {off.max():.2f}")
    ev = np.linalg.eigvalsh(np.cov(sel_bits.T))
    print(f"top-10 eigenvalue share: {ev[-10:].sum() / ev.sum():.3f}")

    out = os.path.join(os.path.dirname(__file__), "..", "tod_tpu", "ops",
                       "data", "brief_pattern_learned.npy")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.save(out, pattern)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
