"""Rigid-transform estimation and frame conversions.

Replaces the reference's Horn-SVD rigid estimation
(src/common/sac_model_registration_graph.h:304-347) and the trainer's
camera->world map (src/training/training.cpp:175-195).

The pose convention matches the reference throughout:
  * the RANSAC model fits (R, T) with  R @ query + T ~= training  — i.e. it
    maps camera-frame query points into the object/world frame;
  * the emitted pose is the inverse (adjacency_ransac.cpp:304-305):
    R_out = R^T, T_out = -R^T @ T, which maps object-frame model points into
    the camera frame (the object pose).

Instead of a batched 3x3 SVD (slow iterative guts on TPU), the optimal
rotation is the orthogonal polar factor of the correlation matrix H — equal to
Kabsch's U V^T whenever det(H) > 0, which graph-gated near-congruent samples
guarantee — computed with a branch-free scaled Newton iteration that vmaps
cleanly over hypothesis batches.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def camera_to_world(R: jax.Array, T: jax.Array, points: jax.Array) -> jax.Array:
    """world = (x - T) @ R for row-vector points (training.cpp:175-195).

    ``R``: (3,3) camera rotation, ``T``: (3,) camera translation, ``points``:
    (..., 3) camera-frame points. The observation's (R, T) map world->camera
    as x_cam = R^T ... (the reference applies "the inverse translation/rotation").
    """
    return (points - T.reshape(1, 3)) @ R


def _det3(m: jax.Array) -> jax.Array:
    return (m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1])
            - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 0])
            + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]))


def _adjugate_t3(m: jax.Array) -> jax.Array:
    """Transposed adjugate (cofactor matrix) of a 3x3: inv(m)^T * det(m)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    cof = jnp.stack([
        jnp.stack([e * i - f * h, f * g - d * i, d * h - e * g], -1),
        jnp.stack([c * h - b * i, a * i - c * g, b * g - a * h], -1),
        jnp.stack([b * f - c * e, c * d - a * f, a * e - b * d], -1),
    ], -2)
    return cof


def polar_rotation(H: jax.Array, n_iter: int = 9) -> Tuple[jax.Array, jax.Array]:
    """Orthogonal polar factor of (..., 3, 3) via scaled Newton iteration.

    X <- (mu X + (mu X)^-T) / 2 with mu = |det X|^(-1/3); quadratic
    convergence, branch-free, vmap/MXU friendly. Returns ``(R, ok)`` where
    ``ok`` flags well-conditioned inputs with det(H) > 0 (proper rotation —
    the Kabsch reflection case is reported as not-ok instead of patched,
    since graph-gated samples are near-congruent; degenerate/reflected
    hypotheses are simply discarded by the RANSAC scorer).
    """
    det_h = _det3(H)
    norm = jnp.sqrt((H * H).sum((-2, -1), keepdims=True)) + 1e-30
    ok = (det_h > 1e-9 * (norm[..., 0, 0] ** 3 + 1e-30))
    # Start from a normalized, safe matrix; identity where degenerate.
    eye = jnp.broadcast_to(jnp.eye(3, dtype=H.dtype), H.shape)
    X = jnp.where(ok[..., None, None], H / norm, eye)

    def body(_, X):
        det = _det3(X)
        mu = jnp.abs(det) ** (-1.0 / 3.0)
        Xs = X * mu[..., None, None]
        det_s = _det3(Xs)
        inv_t = _adjugate_t3(Xs) / det_s[..., None, None]
        return 0.5 * (Xs + inv_t)

    X = jax.lax.fori_loop(0, n_iter, body, X)
    return X, ok


def _det4(m: jax.Array) -> jax.Array:
    """Branch-free 4x4 determinant by cofactor expansion on the first row."""
    def minor(r, c):
        rows = [i for i in range(4) if i != r]
        cols = [j for j in range(4) if j != c]
        sub = m[..., rows, :][..., :, cols]
        return _det3(sub)
    return (m[..., 0, 0] * minor(0, 0) - m[..., 0, 1] * minor(0, 1)
            + m[..., 0, 2] * minor(0, 2) - m[..., 0, 3] * minor(0, 3))


def _adjugate4(m: jax.Array) -> jax.Array:
    """Branch-free classical adjugate of a (...,4,4): adj(m) @ m = det(m) I.
    For m = N - lambda_max*I (rank 3), adj is the rank-1 projector v v^T."""
    cols = []
    for j in range(4):
        row_entries = []
        for i in range(4):
            rows = [r for r in range(4) if r != i]
            colsel = [c for c in range(4) if c != j]
            sub = m[..., rows, :][..., :, colsel]
            sign = 1.0 if (i + j) % 2 == 0 else -1.0
            row_entries.append(sign * _det3(sub))
        cols.append(jnp.stack(row_entries, -1))
    # adj[j, i] = cofactor(i, j) -> stack columns along -2
    return jnp.stack(cols, -2)


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Unit quaternion (w,x,y,z) -> rotation matrix, (...,4) -> (...,3,3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], -2)


def horn_rotation(S: jax.Array, n_newton: int = 12) -> Tuple[jax.Array, jax.Array]:
    """Optimal rotation R (with R q ~= t) from the correlation matrix
    S = sum_i w_i q~_i t~_i^T, via Horn's unit-quaternion method — the actual
    closed form the reference cites (sac_model_registration_graph.h:296-303)
    but approximates with cv::SVD.

    Unlike SVD/polar approaches this is exact for rank-2 correlations — the
    3-point RANSAC samples and planar (flat textured object) inlier sets that
    dominate this workload — and always returns a *proper* rotation.
    Branch-free: Newton's method from an upper bound converges monotonically
    to the largest root of the quartic characteristic polynomial; the
    eigenvector is read off the adjugate of (N - lambda I).
    Returns (R, ok).
    """
    Sxx, Sxy, Sxz = S[..., 0, 0], S[..., 0, 1], S[..., 0, 2]
    Syx, Syy, Syz = S[..., 1, 0], S[..., 1, 1], S[..., 1, 2]
    Szx, Szy, Szz = S[..., 2, 0], S[..., 2, 1], S[..., 2, 2]
    N = jnp.stack([
        jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
        jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
        jnp.stack([Szx - Sxz, Sxy + Syx, Syy - Sxx - Szz, Syz + Szy], -1),
        jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, Szz - Sxx - Syy], -1),
    ], -2)

    # Characteristic polynomial det(lam I - N) = lam^4 + c2 lam^2 + c1 lam + c0
    # (trace(N) == 0 identically). c2/c1 via the standard QCP identities;
    # c0 = det(N) computed directly.
    c2 = -2.0 * (S * S).sum((-2, -1))
    c1 = -8.0 * _det3(S)
    c0 = _det4(N)

    # Newton from above: lam0 = ||N||_F >= lam_max; monotone + quadratic.
    lam = jnp.sqrt((N * N).sum((-2, -1))) + 1e-30

    def body(_, lam):
        p = ((lam * lam + c2) * lam + c1) * lam + c0
        dp = (4.0 * lam * lam + 2.0 * c2) * lam + c1
        return lam - p / jnp.where(jnp.abs(dp) > 1e-30, dp, 1e-30)

    lam = jax.lax.fori_loop(0, n_newton, body, lam)

    A = N - lam[..., None, None] * jnp.eye(4, dtype=S.dtype)
    adj = _adjugate4(A)  # rank-1: columns proportional to the eigenvector
    col_norm_sq = (adj * adj).sum(-2)                       # (...,4)
    pick = jnp.argmax(col_norm_sq, -1)
    v = jnp.take_along_axis(adj, pick[..., None, None].repeat(4, -2),
                            -1)[..., 0]                      # (...,4)
    v_norm = jnp.sqrt((v * v).sum(-1, keepdims=True))
    norm_n = jnp.sqrt((N * N).sum((-2, -1))) + 1e-30
    # Ambiguous (repeated-eigenvalue, e.g. collinear) cases still return *a*
    # valid rigid map of the samples — same arbitrary pick the reference's
    # cv::SVD makes — and are filtered downstream by residual/clique tests.
    ok = (v_norm[..., 0] > 1e-12 * norm_n) & (lam > 0)
    q = v / jnp.where(v_norm > 0, v_norm, 1.0)
    R = quat_to_mat(q)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=S.dtype), R.shape)
    return jnp.where(ok[..., None, None], R, eye), ok


class RigidFit(NamedTuple):
    R: jax.Array    # (..., 3, 3) with R @ query + T ~= training
    T: jax.Array    # (..., 3)
    ok: jax.Array   # (...,) bool — enough weight + well-posed rotation


def kabsch(query: jax.Array, training: jax.Array, weights: jax.Array) -> RigidFit:
    """Weighted rigid fit R @ query + T ~= training — Horn 1987 closed form
    (the reference's estimateRigidTransformationSVD contract,
    sac_model_registration_graph.h:304-347) via the quaternion method.

    ``query``/``training``: (..., N, 3); ``weights``: (..., N) >= 0 masks.
    """
    w = weights[..., None].astype(jnp.float32)
    wsum = w.sum(-2) + 1e-30                      # (..., 1)
    cq = (w * query).sum(-2) / wsum               # (..., 3)
    ct = (w * training).sum(-2) / wsum
    qc = (query - cq[..., None, :]) * w
    tc = training - ct[..., None, :]
    # S = sum_i w_i q~_i t~_i^T
    S = jnp.einsum("...ni,...nj->...ij", qc, tc,
                   precision=jax.lax.Precision.HIGHEST)
    R, ok = horn_rotation(S)
    T = ct - jnp.einsum("...ij,...j->...i", R, cq)
    enough = weights.sum(-1) >= 3.0
    return RigidFit(R=R, T=T, ok=ok & enough)


def apply_rt(R: jax.Array, T: jax.Array, points: jax.Array) -> jax.Array:
    """R @ p + T for (..., N, 3) points with broadcasting pose dims."""
    return jnp.einsum("...ij,...nj->...ni", R, points) + T[..., None, :]


def invert_pose(R: jax.Array, T: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """The reference's final inversion (adjacency_ransac.cpp:304-305):
    R_out = R^T, T_out = -R_out @ T."""
    R_out = jnp.swapaxes(R, -1, -2)
    T_out = -jnp.einsum("...ij,...j->...i", R_out, T)
    return R_out, T_out
