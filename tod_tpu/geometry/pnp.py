"""Perspective-n-Point: vmapped P3P minimal solver + Gauss-Newton refinement.

The 2D-only detection path. The reference LEFT THIS UNIMPLEMENTED — an empty
TODO with a dead `solvePnP` mention (src/detection/GuessGenerator.cpp:147-152;
doc/source/index.rst:36-46 "the pipeline does not work with 2D only input").
tod_tpu implements it TPU-natively: Grunert's P3P reduced to a quartic solved
in closed form (Ferrari) with a Newton polish for f32 stability, batched over
RANSAC hypotheses with vmap; accepted poses are refined by fixed-iteration
Gauss-Newton on the reprojection error over all inliers.

Conventions match the 3D path: poses are model->camera, x_cam = R @ X + T;
pixels are x = K @ x_cam (pinhole, no distortion).

References: Grunert 1841 (as formulated in Haralick et al., "Review and
Analysis of Solutions of the Three Point Perspective Pose Estimation
Problem", IJCV 1994); Ferrari's closed-form quartic.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tod_tpu.geometry.transforms import kabsch


# ---------------------------------------------------------------------------
# Quartic solver: closed-form (depressed quartic -> resolvent cubic) +
# Newton polish. Returns 4 real-root candidates with a validity mask;
# complex pairs are masked out.
# ---------------------------------------------------------------------------


def _cbrt(x: jax.Array) -> jax.Array:
    return jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)


def solve_quartic(c4, c3, c2, c1, c0, polish_iters: int = 6
                  ) -> Tuple[jax.Array, jax.Array]:
    """Real roots of c4 x^4 + c3 x^3 + c2 x^2 + c1 x + c0 (elementwise over
    any batch shape). Returns ``(roots (..., 4), valid (..., 4))``.

    Ferrari: depress with x = y - c3/(4 c4); factor via the resolvent cubic's
    largest real root (Cardano with trigonometric branch for three-real-root
    cases); Newton-polish each root on the ORIGINAL quartic (f32 needs it).
    """
    a = c3 / c4
    b = c2 / c4
    c = c1 / c4
    d = c0 / c4
    # depressed quartic y^4 + p y^2 + q y + r
    p = b - 3.0 * a * a / 8.0
    q = c - a * b / 2.0 + a * a * a / 8.0
    r = (d - a * c / 4.0 + a * a * b / 16.0
         - 3.0 * a * a * a * a / 256.0)

    # resolvent cubic: m^3 + p m^2 + (p^2/4 - r) m - q^2/8 = 0, need m > 0
    A = p
    B = p * p / 4.0 - r
    C = -q * q / 8.0
    # Cardano on m^3 + A m^2 + B m + C
    Q = (3.0 * B - A * A) / 9.0
    R = (9.0 * A * B - 27.0 * C - 2.0 * A ** 3) / 54.0
    D = Q ** 3 + R ** 2
    sqrtD = jnp.sqrt(jnp.maximum(D, 0.0))
    # D >= 0: one real root via cube roots
    m_pos = _cbrt(R + sqrtD) + _cbrt(R - sqrtD) - A / 3.0
    # D < 0: three real roots; take the largest (trigonometric form)
    theta = jnp.arccos(jnp.clip(
        R / jnp.sqrt(jnp.maximum(-(Q ** 3), 1e-30)), -1.0, 1.0))
    m_neg = 2.0 * jnp.sqrt(jnp.maximum(-Q, 0.0)) * jnp.cos(theta / 3.0) \
        - A / 3.0
    m = jnp.where(D >= 0, m_pos, m_neg)
    m = jnp.maximum(m, 1e-12)

    # y^4 + p y^2 + q y + r = (y^2 + m + s y)(y^2 + m' - s y) with
    # s = sqrt(2m), and the two quadratics' constant terms:
    s = jnp.sqrt(2.0 * m)
    t0 = p / 2.0 + m - q / (2.0 * s)
    t1 = p / 2.0 + m + q / (2.0 * s)
    # quadratic 1: y^2 + s y + t0 ; quadratic 2: y^2 - s y + t1
    d0 = s * s - 4.0 * t0
    d1 = s * s - 4.0 * t1
    sq0 = jnp.sqrt(jnp.maximum(d0, 0.0))
    sq1 = jnp.sqrt(jnp.maximum(d1, 0.0))
    ys = jnp.stack([(-s + sq0) / 2.0, (-s - sq0) / 2.0,
                    (s + sq1) / 2.0, (s - sq1) / 2.0], axis=-1)
    valid = jnp.stack([d0 >= 0, d0 >= 0, d1 >= 0, d1 >= 0], axis=-1)
    roots = ys - (a / 4.0)[..., None]

    # Newton polish on the original quartic
    def f(x):
        return ((((c4[..., None] * x + c3[..., None]) * x + c2[..., None])
                 * x + c1[..., None]) * x + c0[..., None])

    def fp(x):
        return (((4.0 * c4[..., None] * x + 3.0 * c3[..., None]) * x
                 + 2.0 * c2[..., None]) * x + c1[..., None])

    for _ in range(polish_iters):
        roots = roots - f(roots) / jnp.where(
            jnp.abs(fp(roots)) > 1e-12, fp(roots), 1.0)
    return roots, valid


# ---------------------------------------------------------------------------
# P3P (Grunert / Haralick)
# ---------------------------------------------------------------------------


class P3PSolutions(NamedTuple):
    R: jax.Array       # (..., 8, 3, 3) model->camera (candidate poses)
    T: jax.Array       # (..., 8, 3)
    valid: jax.Array   # (..., 8)


def p3p(bearings: jax.Array, points: jax.Array) -> P3PSolutions:
    """Grunert's P3P for one sample: ``bearings`` (3, 3) unit camera-frame
    rays; ``points`` (3, 3) model-frame 3D points. Returns 8 candidate poses
    (4 quartic roots x 2 back-substitution branches; duplicates and spurious
    candidates are masked by the post-polish residual gate). vmap over
    leading axes for hypothesis batches."""
    f1, f2, f3 = bearings[0], bearings[1], bearings[2]
    p1, p2, p3 = points[0], points[1], points[2]

    a = jnp.linalg.norm(p2 - p3)              # opposite P1
    b = jnp.linalg.norm(p1 - p3)              # opposite P2
    c = jnp.linalg.norm(p1 - p2)              # opposite P3
    cos_a = jnp.dot(f2, f3)                   # angle at the camera for a
    cos_b = jnp.dot(f1, f3)
    cos_c = jnp.dot(f1, f2)

    a2, b2, c2 = a * a, b * b, c * c
    # With u = s2/s1, v = s3/s1, the cosine-law system reduces (resultant of
    # the two ratio equations, derived symbolically with sympy — see the
    # module docstring) to a quartic in v with Ar = a^2/b^2, Br = c^2/b^2:
    Ar = a2 / b2
    Br = c2 / b2
    ca, cb, cg = cos_a, cos_b, cos_c
    C4 = (Ar * Ar - 2 * Ar * Br - 2 * Ar + Br * Br
          - 4 * Br * ca * ca + 2 * Br + 1)
    C3 = (-4 * Ar * Ar * cb + 8 * Ar * Br * cb + 4 * Ar * ca * cg
          + 4 * Ar * cb - 4 * Br * Br * cb + 8 * Br * ca * ca * cb
          + 4 * Br * ca * cg - 4 * Br * cb - 4 * ca * cg)
    C2 = (4 * Ar * Ar * cb * cb + 2 * Ar * Ar - 8 * Ar * Br * cb * cb
          - 4 * Ar * Br - 8 * Ar * ca * cb * cg - 4 * Ar * cg * cg
          + 4 * Br * Br * cb * cb + 2 * Br * Br - 4 * Br * ca * ca
          - 8 * Br * ca * cb * cg + 4 * ca * ca + 4 * cg * cg - 2)
    C1 = (-4 * Ar * Ar * cb + 8 * Ar * Br * cb + 4 * Ar * ca * cg
          + 8 * Ar * cb * cg * cg - 4 * Ar * cb - 4 * Br * Br * cb
          + 4 * Br * ca * cg + 4 * Br * cb - 4 * ca * cg)
    C0 = (Ar * Ar - 2 * Ar * Br - 4 * Ar * cg * cg + 2 * Ar
          + Br * Br - 2 * Br + 1)

    v, _ = solve_quartic(C4, C3, C2, C1, C0)           # (4,) roots

    # s1 from side b: s1^2 (1 + v^2 - 2 v cos_b) = b^2
    g = jnp.maximum(1.0 + v * v - 2.0 * v * cb, 1e-12)
    s1 = jnp.sqrt(b2 / g)
    # u = s2/s1 from side c: u^2 - 2 u cos_c + (1 - Br * g) = 0. Both
    # branches are carried as candidates (8 total) — f32 root error makes
    # pre-polish branch selection unreliable; the post-polish residual gate
    # keeps only candidates that actually solve the system.
    disc = jnp.maximum(cg * cg - (1.0 - Br * g), 0.0)
    sq = jnp.sqrt(disc)
    u = jnp.concatenate([cg + sq, cg - sq])            # (8,)
    v8 = jnp.concatenate([v, v])
    s1 = jnp.concatenate([s1, s1])

    s2 = u * s1
    s3 = v8 * s1

    # The quartic is ill-conditioned in f32 (the x64 path is near-exact, f32
    # drifts ~cm). Newton-polish the DISTANCES on the original cosine-law
    # system — a well-conditioned 3x3 solve per candidate:
    #   F = [s2^2+s3^2-2 s2 s3 ca - a^2,
    #        s1^2+s3^2-2 s1 s3 cb - b^2,
    #        s1^2+s2^2-2 s1 s2 cg - c^2]
    s = jnp.stack([s1, s2, s3], axis=-1)                # (8, 3)

    def newton_step(s, _):
        s1_, s2_, s3_ = s[..., 0], s[..., 1], s[..., 2]
        F = jnp.stack([
            s2_ * s2_ + s3_ * s3_ - 2 * s2_ * s3_ * ca - a2,
            s1_ * s1_ + s3_ * s3_ - 2 * s1_ * s3_ * cb - b2,
            s1_ * s1_ + s2_ * s2_ - 2 * s1_ * s2_ * cg - c2], axis=-1)
        zero = jnp.zeros_like(s1_)
        J = jnp.stack([
            jnp.stack([zero, 2 * s2_ - 2 * s3_ * ca,
                       2 * s3_ - 2 * s2_ * ca], -1),
            jnp.stack([2 * s1_ - 2 * s3_ * cb, zero,
                       2 * s3_ - 2 * s1_ * cb], -1),
            jnp.stack([2 * s1_ - 2 * s2_ * cg,
                       2 * s2_ - 2 * s1_ * cg, zero], -1)], axis=-2)
        J = J + 1e-9 * jnp.eye(3)
        delta = jnp.linalg.solve(J, F[..., None])[..., 0]
        fin = jnp.isfinite(delta).all(-1, keepdims=True)
        return s - jnp.where(fin, delta, 0.0), None

    s, _ = jax.lax.scan(newton_step, s, None, length=8)
    s1, s2, s3 = s[..., 0], s[..., 1], s[..., 2]

    # post-polish validity: positive depths + the system actually solved
    res = jnp.stack([
        s2 * s2 + s3 * s3 - 2 * s2 * s3 * ca - a2,
        s1 * s1 + s3 * s3 - 2 * s1 * s3 * cb - b2,
        s1 * s1 + s2 * s2 - 2 * s1 * s2 * cg - c2], axis=-1)
    scale = jnp.maximum(jnp.maximum(a2, b2), c2)
    solved = (jnp.abs(res) < 1e-4 * scale).all(-1)
    ok = ((s1 > 0) & (s2 > 0) & (s3 > 0) & solved
          & jnp.isfinite(s).all(-1))

    # camera-frame points -> absolute orientation (Horn) to model points
    cam = jnp.stack([s1[:, None] * f1[None, :],
                     s2[:, None] * f2[None, :],
                     s3[:, None] * f3[None, :]], axis=1)   # (8, 3pts, 3)
    world = jnp.broadcast_to(points[None], (8, 3, 3))
    # fit maps model -> camera: R @ X + T = x_cam
    fit = kabsch(world, cam, jnp.ones((8, 3), jnp.float32))
    return P3PSolutions(R=fit.R, T=fit.T, valid=ok & fit.ok)


def project(R: jax.Array, T: jax.Array, K: jax.Array,
            X: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Project model points: returns ((N,2) pixels, (N,) in-front mask)."""
    cam = X @ R.T + T
    z = cam[..., 2]
    zc = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = K[0, 0] * cam[..., 0] / zc + K[0, 2]
    v = K[1, 1] * cam[..., 1] / zc + K[1, 2]
    return jnp.stack([u, v], axis=-1), z > 1e-6


def gauss_newton_pose(R0: jax.Array, T0: jax.Array, K: jax.Array,
                      X: jax.Array, uv: jax.Array, w: jax.Array,
                      iters: int = 5) -> Tuple[jax.Array, jax.Array]:
    """Refine a pose by fixed-iteration Gauss-Newton on weighted reprojection
    error. ``X`` (N,3) model points, ``uv`` (N,2) observed pixels, ``w`` (N,)
    weights (0 masks a row out). Returns (R, T)."""

    def skew(w3):
        return jnp.array([[0.0, -w3[2], w3[1]],
                          [w3[2], 0.0, -w3[0]],
                          [-w3[1], w3[0], 0.0]])

    def rot_smooth(w3):
        # second-order exp-map Taylor form: polynomial in w3, so jacfwd at
        # w3=0 is exact ([e_i]x columns) — the exact Rodrigues formula is
        # NOT differentiable at 0 (norm(0)) and yields NaN Jacobians there
        kx = skew(w3)
        return jnp.eye(3) + kx + 0.5 * (kx @ kx)

    def rodrigues(w3):
        th = jnp.linalg.norm(w3) + 1e-12
        kx = skew(w3 / th)
        return (jnp.eye(3) + jnp.sin(th) * kx
                + (1.0 - jnp.cos(th)) * (kx @ kx))

    def step(carry, _):
        R, T = carry

        def residual(delta):
            dR = rot_smooth(delta[:3])
            Rn = dR @ R
            Tn = T + delta[3:]
            uvp, _ = project(Rn, Tn, K, X)
            return ((uvp - uv) * w[:, None]).reshape(-1)

        J = jax.jacfwd(residual)(jnp.zeros(6))            # (2N, 6)
        r = residual(jnp.zeros(6))
        H = J.T @ J + 1e-6 * jnp.eye(6)
        delta = -jnp.linalg.solve(H, J.T @ r)
        ok = jnp.isfinite(delta).all()
        delta = jnp.where(ok, delta, 0.0)
        return (rodrigues(delta[:3]) @ R, T + delta[3:]), None

    (R, T), _ = jax.lax.scan(step, (R0, T0), None, length=iters)
    return R, T
