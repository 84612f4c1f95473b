"""Perspective-n-Point: algebraic P3P, RANSAC localization, Gauss-Newton
pose refinement.

Capability parity with src/vo/pose_estimation/p3p.py — but where the
reference calls cv2.solvePnP(SOLVEPNP_P3P) on 4-point samples (p3p.py:51-79)
and scipy.optimize.least_squares for refinement (p3p.py:188-213), everything
here is written from scratch in JAX so it vmaps over RANSAC hypotheses and
jits into the per-frame step:

  * Grunert's P3P (per Haralick et al., "Review and Analysis of Solutions of
    the Three Point Perspective Pose Estimation Problem", IJCV 1994):
    closed-form quartic via resolvent cubic + Newton polishing, then
    absolute orientation by 3-point Kabsch. The 4th sample point
    disambiguates the up-to-4 solutions, mirroring SOLVEPNP_P3P semantics.
  * Fixed-iteration Levenberg-damped Gauss-Newton with analytic Jacobians
    replaces scipy least_squares over the twist (p3p.py:194-213).

Pose convention: solvers return T_cw (world -> camera, the classic [R|t]).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vo_tpu.geom.lie import se3_exp
from vo_tpu.geom.points import skew, to_homogeneous
from vo_tpu.ops.linalg import spd_solve_small
from vo_tpu.ops.ransac import RansacResult, num_iterations, ransac


# ----------------------------------------------------------------------------
# Polynomial solvers (batched, f32-hardened with Newton polish)
# ----------------------------------------------------------------------------

def _solve_cubic_real(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Largest real root of z^3 + a z^2 + b z + c (elementwise batched).

    Trigonometric method when three real roots exist, Cardano otherwise.
    """
    p = b - a * a / 3.0
    q = 2.0 * a**3 / 27.0 - a * b / 3.0 + c
    # Three-real-root case (discriminant >= 0): t_k = 2m cos(theta/3 - 2pi k/3).
    m2 = jnp.maximum(-p / 3.0, 1e-20)
    m = jnp.sqrt(m2)
    cos_arg = jnp.clip(3.0 * q / (jnp.where(jnp.abs(p) < 1e-20, 1e-20, 2.0 * p * m)), -1.0, 1.0)
    theta = jnp.arccos(cos_arg)
    t_trig = 2.0 * m * jnp.cos(theta / 3.0)  # largest of the three
    # One-real-root case (Cardano).
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_card = jnp.cbrt(-q / 2.0 + sq) + jnp.cbrt(-q / 2.0 - sq)
    t = jnp.where(disc > 0.0, t_card, t_trig)
    z = t - a / 3.0
    # Newton polish on the original cubic.
    for _ in range(2):
        f = ((z + a) * z + b) * z + c
        df = (3.0 * z + 2.0 * a) * z + b
        z = z - f / jnp.where(jnp.abs(df) < 1e-20, 1e-20, df)
    return z


def solve_quartic(coeffs: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Real roots of A4 x^4 + A3 x^3 + A2 x^2 + A1 x + A0.

    coeffs: (..., 5) highest power first. Returns (roots (..., 4),
    valid (..., 4) bool). Ferrari: depressed quartic -> resolvent cubic ->
    two quadratics; three Newton iterations polish the f32 roots.
    """
    A4, A3, A2, A1, A0 = (coeffs[..., i] for i in range(5))
    scale = jnp.where(jnp.abs(A4) < 1e-12, jnp.sign(A4) * 1e-12 + (A4 == 0) * 1e-12, A4)
    a, b, c, d = A3 / scale, A2 / scale, A1 / scale, A0 / scale
    # Depressed: y^4 + p y^2 + q y + r, x = y - a/4.
    p = b - 3.0 * a * a / 8.0
    q = c - a * b / 2.0 + a**3 / 8.0
    r = d - a * c / 4.0 + a * a * b / 16.0 - 3.0 * a**4 / 256.0
    # Resolvent cubic: z^3 + 2p z^2 + (p^2 - 4r) z - q^2 = 0 ; z = u^2 > 0.
    z = _solve_cubic_real(2.0 * p, p * p - 4.0 * r, -q * q)
    z = jnp.maximum(z, 1e-12)
    u = jnp.sqrt(z)
    s = 0.5 * (p + z - q / u)
    t = 0.5 * (p + z + q / u)
    # y^2 + u y + s = 0 and y^2 - u y + t = 0.
    d1 = u * u - 4.0 * s
    d2 = u * u - 4.0 * t
    sq1 = jnp.sqrt(jnp.maximum(d1, 0.0))
    sq2 = jnp.sqrt(jnp.maximum(d2, 0.0))
    y = jnp.stack(
        [(-u + sq1) / 2.0, (-u - sq1) / 2.0, (u + sq2) / 2.0, (u - sq2) / 2.0], axis=-1
    )
    valid = jnp.stack([d1 >= 0.0, d1 >= 0.0, d2 >= 0.0, d2 >= 0.0], axis=-1)
    x = y - (a / 4.0)[..., None]
    # Newton polish on the original quartic (f32 hardening).
    a_, b_, c_, d_ = (v[..., None] for v in (a, b, c, d))
    for _ in range(3):
        f = (((x + a_) * x + b_) * x + c_) * x + d_
        df = ((4.0 * x + 3.0 * a_) * x + 2.0 * b_) * x + c_
        x = x - f / jnp.where(jnp.abs(df) < 1e-20, 1e-20, df)
    return x, valid


# ----------------------------------------------------------------------------
# P3P (Grunert)
# ----------------------------------------------------------------------------

def _kabsch(src: jnp.ndarray, dst: jnp.ndarray, w: jnp.ndarray | None = None):
    """Rigid transform T with dst ~ R @ src + t (least squares, SVD with
    det correction). src/dst: (N, 3). Returns (4, 4)."""
    if w is None:
        w = jnp.ones(src.shape[:-1], src.dtype)
    wsum = jnp.maximum(w.sum(), 1e-12)
    mu_s = (w[:, None] * src).sum(0) / wsum
    mu_d = (w[:, None] * dst).sum(0) / wsum
    S = ((dst - mu_d) * w[:, None]).T @ (src - mu_s)
    U, _, Vt = jnp.linalg.svd(S)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], src.dtype)).at[2, 2].set(det)
    R = U @ D @ Vt
    t = mu_d - R @ mu_s
    T = jnp.eye(4, dtype=src.dtype).at[:3, :3].set(R).at[:3, 3].set(t)
    return T


def _normalize(v: jnp.ndarray) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def _triad_frame(p: jnp.ndarray) -> jnp.ndarray:
    """Right-handed orthonormal frame (columns) from 3 points (3, 3)."""
    e1 = _normalize(p[1] - p[0])
    u = p[2] - p[0]
    e2 = _normalize(u - jnp.dot(u, e1) * e1)
    e3 = jnp.cross(e1, e2)
    return jnp.stack([e1, e2, e3], axis=-1)  # (3, 3) columns


def _triad_rigid(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Rigid transform dst = R @ src + t from EXACT 3-point correspondences.

    The TRIAD construction: build right-handed orthonormal frames from both
    triangles; R maps one frame onto the other. For exact correspondences
    (what P3P back-substitution produces, up to f32 noise) this equals the
    Kabsch/SVD solution — with zero SVDs, so it stays on the VPU when vmapped
    over RANSAC hypotheses (the batched 3x3 SVD was the single hottest op in
    the localization path on TPU).
    """
    E = _triad_frame(src)
    F = _triad_frame(dst)
    R = F @ E.T
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    t = mu_d - R @ mu_s
    return jnp.eye(4, dtype=src.dtype).at[:3, :3].set(R).at[:3, 3].set(t)


def _solve3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 solve by Cramer's rule (pure VPU arithmetic — batched LU
    with pivoting is scalar-heavy on TPU). A: (..., 3, 3), b: (..., 3)."""
    c0, c1, c2 = A[..., :, 0], A[..., :, 1], A[..., :, 2]
    c1xc2 = jnp.cross(c1, c2)
    det = jnp.sum(c0 * c1xc2, axis=-1)
    inv_det = jnp.where(jnp.abs(det) < 1e-20, 0.0, 1.0 / det)
    x0 = jnp.sum(b * c1xc2, axis=-1)
    x1 = jnp.sum(b * jnp.cross(c2, c0), axis=-1)
    x2 = jnp.sum(b * jnp.cross(c0, c1), axis=-1)
    return jnp.stack([x0, x1, x2], axis=-1) * inv_det[..., None]


def p3p_grunert(X_w: jnp.ndarray, rays: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Grunert P3P: 3 world points + 3 unit bearing rays -> up to 4 poses.

    Args:
      X_w: (3, 3) world points (rows).
      rays: (3, 3) unit bearing vectors in the camera frame (rows), i.e.
            normalized K^-1 [u, v, 1].
    Returns:
      T_cw: (4, 4, 4) candidate world->camera transforms;
      valid: (4,) bool — real quartic root with positive depths.
    """
    dtype = X_w.dtype
    # Side lengths: a = |P2P3|, b = |P1P3|, c = |P1P2|.
    a2 = jnp.sum((X_w[1] - X_w[2]) ** 2)
    b2 = jnp.sum((X_w[0] - X_w[2]) ** 2)
    c2 = jnp.sum((X_w[0] - X_w[1]) ** 2)
    b2 = jnp.maximum(b2, 1e-12)
    cos_a = jnp.dot(rays[1], rays[2])  # alpha: angle subtending side a
    cos_b = jnp.dot(rays[0], rays[2])  # beta:  subtending side b
    cos_g = jnp.dot(rays[0], rays[1])  # gamma: subtending side c

    amc = (a2 - c2) / b2  # (a^2 - c^2)/b^2
    apc = (a2 + c2) / b2
    A4 = (amc - 1.0) ** 2 - 4.0 * (c2 / b2) * cos_a**2
    A3 = 4.0 * (
        amc * (1.0 - amc) * cos_b
        - (1.0 - apc) * cos_a * cos_g
        + 2.0 * (c2 / b2) * cos_a**2 * cos_b
    )
    A2 = 2.0 * (
        amc**2
        - 1.0
        + 2.0 * amc**2 * cos_b**2
        + 2.0 * ((b2 - c2) / b2) * cos_a**2
        - 4.0 * apc * cos_a * cos_b * cos_g
        + 2.0 * ((b2 - a2) / b2) * cos_g**2
    )
    A1 = 4.0 * (
        -amc * (1.0 + amc) * cos_b
        + 2.0 * (a2 / b2) * cos_g**2 * cos_b
        - (1.0 - apc) * cos_a * cos_g
    )
    A0 = (1.0 + amc) ** 2 - 4.0 * (a2 / b2) * cos_g**2

    v, v_ok = solve_quartic(jnp.stack([A4, A3, A2, A1, A0]))  # (4,), (4,)

    # Back-substitution (Haralick eq. 20): u as a rational function of v.
    den_u = 2.0 * (cos_g - v * cos_a)
    den_u = jnp.where(jnp.abs(den_u) < 1e-9, jnp.sign(den_u) * 1e-9 + (den_u == 0) * 1e-9, den_u)
    u = ((-1.0 + amc) * v**2 - 2.0 * amc * cos_b * v + 1.0 + amc) / den_u

    s1 = jnp.sqrt(b2 / jnp.maximum(1.0 + v**2 - 2.0 * v * cos_b, 1e-12))
    s2 = u * s1
    s3 = v * s1
    valid = v_ok & (s1 > 0) & (s2 > 0) & (s3 > 0) & jnp.isfinite(u) & jnp.isfinite(v)

    # Newton-polish the depths on the original law-of-cosines system — the
    # quartic back-substitution loses ~1e-2 relative accuracy in f32; three
    # iterations of the exact 3x3 Newton step recover it.
    def polish(si):
        s1_, s2_, s3_ = si[..., 0], si[..., 1], si[..., 2]
        F = jnp.stack(
            [
                s2_**2 + s3_**2 - 2.0 * s2_ * s3_ * cos_a - a2,
                s1_**2 + s3_**2 - 2.0 * s1_ * s3_ * cos_b - b2,
                s1_**2 + s2_**2 - 2.0 * s1_ * s2_ * cos_g - c2,
            ],
            axis=-1,
        )
        zero = jnp.zeros_like(s1_)
        J = jnp.stack(
            [
                jnp.stack([zero, 2.0 * (s2_ - s3_ * cos_a), 2.0 * (s3_ - s2_ * cos_a)], -1),
                jnp.stack([2.0 * (s1_ - s3_ * cos_b), zero, 2.0 * (s3_ - s1_ * cos_b)], -1),
                jnp.stack([2.0 * (s1_ - s2_ * cos_g), 2.0 * (s2_ - s1_ * cos_g), zero], -1),
            ],
            axis=-2,
        )
        delta = _solve3(J, -F)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        return si + delta

    s_init = jnp.stack([s1, s2, s3], axis=-1)  # (4, 3)
    s_polished = s_init
    for _ in range(3):
        s_polished = polish(s_polished)
    keep = jnp.isfinite(s_polished).all(-1) & (s_polished > 0).all(-1)
    s_polished = jnp.where(keep[..., None], s_polished, s_init)
    s1, s2, s3 = s_polished[..., 0], s_polished[..., 1], s_polished[..., 2]

    # Camera-frame points per candidate, then absolute orientation (TRIAD —
    # exact for minimal correspondences, no SVD in the RANSAC hot loop).
    s = jnp.stack([s1, s2, s3], axis=-1)  # (4 candidates, 3 points)
    Xc = s[:, :, None] * rays[None, :, :]  # (4, 3, 3)
    T = jax.vmap(lambda xc: _triad_rigid(X_w, xc))(Xc.astype(dtype))
    return T, valid


def bearing_rays(uv: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixels (..., 2) -> unit bearing vectors (..., 3) via K^-1."""
    Kinv = jnp.linalg.inv(K)
    h = to_homogeneous(uv)
    r = (Kinv @ h[..., None])[..., 0]
    return r / jnp.maximum(jnp.linalg.norm(r, axis=-1, keepdims=True), 1e-20)


def project_T(T_cw: jnp.ndarray, K: jnp.ndarray, X_w: jnp.ndarray) -> jnp.ndarray:
    """Project world points with [R|t] and K -> (..., 2) pixels."""
    Xc = (T_cw[..., :3, :3] @ X_w[..., None])[..., 0] + T_cw[..., :3, 3]
    p = (K @ Xc[..., None])[..., 0]
    z = p[..., 2:3]
    z = jnp.where(jnp.abs(z) < 1e-9, jnp.where(z < 0, -1e-9, 1e-9), z)
    return p[..., :2] / z


def p3p_solve_sample(
    X4: jnp.ndarray, uv4: jnp.ndarray, K: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """P3P on points 0..2, disambiguated by point 3 (SOLVEPNP_P3P semantics,
    mirroring the reference's 4-point RANSAC samples, p3p.py:51-79).

    X4: (4, 3) world points; uv4: (4, 2) pixels. Returns (T_cw (4,4), ok).
    """
    rays = bearing_rays(uv4[:3], K)
    Ts, valid = p3p_grunert(X4[:3], rays)  # (4,4,4), (4,)
    uv_hat = jax.vmap(lambda T: project_T(T, K, X4[3]))(Ts)  # (4, 2)
    err = jnp.sum((uv_hat - uv4[3]) ** 2, axis=-1)
    # Also require the disambiguation point in front of the camera.
    z3 = jax.vmap(lambda T: (T[2, :3] * X4[3]).sum() + T[2, 3])(Ts)
    # Degeneracy gates: (near-)collinear world samples make the TRIAD frame
    # direction noise-dominated (unlike the SVD/Kabsch path it replaced,
    # which averaged the ambiguity away), and an exactly-collinear one yields
    # a non-orthonormal R with finite entries. ||u x v||^2 relative to
    # ||u||^2||v||^2 is sin^2 of the triangle angle; require sin > 1e-3.
    u, v = X4[1] - X4[0], X4[2] - X4[0]
    cr = jnp.cross(u, v)
    noncollinear = jnp.sum(cr * cr) > 1e-6 * jnp.sum(u * u) * jnp.sum(v * v)
    rigid = jnp.abs(jnp.linalg.det(Ts[:, :3, :3]) - 1.0) < 0.1
    err = jnp.where(valid & (z3 > 0) & rigid & noncollinear, err, jnp.inf)
    best = jnp.argmin(err)
    return Ts[best], jnp.isfinite(err[best])


class PnPResult(NamedTuple):
    T_cw: jnp.ndarray  # (4, 4) world -> camera
    inliers: jnp.ndarray  # (N,) bool
    num_inliers: jnp.ndarray  # () int32
    errors: jnp.ndarray  # (N,) pixel reprojection errors of best model


def pnp_ransac(
    key: jax.Array,
    X_w: jnp.ndarray,
    uv: jnp.ndarray,
    K: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    inlier_threshold_px: float = 1.25,
    outlier_ratio: float = 0.5,
    confidence: float = 0.9999,
    num_hypotheses: int | None = None,
    refine_iters: int = 10,
) -> PnPResult:
    """RANSAC-P3P localization + Gauss-Newton refinement on inliers.

    Ref parity: p3p.py:123-186 (estimate_pose with RANSAC, default
    inlier_threshold ~1.25 px as set by main.py:194-201) and the nonlinear
    refinement of p3p.py:188-213 — with a fixed hypothesis budget and a
    fixed-iteration damped GN instead of scipy.
    """
    n = X_w.shape[0]
    h = num_hypotheses or num_iterations(confidence, outlier_ratio, 4)

    def model_fn(sample):
        sx, suv = sample
        return p3p_solve_sample(sx, suv, K)

    def error_fn(T, data):
        dx, duv = data
        uv_hat = project_T(T, K, dx)
        z = (T[2, :3] * dx).sum(-1) + T[2, 3]
        err = jnp.linalg.norm(uv_hat - duv, axis=-1)
        return jnp.where(z > 0, err, jnp.inf)

    res: RansacResult = ransac(
        key, (X_w, uv), n, 4, h, model_fn, error_fn, inlier_threshold_px, valid
    )
    T = res.model
    if refine_iters:
        T = refine_pose_gn(T, X_w, uv, K, res.inliers.astype(X_w.dtype), iters=refine_iters)
        # Recompute inliers after refinement.
        err = error_fn(T, (X_w, uv))
        inl = err < inlier_threshold_px
        if valid is not None:
            inl = inl & valid
        return PnPResult(T, inl, inl.sum(), err)
    return PnPResult(T, res.inliers, res.num_inliers, res.errors)


def refine_pose_gn(
    T_cw: jnp.ndarray,
    X_w: jnp.ndarray,
    uv: jnp.ndarray,
    K: jnp.ndarray,
    weights: jnp.ndarray,
    iters: int = 10,
    damping: float = 1e-4,
) -> jnp.ndarray:
    """Fixed-iteration Levenberg-damped Gauss-Newton over the se(3) twist.

    Minimizes sum_i w_i ||proj(K (R X_i + t)) - uv_i||^2 with analytic
    Jacobians under a LEFT perturbation T <- exp(xi) T. Replaces
    scipy.optimize.least_squares at p3p.py:210 with a jit/vmap-friendly
    solver (6x6 normal equations on the MXU).
    """
    fx, fy = K[0, 0], K[1, 1]

    def step(T, _):
        Y = (T[:3, :3] @ X_w[..., None])[..., 0] + T[:3, 3]  # (N,3) camera pts
        z = Y[..., 2]
        z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        inv_z = 1.0 / z_safe
        uv_hat = jnp.stack(
            [fx * Y[..., 0] * inv_z + K[0, 2], fy * Y[..., 1] * inv_z + K[1, 2]],
            axis=-1,
        )
        r = uv_hat - uv  # (N, 2)
        w = weights * (z > 1e-6)  # ignore behind-camera points
        # d uv / d Y : (N, 2, 3)
        J_pi = jnp.stack(
            [
                jnp.stack([fx * inv_z, jnp.zeros_like(z), -fx * Y[..., 0] * inv_z**2], -1),
                jnp.stack([jnp.zeros_like(z), fy * inv_z, -fy * Y[..., 1] * inv_z**2], -1),
            ],
            axis=-2,
        )
        # d Y / d xi = [ I | -skew(Y) ] : (N, 3, 6)
        J_xi = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), Y.shape[:-1] + (3, 3)), -skew(Y)],
            axis=-1,
        )
        J = J_pi @ J_xi  # (N, 2, 6)
        Jw = J * w[..., None, None]
        H = jnp.einsum("nij,nik->jk", Jw, J) + damping * jnp.eye(6, dtype=T.dtype)
        g = jnp.einsum("nij,ni->j", Jw, r)
        # H is SPD (J^T W J + damping); solve with the unrolled Cholesky in
        # f32 (ops/linalg.py, precision='highest'). The LU lowering of
        # jnp.linalg.solve is ~1.25x faster for this lone 6x6 system
        # (tools/bench_solvers.py) but runs bf16-pass matmuls on TPU and
        # regresses headline ATE 1.181 -> 1.753 m (48%) for a measured
        # +1.9% fps — the same bf16-pivot failure class ops/linalg.py was
        # written to avoid. Accuracy wins: keep spd_solve_small.
        delta = spd_solve_small(H, -g, 6)
        ok = jnp.isfinite(delta).all()
        delta = jnp.where(ok, delta, jnp.zeros_like(delta))
        return se3_exp(delta) @ T, None

    T, _ = jax.lax.scan(step, T_cw, None, length=iters)
    return T
