"""Two-view epipolar geometry: 8-point fundamental matrix, essential matrix
decomposition, cheirality-disambiguated relative pose — all batched.

Capability parity with src/vo/landmarks/triangulation.py:110-350
(_find_fundamental_matrix[_ransac], _find_essential_matrix,
_decompose_essential_matrix, _find_relative_pose), with the RANSAC loop
replaced by the fixed-budget vmapped engine (vo_tpu.ops.ransac) and the
per-candidate cheirality loops replaced by batched DLT + mask reductions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vo_tpu.geom.points import normalize_points, to_homogeneous
from vo_tpu.ops.ransac import RansacResult, num_iterations, ransac
from vo_tpu.ops.triangulate import depths_in_frame, triangulate_dlt


def fundamental_8point(
    pts1: jnp.ndarray, pts2: jnp.ndarray, weight: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Normalized 8-point algorithm. pts: (..., N, 2) with N >= 8 -> (..., 3, 3).

    Ref parity: triangulation.py:165-222 — Hartley normalization, Kron
    system, least-squares null vector, rank-2 enforcement, denormalization
    T2^T F T1. The null vector comes from eigh of the 9x9 normal matrix
    (A^T A) — after Hartley normalization its conditioning is fine in f32
    and eigh batches well on TPU. `weight` enables the masked
    all-inlier refit (the reference's final refit, ransac.py:123-127).
    """
    n1, T1 = normalize_points(pts1, weight)
    n2, T2 = normalize_points(pts2, weight)
    h1 = to_homogeneous(n1)  # (..., N, 3)
    h2 = to_homogeneous(n2)
    # Rows of A: kron(x2, x1) so that A f = 0 encodes x2^T F x1 = 0.
    A = h2[..., :, :, None] * h1[..., :, None, :]  # (..., N, 3, 3)
    A = A.reshape(A.shape[:-2] + (9,))  # (..., N, 9)
    Aw = A if weight is None else A * weight[..., :, None]
    AtA = jnp.swapaxes(Aw, -1, -2) @ A  # (..., 9, 9)
    _, vecs = jnp.linalg.eigh(AtA)
    F = vecs[..., :, 0].reshape(vecs.shape[:-2] + (3, 3))
    # Rank-2 enforcement via 3x3 SVD (triangulation.py:209-217).
    U, S, Vt = jnp.linalg.svd(F, full_matrices=False)
    S = S.at[..., 2].set(0.0)
    F = (U * S[..., None, :]) @ Vt
    # Denormalize.
    F = jnp.swapaxes(T2, -1, -2) @ F @ T1
    # Scale-normalize for stable thresholds.
    return F / jnp.maximum(jnp.linalg.norm(F, axis=(-2, -1), keepdims=True), 1e-20)


def sampson_error(F: jnp.ndarray, pts1: jnp.ndarray, pts2: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) distance, (N,) in squared pixels.

    The reference scores RANSAC with the algebraic residual |x2^T F x1|
    (triangulation.py:144-156); Sampson is the standard geometric-consistent
    refinement of the same quantity and what cv2.findFundamentalMat uses, so
    thresholds stay in pixel units.
    """
    h1 = to_homogeneous(pts1)
    h2 = to_homogeneous(pts2)
    Fx1 = (F @ h1[..., None])[..., 0]  # (N, 3)
    Ftx2 = (jnp.swapaxes(F, -1, -2) @ h2[..., None])[..., 0]
    num = jnp.sum(h2 * Fx1, axis=-1) ** 2
    den = Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2 + Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2
    return num / jnp.maximum(den, 1e-20)


def fundamental_ransac(
    key: jax.Array,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    inlier_threshold_px: float = 1.0,
    outlier_ratio: float = 0.5,
    confidence: float = 0.999,
    num_hypotheses: int | None = None,
) -> RansacResult:
    """RANSAC 8-point F estimation. pts: (N, 2) fixed-capacity with `valid`.

    Ref parity: triangulation.py:110-163 (_find_fundamental_matrix_ransac)
    with the fixed-budget engine; threshold is on Sampson distance in px.
    """
    n = pts1.shape[0]
    h = num_hypotheses or num_iterations(confidence, outlier_ratio, 8)

    def model_fn(sample):
        s1, s2 = sample
        F = fundamental_8point(s1, s2)
        # Degenerate samples produce non-finite F.
        ok = jnp.isfinite(F).all()
        return F, ok

    def error_fn(F, data):
        d1, d2 = data
        return sampson_error(F, d1, d2)

    res = ransac(
        key,
        (pts1, pts2),
        num_points=n,
        sample_size=8,
        num_hypotheses=h,
        model_fn=model_fn,
        error_fn=error_fn,
        inlier_threshold=inlier_threshold_px**2,
        valid=valid,
    )
    # Final refit on all inliers (ref parity: ransac.py:123-127), then
    # re-score with the refit model.
    w = res.inliers.astype(pts1.dtype)
    F_refit = fundamental_8point(pts1, pts2, weight=w)
    ok = jnp.isfinite(F_refit).all() & (res.num_inliers >= 8)
    F = jnp.where(ok, F_refit, res.model)
    errors = sampson_error(F, pts1, pts2)
    inl = errors < inlier_threshold_px**2
    if valid is not None:
        inl = inl & valid
    return RansacResult(model=F, inliers=inl, num_inliers=inl.sum(), errors=errors)


def essential_from_fundamental(
    F: jnp.ndarray, K1: jnp.ndarray, K2: jnp.ndarray
) -> jnp.ndarray:
    """E = K2^T F K1 (triangulation.py:224-243), projected onto the essential
    manifold (two equal singular values, third zero)."""
    E = jnp.swapaxes(K2, -1, -2) @ F @ K1
    U, S, Vt = jnp.linalg.svd(E)
    s = 0.5 * (S[..., 0] + S[..., 1])
    S_fix = jnp.stack([s, s, jnp.zeros_like(s)], axis=-1)
    return (U * S_fix[..., None, :]) @ Vt


class RelativePose(NamedTuple):
    T_21: jnp.ndarray  # (4, 4) transform frame1 -> frame2 ([R|t] with unit t)
    points1: jnp.ndarray  # (N, 3) triangulated points in frame-1 coordinates
    good: jnp.ndarray  # (N,) bool cheirality mask (positive depth both views)


def decompose_essential(E: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """E -> (4, 3, 3) rotation candidates paired with (4, 3) translations.

    Ref parity: triangulation.py:245-277 — the four [R | ±t] candidates with
    determinant-sign correction.
    """
    U, _, Vt = jnp.linalg.svd(E)
    # Ensure proper rotations.
    detU = jnp.linalg.det(U)
    detVt = jnp.linalg.det(Vt)
    U = U * jnp.stack([jnp.ones_like(detU), jnp.ones_like(detU), detU], -1)[..., None, :]
    Vt = Vt * jnp.stack([jnp.ones_like(detVt), jnp.ones_like(detVt), detVt], -1)[..., :, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-20)
    Rs = jnp.stack([R1, R1, R2, R2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return Rs, ts


def relative_pose_from_essential(
    E: jnp.ndarray,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    K1: jnp.ndarray,
    K2: jnp.ndarray,
    weight: jnp.ndarray | None = None,
) -> RelativePose:
    """Disambiguate the four E decompositions by cheirality vote and
    triangulate all points with the winner.

    Ref parity: triangulation.py:279-350 (_find_relative_pose) — but the
    4-way candidate loop and the per-point triangulation loops are one
    batched DLT over a stacked (4, N) problem.

    pts are PIXEL coordinates; K projects. `weight` masks the vote (and the
    returned mask) to valid rows in fixed-capacity settings.
    """
    Rs, ts = decompose_essential(E)  # (4,3,3), (4,3)
    eye34 = jnp.concatenate([jnp.eye(3, dtype=E.dtype), jnp.zeros((3, 1), E.dtype)], axis=1)
    P1 = K1 @ eye34  # (3,4)
    Rt = jnp.concatenate([Rs, ts[..., None]], axis=-1)  # (4,3,4)
    P2 = K2 @ Rt  # (4,3,4)

    def tri_one(P2_c, R_c, t_c):
        X1 = triangulate_dlt(P1, P2_c, pts1, pts2)  # frame-1 coords
        z1 = X1[..., 2]
        z2 = (R_c[2] * X1).sum(-1) + t_c[2]
        return X1, (z1 > 0) & (z2 > 0)

    X1_all, front_all = jax.vmap(tri_one)(P2, Rs, ts)  # (4,N,3), (4,N)
    votes = front_all if weight is None else front_all & weight[None, :]
    best = jnp.argmax(jnp.sum(votes, axis=1))
    R, t = Rs[best], ts[best]
    T = jnp.zeros((4, 4), E.dtype)
    T = T.at[:3, :3].set(R).at[:3, 3].set(t).at[3, 3].set(1.0)
    return RelativePose(T_21=T, points1=X1_all[best], good=front_all[best])
