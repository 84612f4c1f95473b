"""Two-view geometry tests: analytic camera-pair fixtures with planted ground
truth, OpenCV as the independent oracle (same strategy as reference
tests/test_triangulation.py and test_ransac.py)."""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vo_tpu.geom import se3_exp, pose_inverse
from vo_tpu.ops.epipolar import (
    decompose_essential,
    essential_from_fundamental,
    fundamental_8point,
    fundamental_ransac,
    relative_pose_from_essential,
    sampson_error,
)
from vo_tpu.ops.ransac import num_iterations, ransac
from vo_tpu.ops.triangulate import reprojection_error, triangulate_dlt

K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)


def make_two_view(rng, n=100, noise=0.0):
    """Analytic two-camera fixture with known relative pose (cam1 at origin).

    Returns pts1, pts2 (pixels), X (3D in cam1 frame), T_21 (cam1->cam2).
    """
    xi = np.array([0.5, -0.1, 0.2, 0.03, 0.25, -0.04], np.float32)  # (v, w)
    T_21 = np.asarray(se3_exp(jnp.asarray(xi)))  # cam2_T_cam1
    X = rng.uniform([-5, -3, 4], [5, 3, 25], size=(n, 3)).astype(np.float32)
    p1 = (K @ X.T).T
    pts1 = p1[:, :2] / p1[:, 2:]
    X2 = (T_21[:3, :3] @ X.T).T + T_21[:3, 3]
    p2 = (K @ X2.T).T
    pts2 = p2[:, :2] / p2[:, 2:]
    if noise:
        pts1 = pts1 + rng.normal(0, noise, pts1.shape).astype(np.float32)
        pts2 = pts2 + rng.normal(0, noise, pts2.shape).astype(np.float32)
    return pts1.astype(np.float32), pts2.astype(np.float32), X, T_21


def test_fundamental_8point_epipolar_constraint(rng):
    pts1, pts2, _, _ = make_two_view(rng, 60)
    F = np.asarray(fundamental_8point(jnp.asarray(pts1), jnp.asarray(pts2)))
    h1 = np.c_[pts1, np.ones(len(pts1))]
    h2 = np.c_[pts2, np.ones(len(pts2))]
    residuals = np.abs(np.einsum("ni,ij,nj->n", h2, F, h1))
    # Algebraic cost tiny on noise-free data (ref test_triangulation.py:78-177).
    assert residuals.max() < 1e-4
    assert np.linalg.matrix_rank(F.astype(np.float64), tol=1e-5) == 2


def test_fundamental_matches_opencv(rng):
    pts1, pts2, _, _ = make_two_view(rng, 60)
    F = np.asarray(fundamental_8point(jnp.asarray(pts1), jnp.asarray(pts2)))
    F_cv, _ = cv2.findFundamentalMat(pts1, pts2, cv2.FM_8POINT)
    F_cv = F_cv / np.linalg.norm(F_cv)
    F = F / np.linalg.norm(F)
    if np.sign(F[2, 2]) != np.sign(F_cv[2, 2]):
        F = -F
    np.testing.assert_allclose(F, F_cv, atol=2e-4)


def test_sampson_error_separates_outliers(rng):
    pts1, pts2, _, _ = make_two_view(rng, 80, noise=0.2)
    F = np.asarray(fundamental_8point(jnp.asarray(pts1), jnp.asarray(pts2)))
    err_in = np.asarray(sampson_error(jnp.asarray(F), jnp.asarray(pts1), jnp.asarray(pts2)))
    bad2 = pts2 + rng.uniform(20, 60, pts2.shape).astype(np.float32)
    err_out = np.asarray(sampson_error(jnp.asarray(F), jnp.asarray(pts1), jnp.asarray(bad2)))
    assert np.sqrt(np.median(err_in)) < 1.0
    assert np.sqrt(np.median(err_out)) > 5.0


def test_fundamental_ransac_rejects_planted_outliers(rng):
    pts1, pts2, _, _ = make_two_view(rng, 120, noise=0.3)
    n_out = 40
    pts2_corrupt = pts2.copy()
    pts2_corrupt[:n_out] += rng.uniform(15, 80, (n_out, 2)).astype(np.float32)
    res = jax.jit(
        lambda k, a, b: fundamental_ransac(
            k, a, b, inlier_threshold_px=1.5, outlier_ratio=0.5, confidence=0.999
        )
    )(jax.random.PRNGKey(0), jnp.asarray(pts1), jnp.asarray(pts2_corrupt))
    inl = np.asarray(res.inliers)
    # Outlier rows must be rejected, most inlier rows kept.
    assert inl[:n_out].sum() <= 2
    assert inl[n_out:].sum() >= 80 * 0.85


def test_essential_decomposition_recovers_pose(rng):
    pts1, pts2, X, T_21 = make_two_view(rng, 100)
    F = fundamental_8point(jnp.asarray(pts1), jnp.asarray(pts2))
    E = essential_from_fundamental(F, jnp.asarray(K), jnp.asarray(K))
    Rs, ts = decompose_essential(E)
    Rs, ts = np.asarray(Rs), np.asarray(ts)
    t_true = T_21[:3, 3] / np.linalg.norm(T_21[:3, 3])
    best = min(
        range(4),
        key=lambda i: np.linalg.norm(Rs[i] - T_21[:3, :3]) + np.linalg.norm(ts[i] - t_true),
    )
    # R exact, t up to scale (ref test_triangulation.py:180-229).
    np.testing.assert_allclose(Rs[best], T_21[:3, :3], atol=2e-3)
    np.testing.assert_allclose(ts[best], t_true, atol=2e-3)


def test_relative_pose_cheirality_disambiguation(rng):
    pts1, pts2, X, T_21 = make_two_view(rng, 100)
    F = fundamental_8point(jnp.asarray(pts1), jnp.asarray(pts2))
    E = essential_from_fundamental(F, jnp.asarray(K), jnp.asarray(K))
    rp = relative_pose_from_essential(
        E, jnp.asarray(pts1), jnp.asarray(pts2), jnp.asarray(K), jnp.asarray(K)
    )
    T = np.asarray(rp.T_21)
    np.testing.assert_allclose(T[:3, :3], T_21[:3, :3], atol=2e-3)
    t_true = T_21[:3, 3] / np.linalg.norm(T_21[:3, 3])
    np.testing.assert_allclose(T[:3, 3], t_true, atol=2e-3)
    assert np.asarray(rp.good).mean() > 0.97
    # Triangulated points match ground truth up to the translation scale.
    scale = np.linalg.norm(T_21[:3, 3])
    X_rec = np.asarray(rp.points1) * scale
    good = np.asarray(rp.good)
    np.testing.assert_allclose(X_rec[good], X[good], rtol=0.02, atol=0.05)


def test_triangulate_dlt_vs_opencv(rng):
    pts1, pts2, X, T_21 = make_two_view(rng, 50, noise=0.2)
    P1 = K @ np.eye(3, 4, dtype=np.float32)
    P2 = K @ T_21[:3, :4]
    ours = np.asarray(triangulate_dlt(jnp.asarray(P1), jnp.asarray(P2),
                                      jnp.asarray(pts1), jnp.asarray(pts2)))
    cv = cv2.triangulatePoints(P1, P2, pts1.T, pts2.T)
    cv = (cv[:3] / cv[3:]).T
    np.testing.assert_allclose(ours, cv, rtol=5e-3, atol=2e-2)
    np.testing.assert_allclose(ours, X, rtol=0.05, atol=0.1)


def test_triangulate_dlt_per_point_poses(rng):
    """Per-point first-view poses — the continuous-candidate case
    (ref triangulation.py:50-57)."""
    X = rng.uniform([-5, -3, 6], [5, 3, 20], size=(30, 3)).astype(np.float32)
    P2 = K @ np.eye(3, 4, dtype=np.float32)
    P1s, pts1 = [], []
    for i in range(30):
        xi = rng.normal(0, 0.1, 6).astype(np.float32)
        xi[:3] += np.array([1.0, 0, 0], np.float32) * (1 + i % 3)
        T = np.asarray(se3_exp(jnp.asarray(xi)))
        P = K @ T[:3, :4]
        p = P @ np.r_[X[i], 1.0]
        P1s.append(P)
        pts1.append(p[:2] / p[2])
    P1s = np.stack(P1s).astype(np.float32)
    pts1 = np.stack(pts1).astype(np.float32)
    p2 = (K @ X.T).T
    pts2 = (p2[:, :2] / p2[:, 2:]).astype(np.float32)
    ours = np.asarray(
        triangulate_dlt(jnp.asarray(P1s), jnp.asarray(P2), jnp.asarray(pts1), jnp.asarray(pts2))
    )
    np.testing.assert_allclose(ours, X, rtol=5e-3, atol=2e-2)


def test_reprojection_error(rng):
    pts1, pts2, X, _ = make_two_view(rng, 40)
    P1 = jnp.asarray(K @ np.eye(3, 4, dtype=np.float32))
    err = np.asarray(reprojection_error(P1, jnp.asarray(X), jnp.asarray(pts1)))
    assert err.max() < 1e-2


def test_generic_ransac_line_fit(rng):
    """Generic engine recovers a planted line among outliers (analog of
    reference test_ransac.py parabola test)."""
    n = 200
    x = rng.uniform(-10, 10, n).astype(np.float32)
    slope, intercept = 1.7, -3.2
    y = slope * x + intercept + rng.normal(0, 0.05, n).astype(np.float32)
    y[:80] += rng.uniform(5, 30, 80).astype(np.float32)  # outliers

    data = (jnp.asarray(x), jnp.asarray(y))

    def model_fn(sample):
        sx, sy = sample
        dx = sx[1] - sx[0]
        ok = jnp.abs(dx) > 1e-6
        a = (sy[1] - sy[0]) / jnp.where(ok, dx, 1.0)
        b = sy[0] - a * sx[0]
        return (a, b), ok

    def error_fn(model, data):
        a, b = model
        dx, dy = data
        return jnp.abs(a * dx + b - dy)

    h = num_iterations(0.999, 0.5, 2)
    res = ransac(
        jax.random.PRNGKey(1), data, n, 2, h, model_fn, error_fn, inlier_threshold=0.3
    )
    a, b = (float(res.model[0]), float(res.model[1]))
    assert abs(a - slope) < 0.02 and abs(b - intercept) < 0.15
    inl = np.asarray(res.inliers)
    assert inl[:80].sum() <= 3 and inl[80:].sum() >= 100


def test_ransac_valid_mask(rng):
    """Fixed-capacity semantics: invalid slots are never sampled nor counted."""
    n = 64
    x = rng.uniform(-5, 5, n).astype(np.float32)
    y = 2.0 * x + 1.0
    y[32:] = rng.uniform(50, 90, 32).astype(np.float32)  # garbage in invalid slots
    valid = np.zeros(n, bool)
    valid[:32] = True

    def model_fn(sample):
        sx, sy = sample
        a = (sy[1] - sy[0]) / jnp.where(jnp.abs(sx[1] - sx[0]) > 1e-6, sx[1] - sx[0], 1.0)
        return (a, sy[0] - a * sx[0]), jnp.abs(sx[1] - sx[0]) > 1e-6

    def error_fn(model, data):
        a, b = model
        return jnp.abs(a * data[0] + b - data[1])

    res = ransac(
        jax.random.PRNGKey(3), (jnp.asarray(x), jnp.asarray(y)), n, 2, 64,
        model_fn, error_fn, 0.1, valid=jnp.asarray(valid),
    )
    assert not np.asarray(res.inliers)[32:].any()
    assert float(res.model[0]) == pytest.approx(2.0, abs=1e-4)
    assert int(res.num_inliers) == 32
