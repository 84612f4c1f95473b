"""P3P / PnP tests: synthetic 3D-2D correspondences with planted ground
truth, cv2.solvePnP as the independent oracle (mirrors reference
tests/test_p3p.py strategy)."""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vo_tpu.geom import se3_exp
from vo_tpu.ops.pnp import (
    bearing_rays,
    p3p_grunert,
    p3p_solve_sample,
    pnp_ransac,
    project_T,
    refine_pose_gn,
    solve_quartic,
)

K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)


def make_scene(rng, n=100, noise=0.0):
    xi = np.array([0.4, -0.3, 0.6, 0.1, -0.2, 0.15], np.float32)
    T_cw = np.asarray(se3_exp(jnp.asarray(xi)))
    X_c = rng.uniform([-6, -4, 5], [6, 4, 30], size=(n, 3)).astype(np.float32)
    # Put points in world coordinates so that T_cw maps them back to X_c.
    T_wc = np.linalg.inv(T_cw)
    X_w = (T_wc[:3, :3] @ X_c.T).T + T_wc[:3, 3]
    p = (K @ X_c.T).T
    uv = p[:, :2] / p[:, 2:]
    if noise:
        uv = uv + rng.normal(0, noise, uv.shape)
    return X_w.astype(np.float32), uv.astype(np.float32), T_cw


def test_solve_quartic_known_roots(rng):
    for _ in range(20):
        roots_true = np.sort(rng.uniform(-3, 3, 4))
        c = np.poly(roots_true).astype(np.float32)  # monic coefficients, degree 4
        roots, valid = solve_quartic(jnp.asarray(c))
        roots = np.sort(np.asarray(roots)[np.asarray(valid)])
        assert len(roots) == 4
        np.testing.assert_allclose(roots, roots_true, atol=5e-3)


def test_solve_quartic_two_real(rng):
    # (x^2 + 1)(x - 1)(x - 2) = x^4 - 3x^3 + 3x^2 - 3x + 2
    c = np.array([1.0, -3.0, 3.0, -3.0, 2.0], np.float32)
    roots, valid = solve_quartic(jnp.asarray(c))
    real = np.sort(np.asarray(roots)[np.asarray(valid)])
    np.testing.assert_allclose(real, [1.0, 2.0], atol=1e-4)


def test_p3p_grunert_recovers_pose(rng):
    X_w, uv, T_true = make_scene(rng, 3)
    rays = bearing_rays(jnp.asarray(uv), jnp.asarray(K))
    Ts, valid = p3p_grunert(jnp.asarray(X_w), rays)
    Ts, valid = np.asarray(Ts), np.asarray(valid)
    errs = [np.abs(Ts[i] - T_true).max() for i in range(4) if valid[i]]
    assert len(errs) >= 1
    assert min(errs) < 5e-3


def test_p3p_sample_vs_opencv(rng):
    for trial in range(5):
        X_w, uv, T_true = make_scene(np.random.default_rng(trial), 4)
        T, ok = p3p_solve_sample(jnp.asarray(X_w), jnp.asarray(uv), jnp.asarray(K))
        assert bool(ok)
        T = np.asarray(T)
        np.testing.assert_allclose(T[:3], T_true[:3], atol=1e-2)
        # cv2 oracle on the same 4 points.
        n_sol, rvecs, tvecs = cv2.solveP3P(
            X_w[:3], uv[:3].astype(np.float64), K.astype(np.float64), None,
            flags=cv2.SOLVEPNP_P3P,
        )
        best = min(
            (np.abs(np.c_[cv2.Rodrigues(rvecs[i])[0], tvecs[i]] - T_true[:3]).max()
             for i in range(n_sol)),
        )
        ours = np.abs(T[:3] - T_true[:3]).max()
        assert ours < max(5 * best, 1e-2)


def test_refine_pose_gn_converges(rng):
    X_w, uv, T_true = make_scene(rng, 60, noise=0.0)
    # Perturb the true pose and refine back.
    xi = np.array([0.05, -0.04, 0.06, 0.01, -0.02, 0.015], np.float32)
    T0 = np.asarray(se3_exp(jnp.asarray(xi))) @ T_true
    T = np.asarray(
        refine_pose_gn(
            jnp.asarray(T0), jnp.asarray(X_w), jnp.asarray(uv), jnp.asarray(K),
            jnp.ones(60, jnp.float32), iters=10,
        )
    )
    np.testing.assert_allclose(T[:3], T_true[:3], atol=1e-3)


def test_pnp_ransac_with_outliers(rng):
    X_w, uv, T_true = make_scene(rng, 150, noise=0.3)
    uv_bad = uv.copy()
    uv_bad[:50] += rng.uniform(20, 100, (50, 2)).astype(np.float32)
    res = jax.jit(
        lambda k, X, u: pnp_ransac(k, X, u, jnp.asarray(K), inlier_threshold_px=2.0)
    )(jax.random.PRNGKey(0), jnp.asarray(X_w), jnp.asarray(uv_bad))
    T = np.asarray(res.T_cw)
    np.testing.assert_allclose(T[:3], T_true[:3], atol=2e-2)
    inl = np.asarray(res.inliers)
    assert inl[:50].sum() <= 2
    assert inl[50:].sum() >= 90
    # cv2 oracle end-to-end (ref test_p3p.py:100-113).
    okcv, rvec, tvec, _ = cv2.solvePnPRansac(
        X_w.astype(np.float64), uv_bad.astype(np.float64), K.astype(np.float64),
        None, reprojectionError=2.0, flags=cv2.SOLVEPNP_P3P,
    )
    T_cv = np.c_[cv2.Rodrigues(rvec)[0], tvec]
    np.testing.assert_allclose(T[:3], T_cv, atol=5e-2)


@pytest.mark.slow
def test_pnp_ransac_valid_mask(rng):
    X_w, uv, T_true = make_scene(rng, 128, noise=0.2)
    valid = np.ones(128, bool)
    valid[100:] = False
    X_w[100:] = 1e3  # garbage in dead slots must not matter
    uv[100:] = -1e3
    res = pnp_ransac(
        jax.random.PRNGKey(1), jnp.asarray(X_w), jnp.asarray(uv), jnp.asarray(K),
        valid=jnp.asarray(valid), inlier_threshold_px=2.0,
    )
    T = np.asarray(res.T_cw)
    np.testing.assert_allclose(T[:3], T_true[:3], atol=2e-2)
    assert not np.asarray(res.inliers)[100:].any()


def test_project_T_matches_cv2(rng):
    X_w, uv, T_cw = make_scene(rng, 30)
    ours = np.asarray(project_T(jnp.asarray(T_cw), jnp.asarray(K), jnp.asarray(X_w)))
    rvec = cv2.Rodrigues(T_cw[:3, :3])[0]
    cv, _ = cv2.projectPoints(X_w.astype(np.float64), rvec, T_cw[:3, 3].astype(np.float64),
                              K.astype(np.float64), None)
    np.testing.assert_allclose(ours, cv[:, 0, :], atol=1e-2)


def test_p3p_collinear_sample_rejected():
    """(Near-)collinear minimal samples must be gated out (the TRIAD frame is
    noise-dominated there, unlike the Kabsch path it replaced — ADVICE r1)."""
    import jax.numpy as jnp

    from vo_tpu.ops.pnp import p3p_solve_sample, project_T

    K = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], jnp.float32)
    T_true = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(2.0)
    # Three exactly-collinear points + one off-line disambiguation point.
    X = jnp.asarray(
        [[0.0, 0.0, 10.0], [1.0, 0.0, 10.0], [2.0, 0.0, 10.0], [0.5, 2.0, 9.0]],
        jnp.float32,
    )
    uv = project_T(T_true, K, X)
    _, ok = p3p_solve_sample(X, uv, K)
    assert not bool(ok)
    # A well-conditioned sample still solves.
    X2 = X.at[2].set(jnp.asarray([0.0, 1.5, 11.0]))
    uv2 = project_T(T_true, K, X2)
    T_hat, ok2 = p3p_solve_sample(X2, uv2, K)
    assert bool(ok2)
    assert float(jnp.abs(T_hat - T_true).max()) < 1e-2
