"""RANSAC at the reference's operating point: outlier_ratio=0.9,
confidence=0.9999 -> ~1e4 hypotheses (ref p3p.py:14-49 + the iteration
formula ransac.py:58-67, capped at max_iterations=10000). The fixed-budget
engine runs such budgets as a lax.scan of vmapped chunks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vo_tpu.geom.lie import pose_inverse
from vo_tpu.ops.pnp import pnp_ransac, project_T
from vo_tpu.ops.epipolar import fundamental_ransac, sampson_error
from vo_tpu.ops.ransac import num_iterations, ransac


def _camera_scene(rng, n, n_inlier, noise_px=0.3):
    """Planted 2D-3D correspondences: n_inlier true projections of a known
    pose, the rest uniform-random pixel garbage."""
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    # Ground-truth camera: a small rotation + translation.
    aa = np.deg2rad(8.0)
    R = np.array(
        [[np.cos(aa), 0, np.sin(aa)], [0, 1, 0], [-np.sin(aa), 0, np.cos(aa)]],
        np.float32,
    )
    t = np.array([0.3, -0.1, 0.5], np.float32)
    T_cw = np.eye(4, dtype=np.float32)
    T_cw[:3, :3] = R
    T_cw[:3, 3] = t
    X = rng.uniform([-8, -5, 4], [8, 5, 30], (n, 3)).astype(np.float32)
    Xc = X @ R.T + t
    uv_true = (Xc / Xc[:, 2:3]) @ K.T
    uv = uv_true[:, :2] + rng.normal(0, noise_px, (n, 2))
    # Outliers: random pixels (uncorrelated with geometry).
    out_mask = np.ones(n, bool)
    out_mask[:n_inlier] = False
    uv[out_mask] = rng.uniform([0, 0], [640, 480], (out_mask.sum(), 2))
    return K, T_cw, X.astype(np.float32), uv.astype(np.float32), ~out_mask


def test_num_iterations_reference_operating_point():
    # ref ransac.py:58-67 with conf=.9999, eps=.9, s=4 blows past the cap.
    assert num_iterations(0.9999, 0.9, 4, max_iterations=10000) == 10000
    # Moderate case stays under it.
    assert 1 < num_iterations(0.99, 0.5, 4, max_iterations=10000) < 100


def test_pnp_recovers_at_90pct_outliers():
    rng = np.random.default_rng(7)
    n = 512
    K, T_cw, X, uv, inl = _camera_scene(rng, n, n_inlier=51)
    res = pnp_ransac(
        jax.random.PRNGKey(0), jnp.asarray(X), jnp.asarray(uv), jnp.asarray(K),
        inlier_threshold_px=2.0,
        num_hypotheses=num_iterations(0.9999, 0.9, 4, max_iterations=10000),
    )
    T = np.asarray(res.T_cw)
    # Rotation within 0.5 deg, translation within 5 cm.
    dR = T[:3, :3] @ T_cw[:3, :3].T
    ang = np.rad2deg(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.5, f"rotation error {ang:.3f} deg"
    assert np.linalg.norm(T[:3, 3] - T_cw[:3, 3]) < 0.05
    # It must have found (most of) the planted inliers, not a random clique.
    found = np.asarray(res.inliers)
    assert (found & inl).sum() >= 0.9 * inl.sum()


def test_fundamental_recovers_at_50pct_outliers():
    """s=8 bounds the feasible outlier ratio: an all-inlier 8-sample has
    probability (1-eps)^8, so eps=0.8 would need ~1e7 draws — no RANSAC
    (the reference's cap of 10000 included) can do that by uniform
    sampling. 50 % is the honest stress point for the 8-point model; the
    90 % stress case lives on the s=4 PnP path above."""
    rng = np.random.default_rng(11)
    n = 512
    n_inl = 256
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    aa = np.deg2rad(5.0)
    R = np.array(
        [[np.cos(aa), 0, np.sin(aa)], [0, 1, 0], [-np.sin(aa), 0, np.cos(aa)]],
        np.float32,
    )
    t = np.array([1.0, 0.05, 0.2], np.float32)
    X = rng.uniform([-8, -5, 4], [8, 5, 30], (n, 3)).astype(np.float32)
    uv1 = (X / X[:, 2:3]) @ K.T
    Xc2 = X @ R.T + t
    uv2 = (Xc2 / Xc2[:, 2:3]) @ K.T
    p1 = uv1[:, :2] + rng.normal(0, 0.3, (n, 2))
    p2 = uv2[:, :2] + rng.normal(0, 0.3, (n, 2))
    p2[n_inl:] = rng.uniform([0, 0], [640, 480], (n - n_inl, 2))
    res = fundamental_ransac(
        jax.random.PRNGKey(1), jnp.asarray(p1, jnp.float32),
        jnp.asarray(p2, jnp.float32),
        inlier_threshold_px=1.5,
        num_hypotheses=num_iterations(0.999, 0.5, 8, max_iterations=10000),
    )
    found = np.asarray(res.inliers)
    planted = np.zeros(n, bool)
    planted[:n_inl] = True
    assert (found & planted).sum() >= 0.85 * n_inl
    # Planted inliers satisfy the recovered epipolar constraint tightly.
    err = np.asarray(
        sampson_error(res.model, jnp.asarray(p1, jnp.float32)[:n_inl],
                      jnp.asarray(p2, jnp.float32)[:n_inl])
    )
    assert np.median(err) < 1.5**2


@pytest.mark.slow
def test_chunked_matches_unchunked():
    """Same key + same total budget => identical sampling, equivalent best
    score whether solved in one vmap block or a scan of chunks."""
    rng = np.random.default_rng(3)
    K, T_cw, X, uv, _ = _camera_scene(rng, 256, n_inlier=128)

    def run(chunk):
        return pnp_ransac(
            jax.random.PRNGKey(5), jnp.asarray(X), jnp.asarray(uv),
            jnp.asarray(K), inlier_threshold_px=2.0, num_hypotheses=512,
            refine_iters=0,
        ) if chunk is None else _run_chunk(chunk)

    def _run_chunk(chunk):
        from vo_tpu.ops.pnp import p3p_solve_sample

        def model_fn(sample):
            sx, suv = sample
            return p3p_solve_sample(sx, suv, jnp.asarray(K))

        def error_fn(T, data):
            dx, duv = data
            uv_hat = project_T(T, jnp.asarray(K), dx)
            z = (T[2, :3] * dx).sum(-1) + T[2, 3]
            err = jnp.linalg.norm(uv_hat - duv, axis=-1)
            return jnp.where(z > 0, err, jnp.inf)

        return ransac(
            jax.random.PRNGKey(5), (jnp.asarray(X), jnp.asarray(uv)), 256, 4,
            512, model_fn, error_fn, 2.0, chunk_size=chunk,
        )

    full = _run_chunk(1024)  # single block
    chunked = _run_chunk(64)  # 8-chunk scan
    assert int(full.num_inliers) == pytest.approx(int(chunked.num_inliers), abs=2)
    assert int(chunked.num_inliers) >= 100
