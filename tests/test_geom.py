"""Oracle tests for the math core (mirrors reference tests/test_helpers.py
strategy: hand-computed expectations + statistical invariants + scipy as the
independent second implementation)."""

import numpy as np
import pytest
import scipy.linalg

import jax
import jax.numpy as jnp

from vo_tpu.geom import (
    Camera,
    normalize_points,
    pose_inverse,
    project,
    se3_exp,
    se3_log,
    skew,
    so3_exp,
    so3_log,
    to_cartesian,
    to_homogeneous,
    transform_points,
    unskew,
)


def test_homogeneous_roundtrip(rng):
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    h = to_homogeneous(jnp.asarray(pts))
    assert h.shape == (10, 4)
    np.testing.assert_array_equal(np.asarray(h[..., :3]), pts)
    np.testing.assert_array_equal(np.asarray(h[..., 3]), 1.0)
    back = to_cartesian(h)
    np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-6)


def test_cartesian_scale_invariance(rng):
    pts = rng.normal(size=(7, 4)).astype(np.float32)
    pts[:, 3] = np.abs(pts[:, 3]) + 0.5
    scaled = pts * rng.uniform(0.5, 2.0, size=(7, 1)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(to_cartesian(jnp.asarray(scaled))),
        pts[:, :3] / pts[:, 3:],
        rtol=1e-5,
    )


def test_normalize_points_invariants(rng):
    """Hartley invariants: zero mean, mean radius sqrt(D), T consistency
    (same invariants as reference test_helpers.py:36-91)."""
    for d in (2, 3):
        pts = rng.normal(size=(200, d)).astype(np.float32) * 13 + 5
        norm, T = normalize_points(jnp.asarray(pts))
        norm = np.asarray(norm)
        np.testing.assert_allclose(norm.mean(axis=0), 0.0, atol=1e-4)
        np.testing.assert_allclose(
            np.linalg.norm(norm, axis=1).mean(), np.sqrt(d), rtol=1e-5
        )
        # T applied to homogeneous points reproduces the normalization.
        h = np.concatenate([pts, np.ones((200, 1), np.float32)], axis=1)
        via_T = (np.asarray(T) @ h.T).T
        np.testing.assert_allclose(via_T[:, :d], norm, atol=1e-4)
        np.testing.assert_allclose(via_T[:, d], 1.0, atol=1e-6)


def test_normalize_points_batched(rng):
    pts = rng.normal(size=(4, 50, 2)).astype(np.float32)
    norm, T = normalize_points(jnp.asarray(pts))
    assert norm.shape == (4, 50, 2)
    assert T.shape == (4, 3, 3)
    single, T0 = normalize_points(jnp.asarray(pts[2]))
    np.testing.assert_allclose(np.asarray(norm[2]), np.asarray(single), atol=1e-6)
    np.testing.assert_allclose(np.asarray(T[2]), np.asarray(T0), atol=1e-6)


def test_skew_cross_product(rng):
    a = rng.normal(size=(5, 3)).astype(np.float32)
    b = rng.normal(size=(5, 3)).astype(np.float32)
    S = np.asarray(skew(jnp.asarray(a)))
    for i in range(5):
        np.testing.assert_allclose(
            S[i] @ b[i], np.cross(a[i], b[i]), rtol=1e-5, atol=1e-6
        )
    np.testing.assert_allclose(np.asarray(unskew(jnp.asarray(S))), a, atol=1e-6)


@pytest.mark.parametrize("scale", [1e-8, 1e-4, 0.5, 2.0, 3.1])
def test_so3_exp_log_roundtrip_vs_scipy(rng, scale):
    w = rng.normal(size=(8, 3))
    w = (w / np.linalg.norm(w, axis=1, keepdims=True) * scale).astype(np.float64)
    R = np.asarray(so3_exp(jnp.asarray(w, jnp.float64) if jax.config.read("jax_enable_x64") else jnp.asarray(w, jnp.float32)))
    for i in range(8):
        R_scipy = scipy.linalg.expm(np.asarray(skew(jnp.asarray(w[i], jnp.float32))))
        np.testing.assert_allclose(R[i], R_scipy, atol=1e-5)
    back = np.asarray(so3_log(jnp.asarray(R, jnp.float32)))
    np.testing.assert_allclose(back, w, atol=2e-4 if scale > 3 else 1e-5)


def test_so3_log_near_pi(rng):
    for axis in (np.array([1.0, 0, 0]), np.array([0, 1.0, 0]),
                 np.array([0.6, -0.8, 0]), np.array([1, 1, 1]) / np.sqrt(3)):
        for theta in (np.pi - 1e-3, np.pi - 1e-5):
            w = (axis * theta).astype(np.float32)
            R = so3_exp(jnp.asarray(w))
            back = np.asarray(so3_log(R))
            np.testing.assert_allclose(back, w, atol=5e-3)


def test_se3_exp_log_vs_scipy(rng):
    """Closed form matches scipy expm/logm (ref helpers.py:86-128 oracle)."""
    xi = rng.normal(size=(6, 6)).astype(np.float32) * 0.8
    H = np.asarray(se3_exp(jnp.asarray(xi)))
    for i in range(6):
        hat = np.zeros((4, 4))
        hat[:3, :3] = np.asarray(skew(jnp.asarray(xi[i, 3:])))
        hat[:3, 3] = xi[i, :3]
        np.testing.assert_allclose(H[i], scipy.linalg.expm(hat), atol=1e-5)
    back = np.asarray(se3_log(jnp.asarray(H)))
    np.testing.assert_allclose(back, xi, atol=1e-4)


def test_pose_inverse(rng):
    xi = rng.normal(size=(4, 6)).astype(np.float32)
    H = se3_exp(jnp.asarray(xi))
    inv = np.asarray(pose_inverse(H))
    for i in range(4):
        np.testing.assert_allclose(inv[i], np.linalg.inv(np.asarray(H[i])), atol=1e-5)


def test_camera_projection(rng):
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)
    xi = np.array([0.3, -0.2, 0.5, 0.1, -0.05, 0.2], np.float32)
    pose = se3_exp(jnp.asarray(xi))
    cam = Camera.create(K, pose=pose)

    X_w = rng.normal(size=(20, 3)).astype(np.float32)
    X_w[:, 2] += 8.0
    # Oracle: manual K [R|t] X with [R|t] = inv(pose).
    T_cw = np.linalg.inv(np.asarray(pose))
    Xc = (T_cw[:3, :3] @ X_w.T).T + T_cw[:3, 3]
    uv_expect = (K @ Xc.T).T
    uv_expect = uv_expect[:, :2] / uv_expect[:, 2:]

    np.testing.assert_allclose(
        np.asarray(cam.project_world(jnp.asarray(X_w))), uv_expect, rtol=1e-4, atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(cam.project_camera(jnp.asarray(Xc))), uv_expect, rtol=1e-4, atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(project(jnp.asarray(cam.projection_matrix), jnp.asarray(X_w))),
        uv_expect, rtol=1e-4, atol=1e-2,
    )
    # normalized coords invert K.
    n = np.asarray(cam.normalized_coords(jnp.asarray(uv_expect, jnp.float32)))
    np.testing.assert_allclose(n, Xc[:, :2] / Xc[:, 2:], atol=1e-4)
    # transform_points matches pose action.
    np.testing.assert_allclose(
        np.asarray(transform_points(jnp.asarray(T_cw, jnp.float32), jnp.asarray(X_w))),
        Xc, atol=1e-4,
    )


def test_camera_is_pytree():
    cam = Camera.create(np.eye(3, dtype=np.float32))
    leaves = jax.tree_util.tree_leaves(cam)
    assert len(leaves) == 3

    @jax.jit
    def f(c: Camera):
        return c.projection_matrix

    np.testing.assert_allclose(np.asarray(f(cam)), np.eye(3, 4), atol=1e-6)
