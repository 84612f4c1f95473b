"""Camera distortion: cv2 as oracle for the forward model, round-trip for
the inverse (both are stubs in the reference, camera.py:38-54)."""

import cv2
import numpy as np
import jax.numpy as jnp

from vo_tpu.geom.camera import Camera

K = np.array([[450.0, 0, 320], [0, 460.0, 240], [0, 0, 1]], np.float32)
DIST = np.array([-0.28, 0.07, 1e-3, -2e-3, 0.0], np.float32)


def _grid():
    xs = np.linspace(60, 580, 12)
    ys = np.linspace(60, 420, 9)
    return np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2).astype(np.float32)


def test_distort_matches_opencv():
    cam = Camera.create(K, dist=DIST)
    px = _grid()
    ours = np.asarray(cam.distort_points(jnp.asarray(px)))
    # cv2.projectPoints applies the same Brown-Conrady model to normalized pts.
    n = cv2.undistortPoints(px.reshape(-1, 1, 2), K, None).reshape(-1, 2)
    pts3 = np.concatenate([n, np.ones((len(n), 1))], axis=1).astype(np.float64)
    cv_px, _ = cv2.projectPoints(pts3, np.zeros(3), np.zeros(3), K.astype(np.float64),
                                 DIST.astype(np.float64))
    np.testing.assert_allclose(ours, cv_px.reshape(-1, 2), atol=5e-2)


def test_undistort_round_trip():
    cam = Camera.create(K, dist=DIST)
    px = _grid()
    distorted = cam.distort_points(jnp.asarray(px))
    recovered = np.asarray(cam.undistort_points(distorted))
    np.testing.assert_allclose(recovered, px, atol=1e-2)


def test_zero_distortion_is_identity():
    cam = Camera.create(K)
    px = _grid()
    np.testing.assert_allclose(np.asarray(cam.distort_points(jnp.asarray(px))), px, atol=1e-4)
