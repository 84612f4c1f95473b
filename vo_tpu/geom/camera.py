"""Pinhole camera model.

Capability parity with the reference's src/vo/sensors/camera.py (projection
matrix :31, world/camera-frame projection :56-78, normalized image
coordinates :80-92, c_T_w :95-100), re-designed as an immutable pytree so a
Camera can ride through jit/vmap/scan. Unlike the reference — whose
distort_points/undistort are stubs (camera.py:38-54, body `pass`) — the full
Brown-Conrady radial-tangential model is implemented (forward + fixed-point
inverse), batched and jit-friendly.

Pose conventions used across vo_tpu:
  pose   = w_T_c : camera-to-world ("where the camera sits in the world");
  extrin = c_T_w = pose^-1 : world-to-camera, the classic [R|t];
  projection of world point X: u ~ K @ (c_T_w @ X_h)[:3].
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from vo_tpu.geom.lie import pose_inverse
from vo_tpu.geom.points import to_cartesian, to_homogeneous


class Camera(NamedTuple):
    """Intrinsics (+ optional pose). All arrays are jax-compatible.

    K: (3, 3) intrinsic matrix.
    pose: (4, 4) w_T_c camera-to-world transform (defaults to identity).
    dist: (5,) distortion coefficients, stored but not applied (ref parity:
          camera.py:38-54 are stubs).
    """

    K: jnp.ndarray
    pose: jnp.ndarray
    dist: jnp.ndarray

    @classmethod
    def create(cls, K, pose=None, dist=None) -> "Camera":
        K = jnp.asarray(K, jnp.float32)
        pose = jnp.eye(4, dtype=jnp.float32) if pose is None else jnp.asarray(pose, jnp.float32)
        dist = jnp.zeros(5, jnp.float32) if dist is None else jnp.asarray(dist, jnp.float32)
        return cls(K=K, pose=pose, dist=dist)

    @property
    def extrinsics(self) -> jnp.ndarray:
        """c_T_w (4, 4). Ref parity: camera.py:95-100 (c_T_w)."""
        return pose_inverse(self.pose)

    @property
    def projection_matrix(self) -> jnp.ndarray:
        """P = K @ (c_T_w)[:3, :4]. Ref parity: camera.py:31-36."""
        return self.K @ self.extrinsics[:3, :4]

    def project_world(self, points_w: jnp.ndarray) -> jnp.ndarray:
        """World points (..., 3) -> pixels (..., 2). Ref: camera.py:56-65."""
        return project(self.projection_matrix, points_w)

    def project_camera(self, points_c: jnp.ndarray) -> jnp.ndarray:
        """Camera-frame points (..., 3) -> pixels (..., 2). Ref: camera.py:67-78."""
        return to_cartesian((self.K @ points_c[..., None])[..., 0])

    def normalized_coords(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """Pixels (..., 2) -> normalized image coords (..., 2) via K^-1.

        Ref parity: camera.py:80-92 (to_normalized_image_coordinates).
        """
        Kinv = jnp.linalg.inv(self.K)
        ph = to_homogeneous(pixels)
        return to_cartesian((Kinv @ ph[..., None])[..., 0])

    def unproject(self, pixels: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
        """Pixels (..., 2) + depth (...,) -> camera-frame points (..., 3)."""
        n = self.normalized_coords(pixels)
        rays = to_homogeneous(n)
        return rays * depth[..., None]

    def distort_points(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """Apply radial-tangential (k1, k2, p1, p2, k3) distortion to ideal
        pixel coordinates (..., 2).

        The reference declares this interface but leaves it a stub
        (camera.py:38-47, body `pass`); here it is the full Brown-Conrady
        model, batched."""
        n = self.normalized_coords(pixels)
        d = _distort_normalized(n, self.dist)
        return to_cartesian((self.K @ to_homogeneous(d)[..., None])[..., 0])

    def undistort_points(self, pixels: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
        """Invert the distortion by fixed-point iteration (stub in the
        reference, camera.py:49-54). `iters`=8 converges to <1e-4 px for
        typical automotive lenses."""
        n_obs = self.normalized_coords(pixels)
        n = n_obs
        for _ in range(iters):  # static unroll: jit-friendly
            d = _distort_normalized(n, self.dist)
            n = n + (n_obs - d)
        return to_cartesian((self.K @ to_homogeneous(n)[..., None])[..., 0])


def _distort_normalized(n: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Brown-Conrady forward model on normalized coords (..., 2)."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = n[..., 0], n[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xt = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yt = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([x * radial + xt, y * radial + yt], axis=-1)


def project(P: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply a (3, 4) projection matrix to (..., 3) points -> (..., 2) pixels."""
    ph = to_homogeneous(points)
    uvw = (P @ ph[..., None])[..., 0]
    return to_cartesian(uvw)


def transform_points(T: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply a (4, 4) rigid transform to (..., 3) points -> (..., 3)."""
    return (T[..., :3, :3] @ points[..., None])[..., 0] + T[..., :3, 3]
