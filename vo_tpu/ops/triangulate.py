"""Batched DLT triangulation.

Replaces the reference's per-point python loops over cv2.triangulatePoints /
4x4 SVD (src/vo/landmarks/triangulation.py:59-86 triangulate_candidates and
:352-389 _linear_triangulation) with one vmapped homogeneous DLT solve. Each
point contributes a 4x4 system A from the two skew-constraint rows of each
view; the landmark is the smallest right-singular vector, obtained from the
smallest eigenvector of the 4x4 symmetric normal matrix A^T A (eigh — TPU
has no batched small-SVD fast path, and rows are normalized first so the
squared conditioning stays benign in f32).

Supports per-point projection matrices on either view, which is exactly what
continuous candidate triangulation needs (each candidate has its own
track-start camera pose — triangulation.py:50-57).
"""

from __future__ import annotations

import jax.numpy as jnp


def _dlt_rows(P: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Two DLT rows per view: [u P3 - P1 ; v P3 - P2], row-normalized.

    P: (..., 3, 4), uv: (..., 2) -> (..., 2, 4).
    """
    r0 = uv[..., 0:1] * P[..., 2, :] - P[..., 0, :]
    r1 = uv[..., 1:2] * P[..., 2, :] - P[..., 1, :]
    rows = jnp.stack([r0, r1], axis=-2)
    norm = jnp.linalg.norm(rows, axis=-1, keepdims=True)
    return rows / jnp.maximum(norm, 1e-20)


def triangulate_dlt(
    P1: jnp.ndarray, P2: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray
) -> jnp.ndarray:
    """Triangulate matched observations into homogeneous-free 3D points.

    Args:
      P1, P2: (3, 4) or (N, 3, 4) projection matrices (per-point allowed).
      uv1, uv2: (N, 2) pixel (or normalized-image) observations.
    Returns:
      (N, 3) points in the frame the projection matrices map from.
    """
    if P1.ndim == 2:
        P1 = jnp.broadcast_to(P1, uv1.shape[:-1] + (3, 4))
    if P2.ndim == 2:
        P2 = jnp.broadcast_to(P2, uv2.shape[:-1] + (3, 4))
    A = jnp.concatenate([_dlt_rows(P1, uv1), _dlt_rows(P2, uv2)], axis=-2)  # (N,4,4)
    AtA = jnp.swapaxes(A, -1, -2) @ A
    _, vecs = jnp.linalg.eigh(AtA)  # ascending eigenvalues
    X_h = vecs[..., :, 0]  # (N, 4) smallest eigenvector
    w = X_h[..., 3:4]
    w = jnp.where(jnp.abs(w) < 1e-12, jnp.where(w < 0, -1e-12, 1e-12), w)
    return X_h[..., :3] / w


def reprojection_error(
    P: jnp.ndarray, X: jnp.ndarray, uv: jnp.ndarray
) -> jnp.ndarray:
    """Euclidean pixel reprojection error. P: (...,3,4), X: (...,3), uv: (...,2)."""
    Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)
    p = (P @ Xh[..., None])[..., 0]
    z = p[..., 2:3]
    z = jnp.where(jnp.abs(z) < 1e-12, jnp.where(z < 0, -1e-12, 1e-12), z)
    return jnp.linalg.norm(p[..., :2] / z - uv, axis=-1)


def depths_in_frame(T_cw: jnp.ndarray, X_w: jnp.ndarray) -> jnp.ndarray:
    """z-depth of world points in a camera frame. T_cw: (...,4,4), X: (...,3)."""
    return (T_cw[..., 2, :3] * X_w).sum(-1) + T_cw[..., 2, 3]
