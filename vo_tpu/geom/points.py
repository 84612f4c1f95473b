"""Point-coordinate helpers.

Capability parity with the reference's src/vo/helpers.py:5-83 (homogeneous /
cartesian conversion, Hartley isotropic normalization, skew-symmetric
matrices), with a batch-first layout: points are (..., N, D) or (..., D)
arrays with the coordinate on the LAST axis (the reference uses (N, D, 1)
column vectors).  All functions are pure jax and vmappable.
"""

from __future__ import annotations

import jax.numpy as jnp


def to_homogeneous(points: jnp.ndarray) -> jnp.ndarray:
    """Append a 1 to the last axis: (..., D) -> (..., D+1).

    Ref parity: helpers.py:5-16 (to_homogeneous_coordinates).
    """
    ones = jnp.ones_like(points[..., :1])
    return jnp.concatenate([points, ones], axis=-1)


def to_cartesian(points: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Divide by the last coordinate: (..., D+1) -> (..., D).

    Ref parity: helpers.py:18-29 (to_cartesian_coordinates). A zero last
    coordinate yields inf/nan exactly like the reference (numpy warns,
    jax silently produces inf); pass eps>0 to guard.
    """
    w = points[..., -1:]
    if eps:
        w = jnp.where(jnp.abs(w) < eps, jnp.where(w < 0, -eps, eps), w)
    return points[..., :-1] / w


def normalize_points(
    points: jnp.ndarray, weight: jnp.ndarray | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Hartley isotropic normalization.

    Shifts the centroid to the origin and scales so the mean radius is
    sqrt(D). Returns (normalized_points, T) with T of shape (D+1, D+1) such
    that `normalized_h = (T @ points_h^T)^T` for homogeneous points.

    Ref parity: helpers.py:31-54 — same invariants (zero mean, mean norm
    sqrt(D), T consistency), batched over leading axes. `weight` restricts
    the statistics to weighted rows (fixed-capacity masked usage).

    Args:
      points: (..., N, D) cartesian points.
      weight: optional (..., N) non-negative weights/mask.
    Returns:
      normalized: (..., N, D); T: (..., D+1, D+1).
    """
    d = points.shape[-1]
    if weight is None:
        centroid = jnp.mean(points, axis=-2, keepdims=True)
        centered = points - centroid
        mean_dist = jnp.mean(jnp.linalg.norm(centered, axis=-1), axis=-1)
    else:
        wsum = jnp.maximum(jnp.sum(weight, axis=-1, keepdims=True), 1e-12)
        centroid = jnp.sum(points * weight[..., None], axis=-2, keepdims=True) / wsum[..., None]
        centered = points - centroid
        mean_dist = (
            jnp.sum(jnp.linalg.norm(centered, axis=-1) * weight, axis=-1) / wsum[..., 0]
        )
    scale = jnp.sqrt(jnp.asarray(d, points.dtype)) / jnp.maximum(
        mean_dist, jnp.finfo(points.dtype).tiny
    )
    normalized = centered * scale[..., None, None]

    batch = points.shape[:-2]
    T = jnp.zeros(batch + (d + 1, d + 1), points.dtype)
    diag_idx = jnp.arange(d)
    T = T.at[..., diag_idx, diag_idx].set(scale[..., None])
    T = T.at[..., :d, d].set(-scale[..., None] * centroid[..., 0, :])
    T = T.at[..., d, d].set(1.0)
    return normalized, T


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric (cross-product) matrix.

    Ref parity: helpers.py:57-84 (to_skew_symmetric_matrix, batched).
    """
    zeros = jnp.zeros_like(v[..., 0])
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    rows = jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )
    return rows


def unskew(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3): inverse of `skew` (uses the off-diagonal
    averages so it is exact for skew-symmetric input and a projection
    otherwise).

    Ref parity: helpers.py:130-142 (skew_matrix_to_cross).
    """
    x = 0.5 * (m[..., 2, 1] - m[..., 1, 2])
    y = 0.5 * (m[..., 0, 2] - m[..., 2, 0])
    z = 0.5 * (m[..., 1, 0] - m[..., 0, 1])
    return jnp.stack([x, y, z], axis=-1)
