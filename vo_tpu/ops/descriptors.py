"""Patch descriptors and batched descriptor matching.

Capability parity with the reference's descriptor path: raw-intensity
(2r+1)^2 patches per keypoint extracted in a python loop (harris.py:160-194)
and cv2.BFMatcher knnMatch(k=2) + ratio test + uniqueness
(harris.py:196-262, sift.py:23-53). TPU-first mechanics: patch extraction is
one vectorized gather; the distance matrix is a single (K1, K2) matmul
expansion that lands on the MXU; top-2 selection, ratio test and mutual
uniqueness are mask reductions. All shapes fixed; dead slots carry +inf
distance.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax


def extract_patches(
    img: jnp.ndarray, xy: jnp.ndarray, radius: int = 9, normalize: bool = False
) -> jnp.ndarray:
    """(K, 2) integer-ish keypoints -> (K, (2r+1)^2) raw intensity patches.

    Ref parity: harris.py:160-194 (extractDescriptors) — same
    patch-of-intensities descriptor, minus the python loop. Coordinates are
    rounded and clamped so border keypoints still yield patches (the
    reference pads the image instead).
    """
    h, w = img.shape
    size = 2 * radius + 1
    x0 = jnp.clip(jnp.round(xy[..., 0]).astype(jnp.int32), radius, w - radius - 1)
    y0 = jnp.clip(jnp.round(xy[..., 1]).astype(jnp.int32), radius, h - radius - 1)
    dy, dx = jnp.meshgrid(
        jnp.arange(-radius, radius + 1), jnp.arange(-radius, radius + 1), indexing="ij"
    )
    yy = y0[:, None, None] + dy[None]
    xx = x0[:, None, None] + dx[None]
    patches = img[yy, xx].reshape(xy.shape[0], size * size)
    if normalize:
        mu = patches.mean(axis=-1, keepdims=True)
        sd = patches.std(axis=-1, keepdims=True)
        patches = (patches - mu) / jnp.maximum(sd, 1e-6)
    return patches


class MatchResult(NamedTuple):
    idx: jnp.ndarray  # (K1,) int32 index into descriptors2, -1 = no match
    dist: jnp.ndarray  # (K1,) SSD distance of the match (inf where none)
    valid: jnp.ndarray  # (K1,) bool


def match_descriptors(
    d1: jnp.ndarray,
    d2: jnp.ndarray,
    valid1: jnp.ndarray | None = None,
    valid2: jnp.ndarray | None = None,
    ratio: float = 0.85,
    max_dist: float = jnp.inf,
    mutual: bool = True,
    pair_valid: jnp.ndarray | None = None,
) -> MatchResult:
    """Brute-force SSD matching with Lowe ratio test and uniqueness.

    Ref parity: harris.py:247-262 (BFMatcher knnMatch k=2, ratio 0.85,
    uniqueness) and sift.py:39-53 (ratio 0.8). The (K1, K2) squared-distance
    matrix is computed as ||a||^2 + ||b||^2 - 2 a.b — one MXU matmul.
    Uniqueness = mutual nearest neighbors (strictly stronger than the
    reference's first-come uniqueness, and order-independent).
    """
    n1 = jnp.sum(d1 * d1, axis=-1)
    n2 = jnp.sum(d2 * d2, axis=-1)
    dist = (
        n1[:, None]
        + n2[None, :]
        - 2.0 * jnp.dot(d1, d2.T, preferred_element_type=jnp.float32)
    )
    dist = jnp.maximum(dist, 0.0)
    if valid1 is not None:
        dist = jnp.where(valid1[:, None], dist, jnp.inf)
    if valid2 is not None:
        dist = jnp.where(valid2[None, :], dist, jnp.inf)
    if pair_valid is not None:
        # Caller-provided (K1, K2) candidate gate — e.g. a spatial window
        # when the two views are known to share a viewpoint (loop-closure
        # verification on same-heading revisits, models/keyframe_db.py).
        # Pruning BEFORE the ratio test matters: repetitive texture fills
        # the top-2 with lookalikes and the ratio kills true matches.
        dist = jnp.where(pair_valid, dist, jnp.inf)

    neg_top2, top2_idx = lax.top_k(-dist, 2)  # (K1, 2)
    best = -neg_top2[:, 0]
    second = -neg_top2[:, 1]
    best_idx = top2_idx[:, 0]
    ok = jnp.isfinite(best) & (best <= max_dist)
    # Lowe ratio on L2 distances (harris.py:255 compares cv2's sqrt
    # distances); our matrix is squared, hence ratio^2.
    ok = ok & (best < (ratio * ratio) * ratio_guard(second))
    if mutual:
        col_best = jnp.argmin(dist, axis=0)  # (K2,)
        rows = jnp.arange(d1.shape[0])
        ok = ok & (col_best[best_idx] == rows)
    return MatchResult(
        idx=jnp.where(ok, best_idx, -1),
        dist=jnp.where(ok, best, jnp.inf),
        valid=ok,
    )


def ratio_guard(second: jnp.ndarray) -> jnp.ndarray:
    """Make the ratio test pass when there is no second candidate."""
    return jnp.where(jnp.isfinite(second), second, jnp.inf)
