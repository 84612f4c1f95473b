"""Pyramidal Lucas-Kanade optical flow, batched over keypoints.

Capability parity with the reference's KLT front-end
(src/vo/features/klt.py:233-239, cv2.calcOpticalFlowPyrLK with win 17x17,
maxLevel 2, 10 iterations / eps 0.03, error threshold 100 — klt.py:29-39).
TPU-first mechanics: one vmapped Bouguet-style solver — per level the 2x2
structure matrix comes from the template window, the iteration is a
lax.fori_loop with static bounds, and all K keypoints advance in lockstep as
(K, W, W) gather/arith batches. No per-point python loops, no dynamic
shapes; invalid tracks are reported through a status mask.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from vo_tpu.ops.image import bilinear_sample, image_gradients


class TrackResult(NamedTuple):
    xy: jnp.ndarray  # (K, 2) tracked positions in the next frame
    status: jnp.ndarray  # (K,) bool — converged, well-conditioned, in-bounds
    err: jnp.ndarray  # (K,) mean |I_next - I_prev| over the window


def _window_offsets(radius: int) -> jnp.ndarray:
    r = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([dx, dy], axis=-1)  # (W, W, 2) as (x, y)


def _lk_level(
    prev_img: jnp.ndarray,
    next_img: jnp.ndarray,
    pt_prev: jnp.ndarray,  # (K, 2) template centers at this level
    guess: jnp.ndarray,  # (K, 2) flow guess at this level
    radius: int,
    max_iters: int,
    eps: float,
    min_eig_threshold: float,
):
    """One pyramid level of Bouguet LK for all keypoints. Returns
    (flow (K,2), conditioned (K,) bool, err (K,))."""
    offs = _window_offsets(radius)  # (W, W, 2)
    gx, gy = image_gradients(prev_img)

    def per_point_setup(p):
        grid = p[None, None, :] + offs  # (W, W, 2)
        T = bilinear_sample(prev_img, grid)
        Ix = bilinear_sample(gx, grid)
        Iy = bilinear_sample(gy, grid)
        gxx = jnp.sum(Ix * Ix)
        gxy = jnp.sum(Ix * Iy)
        gyy = jnp.sum(Iy * Iy)
        return T, Ix, Iy, jnp.array([[gxx, gxy], [gxy, gyy]])

    T, Ix, Iy, G = jax.vmap(per_point_setup)(pt_prev)
    det = G[:, 0, 0] * G[:, 1, 1] - G[:, 0, 1] * G[:, 1, 0]
    win_area = (2 * radius + 1) ** 2
    conditioned = (
        jnp.minimum(
            0.5 * (G[:, 0, 0] + G[:, 1, 1])
            - jnp.sqrt(
                jnp.maximum(0.25 * (G[:, 0, 0] - G[:, 1, 1]) ** 2 + G[:, 0, 1] ** 2, 0.0)
            ),
            jnp.inf,
        )
        / win_area
        > min_eig_threshold
    ) & (jnp.abs(det) > 1e-8)
    Ginv = jnp.linalg.inv(
        jnp.where(conditioned[:, None, None], G, jnp.eye(2, dtype=G.dtype))
    )

    def body(_, carry):
        d, active = carry

        def per_point(p, d_k, T_k, Ix_k, Iy_k, Ginv_k):
            grid = p[None, None, :] + d_k[None, None, :] + offs
            I = bilinear_sample(next_img, grid)
            diff = T_k - I
            b = jnp.stack([jnp.sum(diff * Ix_k), jnp.sum(diff * Iy_k)])
            return Ginv_k @ b

        delta = jax.vmap(per_point)(pt_prev + guess, d, T, Ix, Iy, Ginv)
        delta = jnp.where(active[:, None], delta, 0.0)
        d = d + delta
        active = active & (jnp.linalg.norm(delta, axis=-1) > eps)
        return d, active

    d0 = jnp.zeros_like(pt_prev)
    d, _ = jax.lax.fori_loop(0, max_iters, body, (d0, conditioned))

    def final_err(p, d_k, T_k):
        grid = p[None, None, :] + d_k[None, None, :] + offs
        I = bilinear_sample(next_img, grid)
        return jnp.mean(jnp.abs(I - T_k))

    err = jax.vmap(final_err)(pt_prev + guess, d, T)
    return guess + d, conditioned, err


def pyramidal_lk(
    prev_pyr: Sequence[jnp.ndarray],
    next_pyr: Sequence[jnp.ndarray],
    xy: jnp.ndarray,
    radius: int = 8,
    max_iters: int = 10,
    eps: float = 0.03,
    max_err: float = 25.0,
    min_eig_threshold: float = 1e-4,
) -> TrackResult:
    """Track keypoints from prev to next frame across a Gaussian pyramid.

    Args:
      prev_pyr / next_pyr: pyramids from `vo_tpu.ops.image.build_pyramid`
          (level 0 = full res). Same number of levels, static shapes.
      xy: (K, 2) keypoint positions in the prev frame (level 0 pixels).
      radius: window radius (8 -> 17x17 window = reference klt.py:29).
      max_iters / eps: iteration budget and convergence step (klt.py:31-33).
      max_err: mean-abs-diff gate; cv2-compatible scale for [0,255] images
          (the reference thresholds cv2's error at 100, klt.py:39 — default
          here is stricter since we also gate on conditioning).
    Returns TrackResult with fixed shapes.
    """
    levels = len(prev_pyr)
    flow = jnp.zeros_like(xy)
    conditioned = jnp.ones(xy.shape[0], bool)
    err = jnp.zeros(xy.shape[0], jnp.float32)
    for lvl in range(levels - 1, -1, -1):
        scale = 2.0**lvl
        flow, cond_l, err = _lk_level(
            prev_pyr[lvl],
            next_pyr[lvl],
            xy / scale,
            flow,
            radius,
            max_iters,
            eps,
            min_eig_threshold,
        )
        if lvl > 0:
            flow = flow * 2.0
        conditioned = conditioned & cond_l

    new_xy = xy + flow
    h, w = prev_pyr[0].shape
    in_bounds = (
        (new_xy[:, 0] >= radius)
        & (new_xy[:, 0] < w - radius)
        & (new_xy[:, 1] >= radius)
        & (new_xy[:, 1] < h - radius)
    )
    status = conditioned & in_bounds & (err < max_err)
    return TrackResult(xy=new_xy, status=status, err=err)
