"""Pyramidal Lucas-Kanade optical flow, batched over keypoints.

Capability parity with the reference's KLT front-end
(src/vo/features/klt.py:233-239, cv2.calcOpticalFlowPyrLK with win 17x17,
maxLevel 2, 10 iterations / eps 0.03, error threshold 100 — klt.py:29-39).

TPU-first mechanics (v3, matmul-resident): random gathers are the enemy on
TPU. Each keypoint performs ONE contiguous patch load per pyramid level
(vmapped `lax.dynamic_slice` = a block gather); after that, every bilinear
window resample — template setup and all solver iterations — is two small
batched matmuls with tent-function selection matrices:

    window = W_y(p) @ patch @ W_x(p)^T,   W[i, j] = max(0, 1 - |j - (p+i)|)

The tent weights ARE exact bilinear interpolation, the matmuls land on the
MXU, and the iteration contains no gathers or dynamic slices at all. The
2x2 normal system uses the template gradients (Bouguet), so its inverse is
computed once per level and reused across iterations.

The one semantic difference vs cv2: within a level, the iterative refinement
`d` can wander at most MARGIN px from the level's initial guess before its
samples clamp at the patch edge (tracks that wander that far have diverged
and are culled by the error/eps/bounds gates, like cv2's err>threshold
tracks).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax import lax

# Max |d| within one level before window samples clamp at the patch border.
# = radius: LK converges flows up to ~the window radius per pyramid level, so
# the margin must not clip that (the top level carries the largest flow).
MARGIN = 8


class TrackResult(NamedTuple):
    xy: jnp.ndarray  # (K, 2) tracked positions in the next frame
    status: jnp.ndarray  # (K,) bool — converged, well-conditioned, in-bounds
    err: jnp.ndarray  # (K,) mean |I_next - I_prev| over the window


def _extract_patches(
    img: jnp.ndarray, corner: jnp.ndarray, size: int, use_pallas: bool = False
) -> jnp.ndarray:
    """(K, size, size) contiguous patches at integer corners.

    XLA path: vmapped dynamic_slice (one gather). TPU path: the Pallas
    per-keypoint DMA gather (ops/pallas_kernels.py, ~2.7x faster) — callers
    must over-pad the image by the aligned-region cover (see _lk_level)."""
    if use_pallas:
        from vo_tpu.ops.pallas_kernels import extract_patches_aligned_auto

        return extract_patches_aligned_auto(img, corner, size)

    def one(c):
        return lax.dynamic_slice(img, (c[1], c[0]), (size, size))

    return jax.vmap(one)(corner)


def _sel(pos: jnp.ndarray, out_size: int, in_size: int) -> jnp.ndarray:
    """(K, out_size, in_size) bilinear selection matrices.

    Row i carries the linear-interpolation weights for input coordinate
    pos + i: a tent function max(0, 1 - |j - (pos+i)|) over input cells j.
    """
    i = jnp.arange(out_size, dtype=jnp.float32)
    j = jnp.arange(in_size, dtype=jnp.float32)
    p = pos[:, None] + i[None, :]  # (K, out)
    return jnp.maximum(0.0, 1.0 - jnp.abs(j[None, None, :] - p[:, :, None]))


def _resample(patch: jnp.ndarray, pos_xy: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Bilinear (out, out) windows from (K, P, P) patches at float corners
    pos_xy (K, 2) — two batched MXU matmuls, no gathers."""
    P = patch.shape[-1]
    wy = _sel(pos_xy[:, 1], out_size, P)  # (K, out, P)
    wx = _sel(pos_xy[:, 0], out_size, P)
    tmp = jnp.einsum("kip,kpq->kiq", wy, patch, preferred_element_type=jnp.float32)
    return jnp.einsum("kiq,kjq->kij", tmp, wx, preferred_element_type=jnp.float32)


def _lk_level(
    prev_img: jnp.ndarray,
    next_img: jnp.ndarray,
    pt_prev: jnp.ndarray,  # (K, 2) template centers at this level
    guess: jnp.ndarray,  # (K, 2) flow guess at this level
    radius: int,
    max_iters: int,
    eps: float,
    min_eig_threshold: float,
    use_pallas: bool = False,
):
    """One pyramid level of Bouguet LK for all keypoints. Returns
    (flow (K,2), conditioned (K,) bool, err (K,))."""
    h, w = prev_img.shape
    win = 2 * radius + 1
    # Edge-replicate padding guarantees every patch corner below is in range
    # (dynamic_slice silently clamps out-of-range starts, which would
    # misalign windows — padding keeps alignment exact even at borders).
    pad = radius + MARGIN + 2
    prev_p = jnp.pad(prev_img, pad, mode="edge")
    next_p = jnp.pad(next_img, pad, mode="edge")
    if use_pallas:
        # The Pallas DMA gather reads tile-ALIGNED regions covering each
        # patch; over-pad bottom/right with zeros (never sampled — resample
        # positions stay within the true patch span) so every aligned region
        # is in bounds without clamping.
        prev_p = jnp.pad(prev_p, ((0, 48), (0, 256)))
        next_p = jnp.pad(next_p, ((0, 48), (0, 256)))
    bound = jnp.asarray([w - 1.0, h - 1.0])

    # ---- Template + gradients: one patch, one (win+2) resample ------------
    tp_size = win + 4
    pt_c = jnp.clip(pt_prev, 0.0, bound)
    base = jnp.floor(pt_c)
    tcorner = base.astype(jnp.int32) - radius - 2 + pad
    tpatch = _extract_patches(prev_p, tcorner, tp_size, use_pallas)
    # Window corner (float) of the (win+2)-sized extended template inside
    # the patch: frac + 1 (one-cell gradient margin).
    tfrac = pt_c - base
    T_ext = _resample(tpatch, tfrac + 1.0, win + 2)  # (K, win+2, win+2)
    T = T_ext[:, 1:-1, 1:-1]
    Ix = 0.5 * (T_ext[:, 1:-1, 2:] - T_ext[:, 1:-1, :-2])
    Iy = 0.5 * (T_ext[:, 2:, 1:-1] - T_ext[:, :-2, 1:-1])

    gxx = jnp.sum(Ix * Ix, axis=(1, 2))
    gxy = jnp.sum(Ix * Iy, axis=(1, 2))
    gyy = jnp.sum(Iy * Iy, axis=(1, 2))
    det = gxx * gyy - gxy * gxy
    win_area = win * win
    min_eig = 0.5 * (gxx + gyy) - jnp.sqrt(
        jnp.maximum(0.25 * (gxx - gyy) ** 2 + gxy * gxy, 0.0)
    )
    conditioned = (min_eig / win_area > min_eig_threshold) & (jnp.abs(det) > 1e-8)
    inv_det = jnp.where(jnp.abs(det) > 1e-8, 1.0 / det, 0.0)

    # ---- Search patch in the next image around pt_prev + guess ------------
    sp_size = win + 2 * MARGIN + 2
    center0 = jnp.clip(pt_prev + guess, 0.0, bound)
    scorner = jnp.floor(center0).astype(jnp.int32) - radius - MARGIN + pad
    spatch = _extract_patches(next_p, scorner, sp_size, use_pallas)
    # Float window corner relative to the search patch (normally MARGIN+frac).
    s_base = (center0 - radius) + pad - scorner.astype(jnp.float32)  # (K, 2)
    pos_hi = float(sp_size - win - 1) - 1e-4

    def sample_next(pos):  # pos (K, 2) -> (K, win, win)
        return _resample(spatch, jnp.clip(pos, 0.0, pos_hi), win)

    def cond(carry):
        d, active, it = carry
        # Early exit once every keypoint converged (delta <= eps): inactive
        # keypoints freeze, so stopping early is bit-identical to running the
        # full budget — but typical frames converge in 2-4 iterations, which
        # is most of the LK wall-time saved (cv2's criterion, klt.py:31-33).
        return (it < max_iters) & jnp.any(active)

    def body(carry):
        d, active, it = carry
        I = sample_next(s_base + d)
        diff = T - I
        bx = jnp.sum(diff * Ix, axis=(1, 2))
        by = jnp.sum(diff * Iy, axis=(1, 2))
        # Solve G delta = b with the cached 2x2 inverse.
        dx = inv_det * (gyy * bx - gxy * by)
        dy = inv_det * (-gxy * bx + gxx * by)
        delta = jnp.stack([dx, dy], axis=-1)
        delta = jnp.where(active[:, None], delta, 0.0)
        d = d + delta
        active = active & (jnp.sum(delta * delta, axis=-1) > eps * eps)
        return d, active, it + 1

    d0 = jnp.zeros_like(pt_prev)
    d, _, _ = lax.while_loop(cond, body, (d0, conditioned, jnp.asarray(0, jnp.int32)))

    err = jnp.mean(jnp.abs(sample_next(s_base + d) - T), axis=(1, 2))
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
    use_pallas: bool | None = None,
    init_flow: jnp.ndarray | None = None,
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
      use_pallas: route patch extraction through the Pallas DMA gather;
          None = auto (TPU backend only). Numerically identical either way.
      init_flow: optional (K, 2) level-0 flow guess (e.g. predicted from a
          motion model — SVO/DSO-style warp initialization). Extends the
          capture range far beyond the pyramid's native reach for fast
          rotational flow; non-finite or absurd guesses fall back to 0.
    Returns TrackResult with fixed shapes.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    levels = len(prev_pyr)
    if init_flow is None:
        flow = jnp.zeros_like(xy)
    else:
        h0, w0 = prev_pyr[0].shape
        sane = (
            jnp.isfinite(init_flow).all(-1)
            & (jnp.abs(init_flow[:, 0]) < 0.5 * w0)
            & (jnp.abs(init_flow[:, 1]) < 0.5 * h0)
        )
        flow = jnp.where(sane[:, None], init_flow, 0.0) / (2.0 ** (levels - 1))
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
            use_pallas,
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
