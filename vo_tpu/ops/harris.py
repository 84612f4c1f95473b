"""Harris / Shi-Tomasi corner detection with top-K non-maximum suppression.

Capability parity with the reference's HarrisCornerDetector
(src/vo/features/harris.py:86-158) and the Shi-Tomasi detection that feeds
KLT (klt.py:98-110, cv2.goodFeaturesToTrack). TPU-first mechanics:

  * response map = fused Sobel + structure-tensor box sum (XLA convs);
  * NMS = reduce_window local-max equality (the greedy python argmax loop at
    harris.py:148-152 becomes one max-pool + one top_k — same spacing
    guarantee: two strict local maxima of a (2r+1) window are > r apart);
  * selection = single lax.top_k over the flattened masked response,
    returning a FIXED number of slots with a validity mask (no dynamic
    shapes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from vo_tpu.ops.image import box_filter, sobel


def structure_tensor(img: jnp.ndarray, patch_size: int = 9):
    """(Sxx, Syy, Sxy) box-summed gradient products (harris.py:103-127)."""
    gx, gy = sobel(img)
    sxx = box_filter(gx * gx, patch_size)
    syy = box_filter(gy * gy, patch_size)
    sxy = box_filter(gx * gy, patch_size)
    return sxx, syy, sxy


def harris_response(img: jnp.ndarray, patch_size: int = 9, kappa: float = 0.08) -> jnp.ndarray:
    """Harris corner response det(M) - kappa * trace(M)^2 (harris.py:122-127).
    Negative responses are clamped to 0 like the reference (harris.py:127)."""
    sxx, syy, sxy = structure_tensor(img, patch_size)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return jnp.maximum(det - kappa * tr * tr, 0.0)


def shi_tomasi_response(img: jnp.ndarray, patch_size: int = 7) -> jnp.ndarray:
    """Minimum-eigenvalue (Shi-Tomasi) response — the cv2.goodFeaturesToTrack
    criterion used by the reference's KLT front-end (klt.py:24-26, 98)."""
    sxx, syy, sxy = structure_tensor(img, patch_size)
    half_tr = 0.5 * (sxx + syy)
    rad = jnp.sqrt(jnp.maximum(0.25 * (sxx - syy) ** 2 + sxy * sxy, 0.0))
    return jnp.maximum(half_tr - rad, 0.0)


class Keypoints(NamedTuple):
    xy: jnp.ndarray  # (K, 2) float32 (x, y) pixel coordinates
    score: jnp.ndarray  # (K,) response values
    valid: jnp.ndarray  # (K,) bool


def nms_masked_response(response: jnp.ndarray, nms_radius: int) -> jnp.ndarray:
    """Response at strict local maxima of a (2r+1)^2 window, -inf elsewhere.

    XLA reference implementation (oracle for the fused Pallas kernel in
    ops/pallas_kernels.py). Ties between equal maxima are broken by flat
    index (second pooling pass), otherwise neighboring tied pixels would all
    pass the >= test and violate the NMS spacing guarantee. Flat indices
    stay exact in f32 up to 2^24.
    """
    h, w = response.shape
    win = 2 * nms_radius + 1
    pooled = lax.reduce_window(
        response, -jnp.inf, lax.max, (win, win), (1, 1), "SAME"
    )
    idx_f = (
        lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ).astype(jnp.float32)
    tied_idx = jnp.where(response >= pooled, idx_f, -1.0)
    pooled_idx = lax.reduce_window(
        tied_idx, -jnp.inf, lax.max, (win, win), (1, 1), "SAME"
    )
    is_max = (response >= pooled) & (idx_f == pooled_idx)
    return jnp.where(is_max, response, -jnp.inf)


def select_from_masked(
    masked: jnp.ndarray,
    num_keypoints: int,
    border: int = 0,
    min_response: float = 0.0,
    quality_level: float = 0.0,
) -> Keypoints:
    """Top-K selection tail over an NMS-masked response map."""
    h, w = masked.shape
    keep = masked > min_response
    if quality_level > 0.0:
        # The global max is itself a local max, so max(masked) == max(resp).
        keep = keep & (masked > quality_level * masked.max())
    if border > 0:
        box = jnp.zeros_like(keep).at[border:-border, border:-border].set(True)
        keep = keep & box
    flat = jnp.where(keep, masked, -jnp.inf).reshape(-1)
    scores, idx = lax.top_k(flat, num_keypoints)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    valid = jnp.isfinite(scores) & (scores > min_response)
    return Keypoints(
        xy=jnp.stack([xs, ys], axis=-1),
        score=jnp.where(valid, scores, 0.0),
        valid=valid,
    )


def select_keypoints(
    response: jnp.ndarray,
    num_keypoints: int,
    nms_radius: int = 5,
    border: int = 0,
    min_response: float = 0.0,
    quality_level: float = 0.0,
) -> Keypoints:
    """Top-K local maxima of a response map, fixed output size.

    Replaces the greedy argmax/zero-box loop of harris.py:148-152 with a
    max-pool NMS + one top_k — fully batched, no data-dependent shapes.
    `quality_level` mirrors cv2.goodFeaturesToTrack (fraction of the global
    max below which responses are dropped; klt.py:25 uses 0.01).
    """
    return select_from_masked(
        nms_masked_response(response, nms_radius),
        num_keypoints,
        border=border,
        min_response=min_response,
        quality_level=quality_level,
    )


def detect_keypoints(
    image: jnp.ndarray,
    num_keypoints: int,
    mode: str = "shi_tomasi",
    patch_size: int = 7,
    kappa: float = 0.08,
    nms_radius: int = 5,
    border: int = 0,
    min_response: float = 0.0,
    quality_level: float = 0.0,
    use_pallas: bool | None = None,
) -> Keypoints:
    """Corner detection front door: response + NMS + top-K.

    `use_pallas=None` auto-selects the fused Pallas strip kernel on TPU
    (one HBM pass for the whole stencil chain) and the XLA op chain
    elsewhere; both produce identical keypoints.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from vo_tpu.ops.pallas_kernels import corner_response_nms_auto

        masked = corner_response_nms_auto(
            image, mode=mode, patch_size=patch_size, kappa=kappa,
            nms_radius=nms_radius,
        )
    else:
        resp = (
            harris_response(image, patch_size, kappa)
            if mode == "harris"
            else shi_tomasi_response(image, patch_size)
        )
        masked = nms_masked_response(resp, nms_radius)
    return select_from_masked(
        masked, num_keypoints,
        border=border, min_response=min_response, quality_level=quality_level,
    )


def refine_corners_subpixel(
    image: jnp.ndarray,
    xy: jnp.ndarray,
    radius: int = 4,
    iters: int = 2,
) -> jnp.ndarray:
    """Gradient-weighted subpixel corner refinement (cv2.cornerSubPix math).

    For every pixel i in a window around the corner guess q, an edge through
    i is orthogonal to its gradient g_i, so the true corner satisfies
    g_i . (q - x_i) = 0. Weighted least squares over the window:

        q = (sum w_i g_i g_i^T)^{-1}  sum w_i (g_i g_i^T) x_i

    iterated `iters` times (the window re-centers on the estimate). The
    reference reaches this via cv2.cornerSubPix (klt.py:104-110); here it is
    a vmapped bilinear-gather + one 2x2 solve per keypoint — no loops over
    keypoints. NMS top-K returns integer pixel positions; without this the
    matched-detection tracker modes feed +-0.5 px quantization straight
    into PnP every frame.

    xy: (K, 2). Returns (K, 2) refined positions (clamped to +-radius of
    the input so a flat/degenerate window cannot eject the corner).
    """
    from vo_tpu.ops.image import bilinear_sample, image_gradients

    gx, gy = image_gradients(image.astype(jnp.float32))
    r = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(r, r, indexing="ij")
    # cornerSubPix weighting: Gaussian over the window.
    w = jnp.exp(-(dx * dx + dy * dy) / (2.0 * (0.5 * radius) ** 2))

    def one(q0):
        def step(q, _):
            grid = q + jnp.stack([dx, dy], -1)  # (W, W, 2)
            px = bilinear_sample(gx, grid)
            py = bilinear_sample(gy, grid)
            a = w * px * px
            b = w * px * py
            c = w * py * py
            A = jnp.array([[a.sum(), b.sum()], [b.sum(), c.sum()]])
            # rhs = sum (w g g^T) x_i with x_i the absolute sample position
            xs = grid[..., 0]
            ys = grid[..., 1]
            rhs = jnp.array(
                [(a * xs + b * ys).sum(), (b * xs + c * ys).sum()]
            )
            det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
            ok = jnp.abs(det) > 1e-8
            inv = (
                jnp.array([[A[1, 1], -A[0, 1]], [-A[1, 0], A[0, 0]]])
                / jnp.where(ok, det, 1.0)
            )
            q_new = inv @ rhs
            q_new = jnp.where(ok, q_new, q)
            return q_new, None

        q, _ = lax.scan(step, q0, None, length=iters)
        return jnp.clip(q, q0 - radius, q0 + radius)

    return jax.vmap(one)(xy.astype(jnp.float32))
