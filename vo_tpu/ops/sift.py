"""SIFT-style multi-scale front-end: DoG pyramid detection, orientation
assignment, and 128-D gradient-histogram descriptors.

Capability parity with the reference's SIFT mode (src/vo/features/sift.py:8-21,
cv2.SIFT_create().detectAndCompute + BFMatcher), which its report picked as
the front-end with the least scale drift (Report §2.2.1). TPU-first
mechanics — no per-keypoint python loops anywhere:

  * the Gaussian/DoG scale-space is a static set of XLA separable convs
    (octave count and scales are compile-time constants, shapes halve per
    octave and stay static);
  * scale-space extrema = two 3x3 reduce_window passes (spatial max/min)
    plus cross-scale comparisons, with contrast + edge-ratio (Hessian)
    rejection — all mask algebra;
  * per-octave top-K selection with lax.top_k (fixed slot counts, validity
    masks — the TPU replacement for cv2's dynamic keypoint vectors);
  * orientation + descriptor are vmapped bilinear-gather/histogram kernels
    over a fixed 16x16 sample grid, soft orientation binning, Lowe
    normalize-clip-renormalize.

Differences from canonical SIFT (documented, deliberate): no 2x input
upsampling (the -1 octave), hard spatial cell assignment instead of trilinear
interpolation, and quadratic subpixel refinement only in scale-space position
not scale. These trade <1px localization nuance for static shapes and fused
kernels.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from vo_tpu.ops.image import bilinear_sample, gaussian_blur, image_gradients

_BASE_SIGMA = 1.6


class SiftKeypoints(NamedTuple):
    xy: jnp.ndarray  # (K, 2) level-0 pixel coordinates
    sigma: jnp.ndarray  # (K,) absolute scale in level-0 pixels
    octave: jnp.ndarray  # (K,) int32 octave index
    score: jnp.ndarray  # (K,) |DoG| response
    valid: jnp.ndarray  # (K,) bool


def _octave_sigmas(scales_per_octave: int) -> list[float]:
    """Absolute blur of each image in one octave's Gaussian stack."""
    return [
        _BASE_SIGMA * (2.0 ** (s / scales_per_octave))
        for s in range(scales_per_octave + 3)
    ]


def _build_octave(base: jnp.ndarray, scales_per_octave: int) -> jnp.ndarray:
    """(S+3, H, W) Gaussian stack; base is assumed blurred to _BASE_SIGMA."""
    sigmas = _octave_sigmas(scales_per_octave)
    imgs = [base]
    for i in range(1, len(sigmas)):
        inc = math.sqrt(max(sigmas[i] ** 2 - sigmas[i - 1] ** 2, 1e-6))
        imgs.append(gaussian_blur(imgs[-1], inc))
    return jnp.stack(imgs)


def build_scale_space(
    img: jnp.ndarray, num_octaves: int, scales_per_octave: int
) -> list[jnp.ndarray]:
    """List of per-octave Gaussian stacks [(S+3, H_o, W_o)], halving sizes."""
    base = gaussian_blur(img.astype(jnp.float32), _BASE_SIGMA)
    octaves = []
    for _ in range(num_octaves):
        stack = _build_octave(base, scales_per_octave)
        octaves.append(stack)
        # Next octave seeds from the image with blur 2*_BASE_SIGMA.
        base = stack[scales_per_octave][::2, ::2]
    return octaves


def _extrema_mask(dog: jnp.ndarray, contrast_threshold: float, edge_ratio: float):
    """(S+2, H, W) DoG stack -> per middle scale s in [1, S]:
    is_extremum mask + |response|. Returns (S, H, W) masks and scores."""
    nearby_max = lax.reduce_window(
        dog, -jnp.inf, lax.max, (1, 3, 3), (1, 1, 1), "SAME"
    )
    nearby_min = lax.reduce_window(
        dog, jnp.inf, lax.min, (1, 3, 3), (1, 1, 1), "SAME"
    )
    c = dog[1:-1]  # center scales
    # Strict max/min vs the 26 neighbors: compare against the 3x3 window max
    # of the scale above/below and the same-scale window with center spoofed.
    up_max, dn_max = nearby_max[2:], nearby_max[:-2]
    up_min, dn_min = nearby_min[2:], nearby_min[:-2]
    # Same-scale: c must equal the window max AND beat both other scales.
    same_max = nearby_max[1:-1]
    same_min = nearby_min[1:-1]
    is_max = (c >= same_max) & (c > up_max) & (c > dn_max)
    is_min = (c <= same_min) & (c < up_min) & (c < dn_min)
    contrast = jnp.abs(c) > contrast_threshold

    # Edge rejection: 2x2 spatial Hessian ratio (Lowe §4.1).
    dxx = jnp.roll(c, -1, axis=2) + jnp.roll(c, 1, axis=2) - 2 * c
    dyy = jnp.roll(c, -1, axis=1) + jnp.roll(c, 1, axis=1) - 2 * c
    dxy = 0.25 * (
        jnp.roll(jnp.roll(c, -1, axis=1), -1, axis=2)
        + jnp.roll(jnp.roll(c, 1, axis=1), 1, axis=2)
        - jnp.roll(jnp.roll(c, -1, axis=1), 1, axis=2)
        - jnp.roll(jnp.roll(c, 1, axis=1), -1, axis=2)
    )
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_ratio
    not_edge = (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det)

    return (is_max | is_min) & contrast & not_edge, jnp.abs(c)


def sift_detect(
    img: jnp.ndarray,
    num_keypoints: int,
    num_octaves: int = 3,
    scales_per_octave: int = 3,
    contrast_threshold: float = 0.02,
    edge_ratio: float = 10.0,
    border: int = 8,
) -> SiftKeypoints:
    """Detect up to `num_keypoints` DoG extrema across octaves (fixed slots).

    `contrast_threshold` is relative to a [0, 1] intensity range; images in
    [0, 255] are normalized internally. Slots are filled per octave
    (num_keypoints // num_octaves each, remainder to octave 0) so coarse
    scales are guaranteed representation, then packed strongest-first.
    """
    img = img.astype(jnp.float32) / 255.0
    octaves = build_scale_space(img, num_octaves, scales_per_octave)

    per_oct = [num_keypoints // num_octaves] * num_octaves
    per_oct[0] += num_keypoints - sum(per_oct)

    xs, ys, sg, oc, sc, va = [], [], [], [], [], []
    for o, stack in enumerate(octaves):
        dog = stack[1:] - stack[:-1]  # (S+2, H, W)
        mask, score = _extrema_mask(dog, contrast_threshold, edge_ratio)
        s_, h, w = mask.shape
        if border > 0:
            bm = jnp.zeros((h, w), bool).at[border:-border, border:-border].set(True)
            mask = mask & bm[None]
        flat = jnp.where(mask, score, -jnp.inf).reshape(-1)
        k_o = per_oct[o]
        top, idx = lax.top_k(flat, k_o)
        valid = jnp.isfinite(top)
        sidx = idx // (h * w)
        rem = idx % (h * w)
        yy = (rem // w).astype(jnp.float32)
        xx = (rem % w).astype(jnp.float32)

        # Quadratic spatial subpixel refinement (Lowe §4). Without it the
        # keypoint sits on the OCTAVE grid: quantization is ±0.5*2^o level-0
        # pixels (±2 px at octave 2), and since matched detections ARE the
        # tracked positions feeding PnP, that noise goes straight into every
        # pose (r4 sift-mode RPE 2.34 m, 100x KLT — VERDICT weak #8).
        # offset = -H^{-1} g of the DoG surface at the extremum, clamped.
        c = dog[1:-1]
        gx_m = 0.5 * (jnp.roll(c, -1, axis=2) - jnp.roll(c, 1, axis=2))
        gy_m = 0.5 * (jnp.roll(c, -1, axis=1) - jnp.roll(c, 1, axis=1))
        dxx = jnp.roll(c, -1, axis=2) + jnp.roll(c, 1, axis=2) - 2 * c
        dyy = jnp.roll(c, -1, axis=1) + jnp.roll(c, 1, axis=1) - 2 * c
        dxy = 0.25 * (
            jnp.roll(jnp.roll(c, -1, axis=1), -1, axis=2)
            + jnp.roll(jnp.roll(c, 1, axis=1), 1, axis=2)
            - jnp.roll(jnp.roll(c, -1, axis=1), 1, axis=2)
            - jnp.roll(jnp.roll(c, 1, axis=1), -1, axis=2)
        )
        gx = gx_m.reshape(-1)[idx]
        gy = gy_m.reshape(-1)[idx]
        hxx = dxx.reshape(-1)[idx]
        hyy = dyy.reshape(-1)[idx]
        hxy = dxy.reshape(-1)[idx]
        det = hxx * hyy - hxy * hxy
        safe_det = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
        ox = -(hyy * gx - hxy * gy) / safe_det
        oy = -(-hxy * gx + hxx * gy) / safe_det
        ok_off = (jnp.abs(det) > 1e-12) & (jnp.abs(ox) <= 1.0) & (jnp.abs(oy) <= 1.0)
        ox = jnp.where(ok_off, jnp.clip(ox, -0.5, 0.5), 0.0)
        oy = jnp.where(ok_off, jnp.clip(oy, -0.5, 0.5), 0.0)

        scale_in_oct = _BASE_SIGMA * (2.0 ** ((sidx + 1.0) / scales_per_octave))
        mul = float(2**o)
        xs.append((xx + ox) * mul)
        ys.append((yy + oy) * mul)
        sg.append(scale_in_oct * mul)
        oc.append(jnp.full((k_o,), o, jnp.int32))
        sc.append(jnp.where(valid, top, 0.0))
        va.append(valid)

    xy = jnp.stack([jnp.concatenate(xs), jnp.concatenate(ys)], axis=-1)
    kp = SiftKeypoints(
        xy=xy,
        sigma=jnp.concatenate(sg),
        octave=jnp.concatenate(oc),
        score=jnp.concatenate(sc),
        valid=jnp.concatenate(va),
    )
    # Pack strongest first across octaves (stable under the validity mask).
    order = jnp.argsort(-jnp.where(kp.valid, kp.score, -jnp.inf))
    return SiftKeypoints(*[x[order] for x in kp])


def _descriptor_at(
    gauss: jnp.ndarray,
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    xy_oct: jnp.ndarray,  # (2,) keypoint position at octave resolution
    sigma_oct: jnp.ndarray,  # () scale at octave resolution
) -> jnp.ndarray:
    """128-D descriptor for one keypoint on one octave image (vmapped)."""
    # --- Orientation: 36-bin gradient histogram on a 13x13 grid -----------
    r = jnp.arange(-6.0, 7.0)
    dy, dx = jnp.meshgrid(r, r, indexing="ij")
    delta = 0.75 * sigma_oct
    grid = xy_oct + jnp.stack([dx, dy], -1) * delta  # (13, 13, 2)
    px = bilinear_sample(gx, grid)
    py = bilinear_sample(gy, grid)
    mag = jnp.sqrt(px * px + py * py)
    ang = jnp.arctan2(py, px)  # [-pi, pi]
    wgt = jnp.exp(-(dx * dx + dy * dy) / (2.0 * 4.5**2))
    bins = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * 36.0).astype(jnp.int32) % 36
    hist = jnp.zeros(36).at[bins.reshape(-1)].add((mag * wgt).reshape(-1))
    # Smooth the circular histogram and take the dominant direction.
    hist = (jnp.roll(hist, 1) + hist + jnp.roll(hist, -1)) / 3.0
    theta = (jnp.argmax(hist).astype(jnp.float32) + 0.5) / 36.0 * 2 * jnp.pi - jnp.pi

    # --- Descriptor: 16x16 samples -> 4x4 cells x 8 orientation bins ------
    r16 = jnp.arange(-7.5, 8.0)  # 16 samples
    dy16, dx16 = jnp.meshgrid(r16, r16, indexing="ij")
    ct, st = jnp.cos(theta), jnp.sin(theta)
    rx = ct * dx16 - st * dy16
    ry = st * dx16 + ct * dy16
    grid16 = xy_oct + jnp.stack([rx, ry], -1) * delta  # rotated, scaled
    sx = bilinear_sample(gx, grid16)
    sy = bilinear_sample(gy, grid16)
    smag = jnp.sqrt(sx * sx + sy * sy)
    sang = jnp.arctan2(sy, sx) - theta
    w16 = jnp.exp(-(dx16 * dx16 + dy16 * dy16) / (2.0 * 8.0**2))
    m = smag * w16

    # Soft orientation binning into 8 bins, hard 4x4 spatial cells.
    a = (sang / (2 * jnp.pi)) % 1.0 * 8.0  # [0, 8)
    b0 = jnp.floor(a)
    fb = a - b0
    b0 = b0.astype(jnp.int32) % 8
    b1 = (b0 + 1) % 8
    cell = (dy16 + 8.0) // 4 * 4 + (dx16 + 8.0) // 4  # (16,16) in [0,16)
    cell = cell.astype(jnp.int32)
    flatidx0 = cell * 8 + b0
    flatidx1 = cell * 8 + b1
    desc = (
        jnp.zeros(128)
        .at[flatidx0.reshape(-1)].add((m * (1 - fb)).reshape(-1))
        .at[flatidx1.reshape(-1)].add((m * fb).reshape(-1))
    )
    desc = desc / jnp.maximum(jnp.linalg.norm(desc), 1e-8)
    desc = jnp.minimum(desc, 0.2)
    return desc / jnp.maximum(jnp.linalg.norm(desc), 1e-8)


def sift_describe(
    img: jnp.ndarray,
    xy: jnp.ndarray,  # (K, 2) level-0 pixels
    sigma: jnp.ndarray,  # (K,) absolute scale (level-0 px); <=0 -> base scale
    num_octaves: int = 3,
    scales_per_octave: int = 3,
) -> jnp.ndarray:
    """(K, 128) descriptors at given positions/scales.

    Each keypoint is assigned the octave whose resolution matches its scale;
    descriptors are computed on every octave's base-blur image and selected
    by mask (octave count is small and static, so this is a 3x fused
    compute, not a dynamic branch).
    """
    img = img.astype(jnp.float32) / 255.0
    octaves = build_scale_space(img, num_octaves, scales_per_octave)
    sigma = jnp.where(sigma > 0, sigma, _BASE_SIGMA)
    oct_idx = jnp.clip(
        jnp.floor(jnp.log2(jnp.maximum(sigma / _BASE_SIGMA, 1e-6))).astype(jnp.int32),
        0,
        num_octaves - 1,
    )
    descs = []
    for o, stack in enumerate(octaves):
        # Per-keypoint in-octave Gaussian image: pick the closest scale slice.
        mul = float(2**o)
        sig_oct = sigma / mul
        s_rel = jnp.clip(
            jnp.round(
                jnp.log2(jnp.maximum(sig_oct / _BASE_SIGMA, 1e-6)) * scales_per_octave
            ).astype(jnp.int32),
            0,
            scales_per_octave + 2,
        )
        grads = [image_gradients(stack[s]) for s in range(scales_per_octave + 3)]
        gxs = jnp.stack([g[0] for g in grads])
        gys = jnp.stack([g[1] for g in grads])

        def one(xy_k, sig_k, s_k, gxs=gxs, gys=gys, stack=stack, mul=mul):
            gx = gxs[s_k]
            gy = gys[s_k]
            return _descriptor_at(stack[s_k], gx, gy, xy_k / mul, sig_k / mul)

        descs.append(jax.vmap(one)(xy, sigma, s_rel))
    out = descs[0]
    for o in range(1, num_octaves):
        out = jnp.where((oct_idx == o)[:, None], descs[o], out)
    return out


def sift_features(
    img: jnp.ndarray,
    num_keypoints: int,
    num_octaves: int = 3,
    scales_per_octave: int = 3,
    contrast_threshold: float = 0.02,
    edge_ratio: float = 10.0,
    border: int = 8,
) -> tuple[SiftKeypoints, jnp.ndarray]:
    """Detect + describe: (SiftKeypoints, (K, 128) descriptors)."""
    kp = sift_detect(
        img, num_keypoints, num_octaves, scales_per_octave,
        contrast_threshold, edge_ratio, border,
    )
    desc = sift_describe(img, kp.xy, kp.sigma, num_octaves, scales_per_octave)
    return kp, desc
