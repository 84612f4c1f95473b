"""Image primitives: grayscale, gradients, separable Gaussian blur, pyramids,
bilinear sampling.

Replaces the reference's cv2.cvtColor / scipy.signal.convolve2d calls
(harris.py:103-120, klt.py:58-62) with XLA convolutions — `lax.conv` maps
straight onto TPU conv/matmul units and fuses with neighboring elementwise
work, so these are already near speed-of-light without custom kernels.
Images are f32 (H, W) single-channel unless noted.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax

# BT.601 luma weights — what cv2.cvtColor(BGR2GRAY)/RGB2GRAY uses.
_LUMA_RGB = (0.299, 0.587, 0.114)


def to_grayscale(img: jnp.ndarray, channel_order: str = "rgb") -> jnp.ndarray:
    """(H, W[, 3]) uint8/float -> (H, W) f32 grayscale in [0, 255]."""
    img = img.astype(jnp.float32)
    if img.ndim == 2:
        return img
    r, g, b = _LUMA_RGB
    w = jnp.asarray([r, g, b] if channel_order == "rgb" else [b, g, r], jnp.float32)
    return jnp.tensordot(img, w, axes=([-1], [0]))


def _filt1d(img: jnp.ndarray, taps, axis: int) -> jnp.ndarray:
    """1-D correlation along `axis` with static taps, SAME zero padding.

    TPU note: a single-channel 2-D `lax.conv` is degenerate for the MXU conv
    path (channel dims of 1 get padded to full lanes), so small separable
    stencils are unrolled into shifted adds instead — pure elementwise VPU
    work that XLA fuses into one kernel.
    """
    taps = [float(t) for t in taps]
    r = len(taps) // 2
    pad = [(0, 0), (0, 0)]
    pad[axis] = (r, r)
    p = jnp.pad(img, pad)
    n = img.shape[axis]
    out = None
    for i, t in enumerate(taps):
        if t == 0.0:
            continue
        sl = [slice(None), slice(None)]
        sl[axis] = slice(i, i + n)
        term = t * p[tuple(sl)]
        out = term if out is None else out + term
    return out if out is not None else jnp.zeros_like(img)


def _conv2d_same(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """2-D correlation with SAME zero padding. img (H, W), kernel (kh, kw).
    Kept for genuinely non-separable kernels."""
    out = lax.conv_general_dilated(
        img[None, None, :, :],
        kernel[None, None, :, :],
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0, 0]


def sobel(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sobel gradients (gx, gy), SAME padding.

    Ref parity: harris.py:103-120 computes the same 3x3 Sobel responses via
    scipy convolve2d (as convolution — kernels flipped; we use correlation
    with the standard kernels, which is identical for these antisymmetric
    kernels up to the sign convention cv2 uses). Separable:
    sobel_x = [1,2,1]_y ⊗ [-1,0,1]_x.
    """
    smooth = (1.0, 2.0, 1.0)
    diff = (-1.0, 0.0, 1.0)
    gx = _filt1d(_filt1d(img, smooth, 0), diff, 1)
    gy = _filt1d(_filt1d(img, smooth, 1), diff, 0)
    return gx, gy


def box_filter(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """Separable box sum (not mean) over a size x size window, SAME padding.

    Ref parity: the Harris patch sum at harris.py:122-127 (ones kernel).
    """
    ones = (1.0,) * size
    return _filt1d(_filt1d(img, ones, 0), ones, 1)


def gaussian_kernel1d(sigma: float, radius: int | None = None) -> jnp.ndarray:
    if radius is None:
        radius = max(1, int(math.ceil(3.0 * sigma)))
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def gaussian_blur(img: jnp.ndarray, sigma: float, radius: int | None = None) -> jnp.ndarray:
    """Separable Gaussian blur, SAME padding (statically unrolled taps)."""
    import numpy as _np

    if radius is None:
        radius = max(1, int(math.ceil(3.0 * sigma)))
    x = _np.arange(-radius, radius + 1, dtype=_np.float64)
    k = _np.exp(-0.5 * (x / sigma) ** 2)
    k = k / k.sum()
    return _filt1d(_filt1d(img, k, 1), k, 0)


def downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """Anti-aliased 2x downsample (blur then stride-2)."""
    return gaussian_blur(img, 1.0, radius=2)[::2, ::2]


def build_pyramid(img: jnp.ndarray, levels: int) -> list[jnp.ndarray]:
    """Gaussian pyramid, level 0 = full resolution. Static shapes per level
    (each level is its own array — jit-friendly as separate pytree leaves)."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(downsample2(pyr[-1]))
    return pyr


def image_gradients(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference gradients matching cv2's LK convention
    (scharr-free 0.5*(I[x+1]-I[x-1]))."""
    gx = jnp.zeros_like(img)
    gx = gx.at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    gy = jnp.zeros_like(img)
    gy = gy.at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))
    return gx, gy


def bilinear_sample(img: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Sample img (H, W) at float (x, y) locations pts (..., 2).

    Out-of-bounds coordinates are clamped (sampling then continues at the
    border pixel); callers that need validity should bounds-check
    separately.
    """
    h, w = img.shape
    x = jnp.clip(pts[..., 0], 0.0, w - 1.000001)
    y = jnp.clip(pts[..., 1], 0.0, h - 1.000001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = x - x0.astype(jnp.float32)
    fy = y - y0.astype(jnp.float32)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
