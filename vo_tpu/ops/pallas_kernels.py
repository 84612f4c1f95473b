"""Pallas TPU kernels for the detection front-end.

The hot image-plane pipeline — Sobel gradients, structure-tensor box sums,
Harris / Shi-Tomasi response, and non-maximum suppression (capability parity
with reference harris.py:103-152 and the cv2.goodFeaturesToTrack criterion,
klt.py:24-26) — is a chain of ~8 stencil passes. As separate XLA HLOs each
pass round-trips the full image through HBM; this kernel fuses the whole
chain into ONE pass: each grid program DMAs a row strip (+halo) from HBM
into VMEM, runs every stencil as shifted adds/maxes on VPU registers, and
writes a single output strip — the NMS-masked response map (response at
strict local maxima, -inf elsewhere) ready for one lax.top_k outside.

Numerics match `vo_tpu.ops.harris` + `select_keypoints` exactly (same
zero-padding convention for the stencils, same -inf edge padding and
flat-index tie-break for the NMS), so the XLA path remains both the CPU
fallback and the oracle for parity tests (interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_STRIP = 64  # output rows per grid program

# Patch-gather kernel geometry.
_GATHER_BLK = 64  # keypoints per grid program
_GATHER_NSEM = 8  # DMAs in flight


def _shifted_sum(x: jnp.ndarray, taps: tuple[float, ...], axis: int) -> jnp.ndarray:
    """1-D correlation with static taps, zero padding, on a VMEM value."""
    r = len(taps) // 2
    n = x.shape[axis]
    pad = [(0, 0), (0, 0)]
    pad[axis] = (r, r)
    p = jnp.pad(x, pad)
    out = None
    for i, t in enumerate(taps):
        if t == 0.0:
            continue
        sl = [slice(None), slice(None)]
        sl[axis] = slice(i, i + n)
        term = t * p[tuple(sl)]
        out = term if out is None else out + term
    return out


def _shifted_max(x: jnp.ndarray, radius: int, axis: int) -> jnp.ndarray:
    """Separable running max over a (2r+1) window, -inf padding."""
    n = x.shape[axis]
    pad = [(0, 0), (0, 0)]
    pad[axis] = (radius, radius)
    p = jnp.pad(x, pad, constant_values=-jnp.inf)
    out = x
    for i in range(2 * radius + 1):
        if i == radius:
            continue
        sl = [slice(None), slice(None)]
        sl[axis] = slice(i, i + n)
        out = jnp.maximum(out, p[tuple(sl)])
    return out


def _response_strip(
    img: jnp.ndarray,
    mode: str,
    patch_size: int,
    kappa: float,
    valid: jnp.ndarray | None = None,
):
    """Corner response of a strip (same math as ops/harris.py:26-50).

    `valid` marks pixels inside the true image: the unfused oracle zero-pads
    at EVERY stage boundary, so gradients must be zeroed outside the image
    before the box sums (a strip's halo/width padding holds real pixel rows
    or whole-image zero padding — either way those gradient entries are 0 in
    the oracle's box sum).
    """
    smooth = (1.0, 2.0, 1.0)
    diff = (-1.0, 0.0, 1.0)
    gx = _shifted_sum(_shifted_sum(img, smooth, 0), diff, 1)
    gy = _shifted_sum(_shifted_sum(img, smooth, 1), diff, 0)
    if valid is not None:
        gx = jnp.where(valid, gx, 0.0)
        gy = jnp.where(valid, gy, 0.0)
    ones = (1.0,) * patch_size
    sxx = _shifted_sum(_shifted_sum(gx * gx, ones, 0), ones, 1)
    syy = _shifted_sum(_shifted_sum(gy * gy, ones, 0), ones, 1)
    sxy = _shifted_sum(_shifted_sum(gx * gy, ones, 0), ones, 1)
    if mode == "harris":
        det = sxx * syy - sxy * sxy
        tr = sxx + syy
        return jnp.maximum(det - kappa * tr * tr, 0.0)
    half_tr = 0.5 * (sxx + syy)
    rad = jnp.sqrt(jnp.maximum(0.25 * (sxx - syy) ** 2 + sxy * sxy, 0.0))
    return jnp.maximum(half_tr - rad, 0.0)


def _nms_strip_body(
    x, i, *, h: int, w: int, halo: int, mode: str, patch_size: int,
    kappa: float, nms_radius: int
):
    """Full stencil chain on one VMEM strip -> NMS-masked response strip."""
    win = _STRIP + 2 * halo
    wp = x.shape[1]  # 128-aligned padded width
    grow = jax.lax.broadcasted_iota(jnp.int32, (win, wp), 0) + (i * _STRIP - halo)
    gcol = jax.lax.broadcasted_iota(jnp.int32, (win, wp), 1)
    in_img = (grow >= 0) & (grow < h) & (gcol < w)
    resp = _response_strip(x, mode, patch_size, kappa, valid=in_img)

    # Pixels outside the true image must not produce or influence maxima:
    # the oracle's reduce_window pads with -inf beyond the image.
    resp = jnp.where(in_img, resp, -jnp.inf)

    pooled = _shifted_max(_shifted_max(resp, nms_radius, 0), nms_radius, 1)
    # Flat-index tie-break (same as select_keypoints): among equal maxima the
    # largest flat index wins (indexed in TRUE image width).
    gidx = (grow * w + gcol).astype(jnp.float32)
    tied = jnp.where(in_img & (resp >= pooled), gidx, -1.0)
    pooled_idx = _shifted_max(_shifted_max(tied, nms_radius, 0), nms_radius, 1)
    is_max = (resp >= pooled) & (gidx == pooled_idx)
    masked = jnp.where(is_max, resp, -jnp.inf)
    return masked[halo : halo + _STRIP, :]


def _kernel(
    img_hbm,
    out_ref,
    strip_vmem,
    sem,
    *,
    h: int,
    w: int,
    halo: int,
    mode: str,
    patch_size: int,
    kappa: float,
    nms_radius: int,
):
    i = pl.program_id(0)
    win = _STRIP + 2 * halo
    # The input is row-padded by `halo` on top and to a strip multiple plus
    # `halo` at the bottom, so every window below is statically in-bounds
    # and padded rows are zeros — exactly the oracle's stencil convention.
    dma = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * _STRIP, win), :], strip_vmem, sem
    )
    dma.start()
    dma.wait()
    out_ref[:, :] = _nms_strip_body(
        strip_vmem[:, :], i, h=h, w=w, halo=halo, mode=mode,
        patch_size=patch_size, kappa=kappa, nms_radius=nms_radius,
    )


def _kernel_batched(
    img_hbm,
    out_ref,
    strip_vmem,
    sem,
    *,
    h: int,
    w: int,
    halo: int,
    mode: str,
    patch_size: int,
    kappa: float,
    nms_radius: int,
):
    """Same strip program with a leading batch grid dimension (one image of
    the batch per `b`) — multi-sequence mode runs the fused kernel instead
    of falling back to the XLA chain."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    win = _STRIP + 2 * halo
    dma = pltpu.make_async_copy(
        img_hbm.at[b, pl.ds(i * _STRIP, win), :], strip_vmem, sem
    )
    dma.start()
    dma.wait()
    out_ref[0] = _nms_strip_body(
        strip_vmem[:, :], i, h=h, w=w, halo=halo, mode=mode,
        patch_size=patch_size, kappa=kappa, nms_radius=nms_radius,
    )


@functools.partial(
    jax.jit,
    static_argnames=("mode", "patch_size", "kappa", "nms_radius", "interpret"),
)
def corner_response_nms(
    img: jnp.ndarray,
    mode: str = "shi_tomasi",
    patch_size: int = 7,
    kappa: float = 0.08,
    nms_radius: int = 5,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused corner response + NMS masking (Pallas).

    Returns an (H, W) map equal to the response at strict local maxima of a
    (2*nms_radius+1)^2 window and -inf elsewhere — the fused equivalent of
    `harris_response`/`shi_tomasi_response` plus the NMS masking inside
    `select_keypoints` (vo_tpu/ops/harris.py), ready for one lax.top_k.
    """
    h, w = img.shape
    # Stencil reach of an output row: NMS tie-break reads `pooled` at
    # +/-nms_radius, which reads the response at +/-2*nms_radius, which reads
    # the image at +/-(patch//2 + 1); one extra row of margin. Rounded up so
    # the DMA window (strip + 2*halo rows) stays aligned to the f32 sublane
    # tiling of 8 rows (Mosaic rejects unaligned VMEM slices).
    halo = 2 * nms_radius + patch_size // 2 + 2
    halo = (halo + 3) // 4 * 4
    grid = (h + _STRIP - 1) // _STRIP
    wp = (w + 127) // 128 * 128  # lane-aligned width for the DMA slices
    imgp = jnp.pad(
        img.astype(jnp.float32),
        ((halo, grid * _STRIP + halo - h), (0, wp - w)),
    )

    kern = functools.partial(
        _kernel,
        h=h,
        w=w,
        halo=halo,
        mode=mode,
        patch_size=patch_size,
        kappa=kappa,
        nms_radius=nms_radius,
    )
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (_STRIP, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((grid * _STRIP, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_STRIP + 2 * halo, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(imgp)
    return out[:h, :w]


@functools.partial(
    jax.jit,
    static_argnames=("mode", "patch_size", "kappa", "nms_radius", "interpret"),
)
def corner_response_nms_batched(
    imgs: jnp.ndarray,
    mode: str = "shi_tomasi",
    patch_size: int = 7,
    kappa: float = 0.08,
    nms_radius: int = 5,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched `corner_response_nms`: (B, H, W) -> (B, H, W) masked maps via
    a (B, strips) grid — one fused kernel launch for the whole batch."""
    bsz, h, w = imgs.shape
    halo = 2 * nms_radius + patch_size // 2 + 2
    halo = (halo + 3) // 4 * 4
    grid = (h + _STRIP - 1) // _STRIP
    wp = (w + 127) // 128 * 128
    imgp = jnp.pad(
        imgs.astype(jnp.float32),
        ((0, 0), (halo, grid * _STRIP + halo - h), (0, wp - w)),
    )
    kern = functools.partial(
        _kernel_batched, h=h, w=w, halo=halo, mode=mode,
        patch_size=patch_size, kappa=kappa, nms_radius=nms_radius,
    )
    out = pl.pallas_call(
        kern,
        grid=(bsz, grid),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, _STRIP, wp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, grid * _STRIP, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_STRIP + 2 * halo, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(imgp)
    return out[:, :h, :w]


@functools.lru_cache(maxsize=None)
def _corner_nms_vmappable(mode, patch_size, kappa, nms_radius, interpret):
    """`corner_response_nms` with a custom vmap rule that dispatches to the
    batched grid kernel — `jax.vmap(vo_step)` (multi-sequence mode) then
    keeps the fused Pallas front-end instead of falling back to XLA."""

    @jax.custom_batching.custom_vmap
    def f(img):
        return corner_response_nms(
            img, mode=mode, patch_size=patch_size, kappa=kappa,
            nms_radius=nms_radius, interpret=interpret,
        )

    @f.def_vmap
    def _rule(axis_size, in_batched, img):  # noqa: ANN001
        (batched,) = in_batched
        if not batched:
            img = jnp.broadcast_to(img[None], (axis_size,) + img.shape)
        out = corner_response_nms_batched(
            img, mode=mode, patch_size=patch_size, kappa=kappa,
            nms_radius=nms_radius, interpret=interpret,
        )
        return out, True

    return f


def corner_response_nms_auto(
    img: jnp.ndarray,
    mode: str = "shi_tomasi",
    patch_size: int = 7,
    kappa: float = 0.08,
    nms_radius: int = 5,
    interpret: bool = False,
) -> jnp.ndarray:
    """vmap-aware front door: single image -> strip kernel; under jax.vmap
    -> the batched (B, strips) grid kernel."""
    return _corner_nms_vmappable(mode, patch_size, kappa, nms_radius, interpret)(img)


# ---------------------------------------------------------------------------
# Patch gather: per-keypoint DMA with aligned regions + dynamic-roll realign
# ---------------------------------------------------------------------------
#
# The LK front-end extracts one contiguous patch per keypoint per pyramid
# level (vo_tpu/ops/klt.py). As a vmapped lax.dynamic_slice that lowers to an
# XLA gather (~1.9 ms for 1024 patches on v5e); this kernel instead issues
# one HBM->VMEM DMA per keypoint (eight in flight), reading the tile-ALIGNED
# region that covers the patch (Mosaic requires both slice shape and offsets
# aligned to the (8, 128) f32 tiling), then realigns the content to the
# region origin with two cyclic rolls (dynamic lane/sublane rotates) and
# writes the exact patch — ~2.7x faster than the XLA gather, bit-identical.


def _gather_kernel(cx_ref, cy_ref, img_ref, out_ref, scratch, sems, *, size,
                   rh, rw):
    # Corners arrive as two flat (K,) scalar-prefetch arrays, NOT one (K, 2):
    # SMEM pads the trailing dim to 128 lanes, so (K, 2) int32 occupies 64x
    # its size and a batched stack blows the 1 MiB SMEM budget (found by the
    # on-device parity run, tools/check_pallas_tpu.py).
    g = pl.program_id(0)

    def get_dma(k):
        i = g * _GATHER_BLK + k
        y0 = (cy_ref[i] // 8) * 8
        x0 = (cx_ref[i] // 128) * 128
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(y0, rh), pl.ds(x0, rw)],
            scratch.at[k % _GATHER_NSEM],
            sems.at[k % _GATHER_NSEM],
        )

    for k in range(min(_GATHER_NSEM, _GATHER_BLK)):
        get_dma(k).start()
    for k in range(_GATHER_BLK):
        i = g * _GATHER_BLK + k
        get_dma(k).wait()
        dy = cy_ref[i] % 8
        dx = cx_ref[i] % 128
        region = scratch[k % _GATHER_NSEM]
        # Positive-shift cyclic rolls == shifting the patch corner to (0, 0);
        # wrapped wrap-around rows/cols land beyond `size` (rh >= size + 7,
        # rw >= size + 127) so the static slice below never sees them.
        rolled = pltpu.roll(pltpu.roll(region, rh - dy, 0), rw - dx, 1)
        out_ref[k] = rolled[:size, :size]
        if k + _GATHER_NSEM < _GATHER_BLK:
            get_dma(k + _GATHER_NSEM).start()


@functools.partial(jax.jit, static_argnames=("size", "interpret"))
def extract_patches_aligned(
    img: jnp.ndarray, corners: jnp.ndarray, size: int, interpret: bool = False
) -> jnp.ndarray:
    """(K, size, size) patches at integer corners (x, y) — Pallas DMA gather.

    Drop-in replacement for the vmapped-dynamic_slice extraction in
    vo_tpu/ops/klt.py (same clamping contract: every corner must satisfy
    0 <= corner and corner + region <= image shape, where the region is the
    aligned cover (size+7 -> /8, size+127 -> /128). Callers guarantee this
    by over-padding the image (see _lk_level).
    """
    k = corners.shape[0]
    rh = (size + 7 + 7) // 8 * 8
    rw = (size + 127 + 127) // 128 * 128
    kp = (k + _GATHER_BLK - 1) // _GATHER_BLK * _GATHER_BLK
    if kp != k:
        corners = jnp.concatenate(
            [corners, jnp.zeros((kp - k, 2), corners.dtype)], axis=0
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(kp // _GATHER_BLK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (_GATHER_BLK, size, size), lambda g, cx, cy: (g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((_GATHER_NSEM, rh, rw), jnp.float32),
            pltpu.SemaphoreType.DMA((_GATHER_NSEM,)),
        ],
    )
    kern = functools.partial(_gather_kernel, size=size, rh=rh, rw=rw)
    c32 = corners.astype(jnp.int32)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kp, size, size), jnp.float32),
        interpret=interpret,
    )(c32[:, 0], c32[:, 1], img.astype(jnp.float32))
    return out[:k]


def _gather_kernel_batched(
    cx_ref, cy_ref, img_ref, out_ref, scratch, sems, *, size, rh, rw
):
    """`_gather_kernel` with a leading batch grid dimension: image b of the
    stack, keypoint block g. Corners as two (B, K) arrays — see the SMEM
    padding note in `_gather_kernel`."""
    b = pl.program_id(0)
    g = pl.program_id(1)

    def get_dma(k):
        i = g * _GATHER_BLK + k
        y0 = (cy_ref[b, i] // 8) * 8
        x0 = (cx_ref[b, i] // 128) * 128
        return pltpu.make_async_copy(
            img_ref.at[b, pl.ds(y0, rh), pl.ds(x0, rw)],
            scratch.at[k % _GATHER_NSEM],
            sems.at[k % _GATHER_NSEM],
        )

    for k in range(min(_GATHER_NSEM, _GATHER_BLK)):
        get_dma(k).start()
    for k in range(_GATHER_BLK):
        i = g * _GATHER_BLK + k
        get_dma(k).wait()
        dy = cy_ref[b, i] % 8
        dx = cx_ref[b, i] % 128
        region = scratch[k % _GATHER_NSEM]
        rolled = pltpu.roll(pltpu.roll(region, rh - dy, 0), rw - dx, 1)
        out_ref[0, k] = rolled[:size, :size]
        if k + _GATHER_NSEM < _GATHER_BLK:
            get_dma(k + _GATHER_NSEM).start()


@functools.partial(jax.jit, static_argnames=("size", "interpret"))
def extract_patches_aligned_batched(
    imgs: jnp.ndarray, corners: jnp.ndarray, size: int, interpret: bool = False
) -> jnp.ndarray:
    """Batched DMA patch gather: (B, H, W) images + (B, K, 2) corners ->
    (B, K, size, size) patches via a (B, blocks) grid."""
    bsz, k = corners.shape[0], corners.shape[1]
    rh = (size + 7 + 7) // 8 * 8
    rw = (size + 127 + 127) // 128 * 128
    kp = (k + _GATHER_BLK - 1) // _GATHER_BLK * _GATHER_BLK
    if kp != k:
        corners = jnp.concatenate(
            [corners, jnp.zeros((bsz, kp - k, 2), corners.dtype)], axis=1
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, kp // _GATHER_BLK),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, _GATHER_BLK, size, size), lambda b, g, cx, cy: (b, g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((_GATHER_NSEM, rh, rw), jnp.float32),
            pltpu.SemaphoreType.DMA((_GATHER_NSEM,)),
        ],
    )
    kern = functools.partial(_gather_kernel_batched, size=size, rh=rh, rw=rw)
    c32 = corners.astype(jnp.int32)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, kp, size, size), jnp.float32),
        interpret=interpret,
    )(c32[..., 0], c32[..., 1], imgs.astype(jnp.float32))
    return out[:, :k]


@functools.lru_cache(maxsize=None)
def _gather_vmappable(size, interpret):
    @jax.custom_batching.custom_vmap
    def f(img, corners):
        return extract_patches_aligned(img, corners, size, interpret=interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, img, corners):  # noqa: ANN001
        img_b, cor_b = in_batched
        if not img_b:
            img = jnp.broadcast_to(img[None], (axis_size,) + img.shape)
        if not cor_b:
            corners = jnp.broadcast_to(
                corners[None], (axis_size,) + corners.shape
            )
        out = extract_patches_aligned_batched(
            img, corners, size, interpret=interpret
        )
        return out, True

    return f


def extract_patches_aligned_auto(
    img: jnp.ndarray, corners: jnp.ndarray, size: int, interpret: bool = False
) -> jnp.ndarray:
    """vmap-aware front door for the DMA patch gather (see
    `corner_response_nms_auto`)."""
    return _gather_vmappable(size, interpret)(img, corners)
