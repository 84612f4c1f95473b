"""Fused Pallas detection kernel vs the XLA oracle (interpret mode on CPU).

Strategy per SURVEY §4: the unfused XLA implementation in vo_tpu.ops.harris
is the reference backend; the Pallas kernel must reproduce its NMS-masked
response map bit-for-bit in structure (same maxima, same values) across
modes, strip boundaries, and image sizes smaller/larger than one strip.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vo_tpu.ops.harris import (
    detect_keypoints,
    harris_response,
    nms_masked_response,
    select_keypoints,
    shi_tomasi_response,
)
from vo_tpu.ops.pallas_kernels import corner_response_nms

RNG = np.random.default_rng(2023)


def _oracle(img, mode, patch, kappa, nms_r):
    resp = (
        harris_response(img, patch, kappa)
        if mode == "harris"
        else shi_tomasi_response(img, patch)
    )
    return np.asarray(nms_masked_response(resp, nms_r))


@pytest.mark.parametrize("mode,patch,nms_r", [
    ("shi_tomasi", 7, 8),
    ("harris", 9, 5),
])
@pytest.mark.parametrize("shape", [(150, 260), (64, 200), (30, 40)])
def test_pallas_matches_oracle(mode, patch, nms_r, shape):
    img = jnp.asarray(RNG.uniform(0, 255, shape).astype(np.float32))
    got = np.asarray(
        corner_response_nms(
            img, mode=mode, patch_size=patch, kappa=0.08, nms_radius=nms_r,
            interpret=True,
        )
    )
    want = _oracle(img, mode, patch, 0.08, nms_r)
    fg, fw = np.isfinite(got), np.isfinite(want)
    np.testing.assert_array_equal(fg, fw)
    if fw.any():
        np.testing.assert_allclose(got[fw], want[fw], rtol=1e-5, atol=1e-2)


def test_detect_keypoints_pallas_equals_xla():
    img = jnp.asarray(RNG.uniform(0, 255, (190, 240)).astype(np.float32))
    # interpret-mode pallas is not reachable through detect_keypoints's
    # auto switch (CPU -> XLA), so compare the two masked maps directly and
    # the selection tail once.
    masked_p = corner_response_nms(
        img, mode="shi_tomasi", patch_size=7, kappa=0.08, nms_radius=6,
        interpret=True,
    )
    resp = shi_tomasi_response(img, 7)
    want = select_keypoints(resp, 100, nms_radius=6, border=10, quality_level=0.01)
    from vo_tpu.ops.harris import select_from_masked

    got = select_from_masked(masked_p, 100, border=10, quality_level=0.01)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))
    np.testing.assert_allclose(
        np.asarray(got.xy)[np.asarray(got.valid)],
        np.asarray(want.xy)[np.asarray(want.valid)],
    )


def test_detect_keypoints_auto_is_xla_on_cpu():
    img = jnp.asarray(RNG.uniform(0, 255, (120, 160)).astype(np.float32))
    a = detect_keypoints(img, 64, mode="harris", patch_size=9, nms_radius=5, border=8)
    resp = harris_response(img, 9, 0.08)
    b = select_keypoints(resp, 64, nms_radius=5, border=8)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_allclose(np.asarray(a.xy), np.asarray(b.xy))


@pytest.mark.slow
def test_patch_gather_matches_dynamic_slice():
    from vo_tpu.ops.pallas_kernels import extract_patches_aligned

    img = jnp.asarray(RNG.uniform(0, 255, (120, 400)).astype(np.float32))
    for size, n in [(21, 70), (35, 64)]:
        # Corners such that the aligned cover region stays in bounds.
        rh = (size + 14) // 8 * 8
        rw = (size + 254) // 128 * 128
        xs = RNG.integers(0, 400 - rw + 1, n) if 400 >= rw else np.zeros(n, int)
        ys = RNG.integers(0, 120 - rh + 1, n)
        corners = jnp.asarray(np.stack([xs, ys], -1).astype(np.int32))
        got = extract_patches_aligned(img, corners, size, interpret=True)
        import jax as _jax

        want = _jax.vmap(
            lambda c: _jax.lax.dynamic_slice(img, (c[1], c[0]), (size, size))
        )(corners)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pyramidal_lk_pallas_flag_cpu_fallback():
    # On CPU use_pallas=None must resolve to the XLA path and track exactly
    # like use_pallas=False.
    from vo_tpu.ops.image import build_pyramid
    from vo_tpu.ops.klt import pyramidal_lk

    img0 = RNG.uniform(0, 255, (100, 160)).astype(np.float32)
    shift = np.roll(img0, (2, 3), axis=(0, 1)).astype(np.float32)
    p0 = build_pyramid(jnp.asarray(img0), 2)
    p1 = build_pyramid(jnp.asarray(shift), 2)
    xy = jnp.asarray(RNG.uniform(30, 70, (32, 2)).astype(np.float32))
    a = pyramidal_lk(p0, p1, xy, radius=8)
    b = pyramidal_lk(p0, p1, xy, radius=8, use_pallas=False)
    np.testing.assert_allclose(np.asarray(a.xy), np.asarray(b.xy))


@pytest.mark.slow
def test_batched_kernels_match_per_image():
    """The (B, ...) grid variants and the custom_vmap dispatch must equal a
    per-image loop of the single-image kernels (interpret mode; the on-TPU
    check lives in tools/check_pallas_tpu.py)."""
    import jax as _jax

    from vo_tpu.ops.pallas_kernels import (
        corner_response_nms,
        corner_response_nms_auto,
        corner_response_nms_batched,
        extract_patches_aligned,
        extract_patches_aligned_auto,
        extract_patches_aligned_batched,
    )

    imgs = jnp.asarray(RNG.uniform(0, 255, (3, 96, 200)).astype(np.float32))
    ref = jnp.stack([corner_response_nms(imgs[i], interpret=True) for i in range(3)])

    def same_masked(a, b):
        return bool(jnp.all((a == b) | (jnp.isneginf(a) & jnp.isneginf(b))))

    got = corner_response_nms_batched(imgs, interpret=True)
    assert same_masked(got, ref)
    got_v = _jax.vmap(lambda im: corner_response_nms_auto(im, interpret=True))(imgs)
    assert same_masked(got_v, ref)

    big = jnp.asarray(RNG.uniform(0, 255, (3, 104, 384)).astype(np.float32))
    cor = jnp.asarray(RNG.integers(0, 50, (3, 70, 2)).astype(np.int32))
    pref = jnp.stack(
        [extract_patches_aligned(big[i], cor[i], 17, interpret=True) for i in range(3)]
    )
    pg = extract_patches_aligned_batched(big, cor, 17, interpret=True)
    np.testing.assert_array_equal(np.asarray(pg), np.asarray(pref))
    pv = _jax.vmap(
        lambda im, c: extract_patches_aligned_auto(im, c, 17, interpret=True)
    )(big, cor)
    np.testing.assert_array_equal(np.asarray(pv), np.asarray(pref))
