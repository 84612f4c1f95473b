"""SIFT front-end tests: scale-space detection and descriptor matching.

Mirrors the reference's test strategy (SURVEY.md §4): synthetic images with
planted structure as the ground-truth oracle, invariance checks instead of
golden values.
"""

import pytest
import numpy as np
import jax.numpy as jnp

from vo_tpu.ops.descriptors import match_descriptors
from vo_tpu.ops.sift import sift_detect, sift_describe, sift_features


def _blob_image(rng, h=128, w=160, n=12, r_range=(2.0, 6.0)):
    """Gaussian blobs on a dark background; returns (img, centers)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w))
    centers = []
    while len(centers) < n:
        cx = rng.uniform(20, w - 20)
        cy = rng.uniform(20, h - 20)
        if centers and np.min(
            np.hypot(np.array(centers)[:, 0] - cx, np.array(centers)[:, 1] - cy)
        ) < 18:
            continue
        r = rng.uniform(*r_range)
        img += 200.0 * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r * r))
        centers.append((cx, cy))
    return np.clip(img, 0, 255).astype(np.float32), np.array(centers)


def test_detect_finds_planted_blobs(rng):
    img, centers = _blob_image(rng)
    kp = sift_detect(jnp.asarray(img), 64)
    xy = np.asarray(kp.xy)[np.asarray(kp.valid)]
    assert len(xy) >= len(centers) // 2
    # Every blob center should have a detection within ~3 px.
    d = np.linalg.norm(xy[None, :, :] - centers[:, None, :], axis=-1).min(axis=1)
    assert (d < 3.0).mean() > 0.6, d


def test_scale_assignment_tracks_blob_size(rng):
    """Bigger blobs must be detected at larger absolute scale.

    Small blobs start at r=2.5: without the canonical 2x-upsampled -1
    octave (deliberately skipped, see module docstring) blobs below ~2.5 px
    peak beneath the sampled scale range."""
    img_small, c_small = _blob_image(rng, n=6, r_range=(2.5, 3.5))
    img_big, c_big = _blob_image(rng, n=6, r_range=(6.0, 8.0))
    kp_s = sift_detect(jnp.asarray(img_small), 32)
    kp_b = sift_detect(jnp.asarray(img_big), 32)

    def med_sigma(kp, centers):
        xy = np.asarray(kp.xy)
        sig = np.asarray(kp.sigma)
        ok = np.asarray(kp.valid)
        d = np.linalg.norm(xy[None] - centers[:, None], axis=-1)
        near = (d.min(axis=0) < 4.0) & ok
        return np.median(sig[near]) if near.any() else np.nan

    s_small = med_sigma(kp_s, c_small)
    s_big = med_sigma(kp_b, c_big)
    assert np.isfinite(s_small) and np.isfinite(s_big)
    assert s_big > 1.5 * s_small, (s_small, s_big)


@pytest.mark.slow
def test_descriptor_matches_under_rotation(rng):
    """Descriptors of the same scene rotated 90 deg must match by identity
    (90 deg keeps resampling exact, isolating rotation invariance)."""
    img, centers = _blob_image(rng, n=10)
    # Add texture so descriptors are distinctive.
    tex = rng.normal(0, 8.0, img.shape)
    from scipy.ndimage import gaussian_filter

    img = np.clip(img + gaussian_filter(tex, 2.0) * 4.0, 0, 255).astype(np.float32)
    rot = np.rot90(img).copy()  # (x, y) -> (y, W-1-x) in the rotated frame

    kp1, d1 = sift_features(jnp.asarray(img), 48)
    kp2, d2 = sift_features(jnp.asarray(rot), 48)
    m = match_descriptors(d1, d2, valid1=kp1.valid, valid2=kp2.valid, ratio=0.9)

    xy1 = np.asarray(kp1.xy)
    xy2 = np.asarray(kp2.xy)
    idx = np.asarray(m.idx)
    ok = np.asarray(m.valid)
    h, w = img.shape
    # Expected position of keypoint (x, y) after np.rot90: (y, w-1-x).
    exp = np.stack([xy1[:, 1], w - 1 - xy1[:, 0]], axis=-1)
    good = 0
    total = 0
    for i in range(len(xy1)):
        if not ok[i]:
            continue
        total += 1
        if np.linalg.norm(xy2[idx[i]] - exp[i]) < 4.0:
            good += 1
    assert total >= 8, f"too few matches: {total}"
    assert good / total > 0.7, f"{good}/{total} geometric agreement"


@pytest.mark.slow
def test_describe_at_given_points_is_stable(rng):
    """sift_describe at identical (xy, sigma) on the same image is
    deterministic and unit-norm."""
    img, _ = _blob_image(rng)
    xy = jnp.asarray([[40.0, 50.0], [80.0, 90.0], [100.0, 30.0]])
    sig = jnp.asarray([2.0, 3.0, 1.6])
    d1 = sift_describe(jnp.asarray(img), xy, sig)
    d2 = sift_describe(jnp.asarray(img), xy, sig)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2))
    norms = np.linalg.norm(np.asarray(d1), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_detect_subpixel_localization(rng):
    """Planted blobs at known fractional centers must be localized well below
    the octave-grid quantization (r4: integer octave coords -> +-2 px at
    octave 2, which fed straight into PnP as tracked positions)."""
    img, centers = _blob_image(rng, n=10, r_range=(3.0, 5.0))
    kp = sift_detect(jnp.asarray(img), 64)
    xy = np.asarray(kp.xy)[np.asarray(kp.valid)]
    d = np.linalg.norm(xy[None, :, :] - centers[:, None, :], axis=-1).min(axis=1)
    found = d < 2.0
    assert found.mean() > 0.5
    # Mean localization error of found blobs: subpixel, i.e. clearly better
    # than the 0.5 px floor of integer level-0 coords (and the 1-2 px floor
    # of integer octave-1/2 coords where most of these scales live).
    assert d[found].mean() < 0.45, d[found]
