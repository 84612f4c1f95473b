"""Front-end kernel tests: cv2/scipy as oracles on synthetic and real KITTI
imagery (strategy of reference tests/test_harris.py)."""

import cv2
import numpy as np
import scipy.signal

import jax
import jax.numpy as jnp

from vo_tpu.ops.descriptors import extract_patches, match_descriptors
from vo_tpu.ops.harris import harris_response, select_keypoints, shi_tomasi_response
from vo_tpu.ops.image import (
    bilinear_sample,
    box_filter,
    build_pyramid,
    gaussian_blur,
    image_gradients,
    sobel,
    to_grayscale,
)

KITTI_IMG = "/root/reference/tests/test_data/kitti/05/image_0/000000.png"


def load_kitti():
    img = cv2.imread(KITTI_IMG, cv2.IMREAD_GRAYSCALE)
    assert img is not None
    return img


def test_to_grayscale_matches_cv2(rng):
    img = rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)
    ours = np.asarray(to_grayscale(jnp.asarray(img), channel_order="rgb"))
    cv = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).astype(np.float32)
    assert np.abs(ours - cv).max() <= 1.0  # cv2 rounds to uint8


def test_sobel_matches_scipy(rng):
    img = rng.normal(size=(32, 48)).astype(np.float32)
    gx, gy = sobel(jnp.asarray(img))
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
    # correlate == convolve with flipped kernel; interior must match exactly.
    gx_ref = scipy.signal.convolve2d(img, kx[::-1, ::-1], mode="same")
    gy_ref = scipy.signal.convolve2d(img, kx.T[::-1, ::-1], mode="same")
    np.testing.assert_allclose(np.asarray(gx)[1:-1, 1:-1], gx_ref[1:-1, 1:-1], atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy)[1:-1, 1:-1], gy_ref[1:-1, 1:-1], atol=1e-4)


def test_box_filter(rng):
    img = rng.normal(size=(20, 25)).astype(np.float32)
    ours = np.asarray(box_filter(jnp.asarray(img), 5))
    ref = scipy.signal.convolve2d(img, np.ones((5, 5), np.float32), mode="same")
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_gaussian_blur_matches_cv2(rng):
    img = rng.normal(size=(40, 50)).astype(np.float32) * 50
    ours = np.asarray(gaussian_blur(jnp.asarray(img), sigma=1.5, radius=4))
    cv = cv2.GaussianBlur(img, (9, 9), 1.5, borderType=cv2.BORDER_CONSTANT)
    np.testing.assert_allclose(ours[4:-4, 4:-4], cv[4:-4, 4:-4], atol=1e-3)


def test_pyramid_shapes():
    img = jnp.zeros((376, 1241), jnp.float32)
    pyr = build_pyramid(img, 3)
    assert pyr[0].shape == (376, 1241)
    assert pyr[1].shape == (188, 621)
    assert pyr[2].shape == (94, 311)


def test_harris_detects_checkerboard_corners():
    """Corners of a synthetic checkerboard must be found (self-validating
    geometry oracle)."""
    img = np.zeros((96, 96), np.float32)
    sq = 16
    for i in range(6):
        for j in range(6):
            if (i + j) % 2 == 0:
                img[i * sq : (i + 1) * sq, j * sq : (j + 1) * sq] = 255.0
    resp = harris_response(jnp.asarray(img), patch_size=5, kappa=0.06)
    kps = select_keypoints(resp, 32, nms_radius=4, border=8)
    xy = np.asarray(kps.xy)[np.asarray(kps.valid)]
    # Interior corners are at multiples of 16.
    assert len(xy) >= 20
    off = xy % sq  # distance to nearest multiple of 16
    d = np.minimum(off, sq - off).max(axis=1)
    # discrete Sobel+box windows shift the peak by a pixel or two
    assert np.median(d) <= 2.5 and d.max() <= 4.0


def test_harris_response_peaks_match_cv2_on_kitti():
    img = load_kitti().astype(np.float32)
    ours_resp = harris_response(jnp.asarray(img), patch_size=5, kappa=0.06)
    ours = select_keypoints(ours_resp, 200, nms_radius=8, border=10)
    xy = np.asarray(ours.xy)[np.asarray(ours.valid)]

    cv_resp = cv2.cornerHarris(img, 5, 3, 0.06)
    cv_resp = np.maximum(cv_resp, 0)
    # Our top-200 must land near strong cv2 responses (allow +-1 px peak
    # shift from the differing window normalizations): compare percentile
    # rank of the 3x3-dilated cv2 response at our keypoints.
    cv_dil = cv2.dilate(cv_resp, np.ones((3, 3), np.uint8))
    vals = cv_dil[xy[:, 1].astype(int), xy[:, 0].astype(int)]
    # NMS (radius 8) forces spatial spread, so compare against the 95th
    # percentile: every one of our picks should be a strong cv2 corner.
    thresh = np.quantile(cv_resp[10:-10, 10:-10], 0.95)
    assert (vals > thresh).mean() > 0.9


def test_select_keypoints_nms_spacing():
    img = load_kitti().astype(np.float32)
    resp = shi_tomasi_response(jnp.asarray(img), patch_size=7)
    kps = select_keypoints(resp, 300, nms_radius=8, border=8)
    xy = np.asarray(kps.xy)[np.asarray(kps.valid)]
    d = np.sqrt(((xy[:, None] - xy[None, :]) ** 2).sum(-1))
    np.fill_diagonal(d, np.inf)
    assert d.min() > 8.0  # strict local maxima of a 17x17 window


def test_extract_patches(rng):
    img = rng.normal(size=(50, 60)).astype(np.float32)
    xy = jnp.asarray([[20.0, 30.0], [5.0, 5.0]], jnp.float32)
    p = np.asarray(extract_patches(jnp.asarray(img), xy, radius=3))
    assert p.shape == (2, 49)
    np.testing.assert_allclose(p[0], img[27:34, 17:24].reshape(-1), atol=1e-6)
    # Border keypoint clamped to radius.
    np.testing.assert_allclose(p[1], img[2:9, 2:9].reshape(-1), atol=1e-6)


def test_match_descriptors_planted(rng):
    """Planted permutation with noise must be recovered; distractors rejected."""
    k, d = 64, 81
    base = rng.normal(size=(k, d)).astype(np.float32) * 10
    perm = rng.permutation(k)
    noisy = base[perm] + rng.normal(0, 0.05, (k, d)).astype(np.float32)
    res = match_descriptors(jnp.asarray(base), jnp.asarray(noisy), ratio=0.85)
    idx = np.asarray(res.idx)
    valid = np.asarray(res.valid)
    assert valid.mean() > 0.95
    # correct assignment: noisy[j] == base[perm[j]] => match of base row i is j with perm[j]==i
    inv = np.argsort(perm)
    assert (idx[valid] == inv[valid]).all()


def test_match_descriptors_degenerate_duplicates(rng):
    """Duplicated descriptors fail the ratio test (ref harris.py:74-122)."""
    d = rng.normal(size=(1, 32)).astype(np.float32)
    dup = jnp.asarray(np.repeat(d, 8, axis=0))
    res = match_descriptors(dup, dup, ratio=0.85)
    assert not np.asarray(res.valid).any()


def test_match_descriptors_validity_masks(rng):
    k = 16
    d1 = rng.normal(size=(k, 9)).astype(np.float32)
    valid1 = np.zeros(k, bool)
    valid1[:4] = True
    res = match_descriptors(
        jnp.asarray(d1), jnp.asarray(d1),
        valid1=jnp.asarray(valid1), valid2=jnp.asarray(valid1),
    )
    v = np.asarray(res.valid)
    assert not v[4:].any()
    assert (np.asarray(res.idx)[v] == np.arange(k)[v]).all()


def test_match_descriptors_end_to_end_kitti():
    """Detect + describe + match two consecutive KITTI frames; matches must
    be dominated by small displacements (ref test_harris.py:125-171)."""
    i0 = load_kitti().astype(np.float32)
    i1 = cv2.imread(KITTI_IMG.replace("000000", "000001"), cv2.IMREAD_GRAYSCALE).astype(np.float32)
    kp0 = select_keypoints(harris_response(jnp.asarray(i0), 9, 0.08), 500, nms_radius=8, border=12)
    kp1 = select_keypoints(harris_response(jnp.asarray(i1), 9, 0.08), 500, nms_radius=8, border=12)
    d0 = extract_patches(jnp.asarray(i0), kp0.xy, radius=9)
    d1 = extract_patches(jnp.asarray(i1), kp1.xy, radius=9)
    res = match_descriptors(d0, d1, kp0.valid, kp1.valid, ratio=0.85)
    v = np.asarray(res.valid)
    assert v.sum() > 100
    disp = np.asarray(kp1.xy)[np.asarray(res.idx)[v]] - np.asarray(kp0.xy)[v]
    mag = np.linalg.norm(disp, axis=1)
    assert np.median(mag) < 15.0  # consecutive frames, small motion


def test_image_gradients_and_bilinear(rng):
    img = np.fromfunction(lambda y, x: 3.0 * x + 2.0 * y, (20, 30), dtype=np.float32)
    gx, gy = image_gradients(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(gx)[1:-1, 1:-1], 3.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy)[1:-1, 1:-1], 2.0, atol=1e-5)
    pts = jnp.asarray(rng.uniform(1, 18, (10, 2)), jnp.float32)
    vals = np.asarray(bilinear_sample(jnp.asarray(img), pts))
    expect = 3.0 * np.asarray(pts)[:, 0] + 2.0 * np.asarray(pts)[:, 1]
    np.testing.assert_allclose(vals, expect, rtol=1e-5)
