"""Pyramidal LK tests: synthetic translations with known ground truth and
cv2.calcOpticalFlowPyrLK as the independent oracle on real KITTI frames."""

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from vo_tpu.ops.harris import select_keypoints, shi_tomasi_response
from vo_tpu.ops.image import build_pyramid
from vo_tpu.ops.klt import pyramidal_lk

KITTI = "/root/reference/tests/test_data/kitti/05/image_0/{:06d}.png"


def textured_image(rng, h=120, w=160):
    img = rng.uniform(0, 255, (h // 8, w // 8)).astype(np.float32)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
    return cv2.GaussianBlur(img, (5, 5), 1.0)


def test_lk_recovers_pure_translation(rng):
    img = textured_image(rng)
    shift = (3.4, -2.6)  # (dx, dy)
    M = np.float32([[1, 0, shift[0]], [0, 1, shift[1]]])
    img2 = cv2.warpAffine(img, M, (img.shape[1], img.shape[0]))
    pyr1 = build_pyramid(jnp.asarray(img), 3)
    pyr2 = build_pyramid(jnp.asarray(img2), 3)
    kps = select_keypoints(shi_tomasi_response(jnp.asarray(img), 7), 50, nms_radius=6, border=20)
    xy = kps.xy
    res = pyramidal_lk(pyr1, pyr2, xy, radius=8)
    ok = np.asarray(res.status) & np.asarray(kps.valid)
    assert ok.sum() >= 30
    flow = np.asarray(res.xy) - np.asarray(xy)
    err = np.abs(flow[ok] - np.asarray(shift))
    assert np.median(err) < 0.1
    assert np.percentile(err, 90) < 0.5


def test_lk_large_motion_needs_pyramid(rng):
    """A 20-px shift is far outside a 17x17 window — only the pyramid makes
    it trackable (validates the coarse-to-fine handoff)."""
    img = textured_image(rng, 160, 240)
    shift = (21.0, 13.0)
    M = np.float32([[1, 0, shift[0]], [0, 1, shift[1]]])
    img2 = cv2.warpAffine(img, M, (img.shape[1], img.shape[0]))
    kps = select_keypoints(shi_tomasi_response(jnp.asarray(img), 7), 40, nms_radius=8, border=30)
    pyr1 = build_pyramid(jnp.asarray(img), 3)
    pyr2 = build_pyramid(jnp.asarray(img2), 3)
    res = pyramidal_lk(pyr1, pyr2, kps.xy, radius=8)
    ok = np.asarray(res.status) & np.asarray(kps.valid)
    flow = np.asarray(res.xy) - np.asarray(kps.xy)
    good = np.abs(flow[ok] - np.asarray(shift)).max(axis=1) < 1.0
    assert good.mean() > 0.7


def test_lk_vs_opencv_on_kitti():
    i0 = cv2.imread(KITTI.format(0), cv2.IMREAD_GRAYSCALE).astype(np.float32)
    i1 = cv2.imread(KITTI.format(1), cv2.IMREAD_GRAYSCALE).astype(np.float32)
    kps = select_keypoints(shi_tomasi_response(jnp.asarray(i0), 7), 200, nms_radius=8, border=20)
    xy = np.asarray(kps.xy).astype(np.float32)

    cv_pts, cv_st, cv_err = cv2.calcOpticalFlowPyrLK(
        i0.astype(np.uint8), i1.astype(np.uint8), xy.reshape(-1, 1, 2), None,
        winSize=(17, 17), maxLevel=2,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 10, 0.03),
    )
    cv_pts = cv_pts.reshape(-1, 2)
    cv_ok = (cv_st.reshape(-1) == 1) & (cv_err.reshape(-1) < 30)

    res = pyramidal_lk(
        build_pyramid(jnp.asarray(i0), 3), build_pyramid(jnp.asarray(i1), 3),
        jnp.asarray(xy), radius=8,
    )
    ours_ok = np.asarray(res.status) & np.asarray(kps.valid)
    both = ours_ok & cv_ok
    assert both.sum() > 100
    diff = np.linalg.norm(np.asarray(res.xy)[both] - cv_pts[both], axis=1)
    # Agreement with cv2 for the overwhelming majority of tracks.
    assert np.median(diff) < 0.3
    assert (diff < 1.0).mean() > 0.85


def test_lk_flags_bad_tracks(rng):
    """Keypoints tracked into an occluded/flat region must be flagged."""
    img = textured_image(rng)
    img2 = img.copy()
    img2[:, 80:] = 0.0  # right half wiped out
    kps = select_keypoints(shi_tomasi_response(jnp.asarray(img), 7), 40, nms_radius=6, border=12)
    res = pyramidal_lk(
        build_pyramid(jnp.asarray(img), 3), build_pyramid(jnp.asarray(img2), 3),
        kps.xy, radius=8, max_err=20.0,
    )
    xy = np.asarray(kps.xy)
    in_wiped = xy[:, 0] > 95
    ok = np.asarray(res.status)
    assert ok[in_wiped & np.asarray(kps.valid)].mean() < 0.2


def test_lk_jit_compiles_once():
    i0 = cv2.imread(KITTI.format(0), cv2.IMREAD_GRAYSCALE).astype(np.float32)
    i1 = cv2.imread(KITTI.format(1), cv2.IMREAD_GRAYSCALE).astype(np.float32)

    @jax.jit
    def track(p0, p1, p2, q0, q1, q2, xy):
        return pyramidal_lk([p0, p1, p2], [q0, q1, q2], xy, radius=8)

    pyr0 = build_pyramid(jnp.asarray(i0), 3)
    pyr1 = build_pyramid(jnp.asarray(i1), 3)
    xy = jnp.asarray(np.random.default_rng(0).uniform(30, 300, (128, 2)), jnp.float32)
    res = track(*pyr0, *pyr1, xy)
    assert res.xy.shape == (128, 2)
    assert np.isfinite(np.asarray(res.xy)).all()
