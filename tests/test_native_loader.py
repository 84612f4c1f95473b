"""Native C++ frame loader (native/frame_loader.cc) vs the PIL oracle.

Strategy per SURVEY §4: kernel-vs-reference diff where the oracle is the
pure-Python host implementation — decode must be bit-identical for grayscale
PNGs (the KITTI micro-dataset shipped in the reference's tests) and for
synthetic RGB PNGs (ITU-R 601-2 luma parity with PIL convert("L")).
"""

import glob
import io
import os

import numpy as np
import pytest

from vo_tpu.data import native_loader as nl

KITTI_IMAGES = sorted(
    glob.glob("/root/reference/tests/test_data/kitti/05/image_0/*.png")
)

pytestmark = pytest.mark.skipif(
    not nl.available(), reason="native loader not built (toolchain missing)"
)


def _pil_gray(path):
    from PIL import Image

    return np.asarray(Image.open(path).convert("L"), dtype=np.float32)


@pytest.mark.skipif(not KITTI_IMAGES, reason="reference micro-dataset absent")
def test_decode_gray_png_exact():
    for p in KITTI_IMAGES:
        a = nl.decode_gray(p)
        b = _pil_gray(p)
        assert a.dtype == np.float32 and a.shape == b.shape
        np.testing.assert_array_equal(a, b)


def test_decode_rgb_png_matches_pil_luma(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(2023)
    rgb = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    p = str(tmp_path / "rgb.png")
    Image.fromarray(rgb, "RGB").save(p)
    np.testing.assert_array_equal(nl.decode_gray(p), _pil_gray(p))


def test_decode_jpeg_close_to_pil(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, size=(40, 56), dtype=np.uint8)
    p = str(tmp_path / "g.jpg")
    Image.fromarray(gray, "L").save(p, quality=95)
    a = nl.decode_gray(p)
    b = _pil_gray(p)
    # Both decode the same JPEG stream; IDCT rounding may differ by 1 LSB.
    assert np.abs(a - b).max() <= 1.0


def test_image_size():
    if KITTI_IMAGES:
        assert nl.image_size(KITTI_IMAGES[0]) == (370, 1226)


@pytest.mark.skipif(not KITTI_IMAGES, reason="reference micro-dataset absent")
def test_prefetcher_sequential_parity():
    with nl.FramePrefetcher(KITTI_IMAGES, n_threads=3, ring=3) as pf:
        assert (pf.h, pf.w) == (370, 1226)
        for i in range(pf.n):
            np.testing.assert_array_equal(pf.get(i), _pil_gray(KITTI_IMAGES[i]))


@pytest.mark.skipif(not KITTI_IMAGES, reason="reference micro-dataset absent")
def test_prefetcher_rejects_out_of_order():
    with nl.FramePrefetcher(KITTI_IMAGES, n_threads=2, ring=2) as pf:
        pf.get(0)
        with pytest.raises(ValueError):
            pf.get(2)


def test_decode_failure_raises(tmp_path):
    bad = str(tmp_path / "bad.png")
    with open(bad, "wb") as f:
        f.write(b"not an image")
    with pytest.raises(IOError):
        nl.decode_gray(bad)


@pytest.mark.skipif(not KITTI_IMAGES, reason="reference micro-dataset absent")
def test_sequence_uses_native_path():
    from vo_tpu.data import Sequence

    seq = Sequence("kitti", path="/root/reference/tests/test_data", kitti_sequence="05")
    f0 = seq.get_frame(0)
    np.testing.assert_array_equal(f0, _pil_gray(KITTI_IMAGES[0]))
    with seq.prefetch(n_threads=2, ring=3) as pf:
        np.testing.assert_array_equal(pf.get(0), f0)


def test_16bit_png_declined_natively_falls_back_to_pil(tmp_path):
    """16-bit PNGs: libpng strip-16 and PIL convert('L') narrow differently,
    so the native path DECLINES them (returns an error) and _imread_gray
    falls back to PIL — pinning the intended behavior (ADVICE r1)."""
    from PIL import Image

    from vo_tpu.data.loaders import _imread_gray, _imread_gray_pil

    rng = np.random.default_rng(11)
    deep = rng.integers(0, 65536, size=(24, 32), dtype=np.uint16)
    p = str(tmp_path / "deep.png")
    Image.fromarray(deep).save(p)  # uint16 -> 16-bit grayscale PNG
    with pytest.raises(IOError):
        nl.decode_gray(p)
    np.testing.assert_array_equal(_imread_gray(p), _imread_gray_pil(p))


def test_prefetcher_get_advances_past_decode_failure(tmp_path):
    """One bad frame raises once; the next get() serves the next frame
    instead of permanently desynchronizing (ADVICE r1)."""
    from PIL import Image

    good0 = str(tmp_path / "a.png")
    bad = str(tmp_path / "b.png")
    good1 = str(tmp_path / "c.png")
    img = np.arange(12 * 16, dtype=np.uint8).reshape(12, 16)
    Image.fromarray(img, "L").save(good0)
    Image.fromarray(img + 1, "L").save(good1)
    with open(bad, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\nnot really")
    with nl.FramePrefetcher([good0, bad, good1], n_threads=1, ring=2) as pf:
        np.testing.assert_array_equal(pf.get(0), img.astype(np.float32))
        with pytest.raises(IOError):
            pf.get(1)
        np.testing.assert_array_equal(pf.get(2), (img + 1).astype(np.float32))
