"""Loader and evaluator tests (parse-parity with reference loader.py plus
the new ATE/RPE module)."""

import os

import numpy as np
import pytest

from vo_tpu.data import Sequence, align_umeyama, ate_rmse, rpe
from vo_tpu.data.evaluate import positions_from_poses

DATA_ROOT = "/root/reference/tests/test_data"


def test_kitti_loader():
    seq = Sequence("kitti", path=DATA_ROOT, kitti_sequence="05")
    assert len(seq) == 6
    assert seq.K.shape == (3, 3)
    assert abs(seq.K[0, 0] - 707.0912) < 1e-3  # calib.txt P0 focal
    assert seq.gt_poses is not None and seq.gt_poses.shape[0] == 2761
    img = seq.get_frame(0)
    assert img.shape == (370, 1226) and img.dtype == np.float32
    frames = list(seq)
    assert len(frames) == 6


def test_kitti_loader_increment():
    seq = Sequence("kitti", path=DATA_ROOT, kitti_sequence="05", increment=2)
    assert len(seq) == 3
    assert seq.gt_poses.shape[0] == 1381


def test_unknown_dataset_raises():
    with pytest.raises(ValueError):
        Sequence("nonexistent", path=DATA_ROOT)


def test_missing_data_raises():
    with pytest.raises(Exception):
        Sequence("kitti", path="/tmp/definitely-not-here")


def test_parking_loader_synthetic_dir(tmp_path):
    """parking layout: K.txt + images/*.png (loader.py:172-182 parity)."""
    import cv2

    base = tmp_path / "parking"
    (base / "images").mkdir(parents=True)
    (base / "K.txt").write_text("331.37, 0, 320,\n0, 369.568, 240,\n0, 0, 1\n")
    for i in range(3):
        cv2.imwrite(str(base / "images" / f"img_{i:05d}.png"),
                    np.full((10, 12), i, np.uint8))
    seq = Sequence("parking", path=str(tmp_path))
    assert len(seq) == 3
    assert abs(seq.K[0, 0] - 331.37) < 1e-5
    assert seq.get_frame(1).mean() == 1.0


def _make_malaga_dir(tmp_path, n_frames=2):
    """Reference-parity Malaga layout (loader.py:100-158): Images/ +
    one camera_params txt per variant, sections CAMERA_* / CAMERA_PARAMS_*,
    values with `// comment` suffixes."""
    import cv2

    root = tmp_path / "malaga" / "malaga-urban-dataset-extract-07"
    imdir = root / "Images"
    imdir.mkdir(parents=True)
    for name, sec in [
        ("camera_params_rectified_a=0_1024x768.txt", "CAMERA"),
        ("camera_params_rectified_a=0_800x600.txt", "CAMERA"),
        ("camera_params_raw_1024x768.txt", "CAMERA_PARAMS"),
    ]:
        scale = 0.5 if "800" in name else 1.0
        (root / name).write_text(
            f"[{sec}_LEFT]\n"
            f"cx={512.0 * scale} // principal point\ncy={384.0 * scale}\n"
            f"fx={795.11 * scale}\nfy={795.11 * scale}\n"
            f"[{sec}_RIGHT]\n"
            f"cx={510.0 * scale}\ncy={380.0 * scale}\n"
            f"fx={794.0 * scale}\nfy={794.0 * scale}\n"
        )
    for i in range(n_frames):
        for side in ("left", "right"):
            cv2.imwrite(str(imdir / f"img_CAMERA1_{i}_{side}.jpg"),
                        np.zeros((12, 16), np.uint8))
    return root


def test_malaga_loader_rectified(tmp_path):
    _make_malaga_dir(tmp_path)
    seq = Sequence("malaga", path=str(tmp_path))
    assert len(seq) == 2  # only *left.jpg
    assert abs(seq.K[0, 0] - 795.11) < 1e-4
    assert abs(seq.K[0, 2] - 512.0) < 1e-5  # `// comment` suffix stripped


def test_malaga_loader_variants(tmp_path):
    _make_malaga_dir(tmp_path)
    lowres = Sequence("malaga", path=str(tmp_path), use_lowres=True)
    assert abs(lowres.K[0, 0] - 795.11 * 0.5) < 1e-4
    raw = Sequence("malaga", path=str(tmp_path), rectified=False)
    assert abs(raw.K[0, 0] - 795.11) < 1e-4  # CAMERA_PARAMS_LEFT section
    right = Sequence("malaga", path=str(tmp_path), camera=1)
    assert abs(right.K[0, 0] - 794.0) < 1e-4
    assert all(p.endswith("right.jpg") for p in right.frames)


def test_malaga_loader_missing_intrinsics_raises(tmp_path):
    root = _make_malaga_dir(tmp_path)
    (root / "camera_params_rectified_a=0_1024x768.txt").unlink()
    with pytest.raises(FileNotFoundError):
        Sequence("malaga", path=str(tmp_path))


def test_umeyama_recovers_planted_sim3(rng):
    src = rng.normal(size=(40, 3))
    s_true = 2.3
    ang = 0.7
    R_true = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
    )
    t_true = np.array([1.0, -2.0, 3.0])
    dst = (s_true * (R_true @ src.T)).T + t_true
    s, R, t = align_umeyama(src, dst)
    assert abs(s - s_true) < 1e-9
    np.testing.assert_allclose(R, R_true, atol=1e-9)
    np.testing.assert_allclose(t, t_true, atol=1e-9)
    assert ate_rmse(src, dst) < 1e-9


def test_rpe_zero_for_perfect_scaled_trajectory(rng):
    n = 20
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 2, 3] = np.arange(n) * 1.0
    est = poses.copy()
    est[:, :3, 3] *= 0.5  # global scale error only
    t_err, r_err = rpe(est, poses)
    assert t_err < 1e-9 and r_err < 1e-6
    # A genuinely broken relative motion shows up.
    est2 = est.copy()
    est2[10, :3, 3] += np.array([0.0, 1.0, 0.0])
    t_err2, _ = rpe(est2, poses)
    assert t_err2 > 0.1
