"""Tests of the procedural sequence generator (vo_tpu.data.synthetic) —
the zero-egress stand-in for the reference's full-length downloaded
sequences (ref setup.sh:4-6)."""

import os

import numpy as np
import pytest

from vo_tpu.data.synthetic import (
    PathSpec,
    SyntheticSpec,
    build_city,
    generate,
    make_path,
    make_texture,
    render_frame,
    render_frames_accel,
)

TINY = SyntheticSpec(
    num_frames=8,
    width=160,
    height=120,
    focal=130.0,
    path=PathSpec(segments=(("straight", 30.0), ("turn", 90.0, 6.0), ("straight", 20.0))),
)


def test_path_poses_are_rigid_and_continuous():
    poses = make_path(TINY.path, 150)
    R = poses[:, :3, :3]
    # Proper rotations.
    err = np.abs(np.einsum("nij,nkj->nik", R, R) - np.eye(3)).max()
    assert err < 1e-5
    assert np.allclose(np.linalg.det(R), 1.0, atol=1e-5)
    # Constant speed: per-frame step == step_m (planar wiggle is tiny).
    d = np.linalg.norm(np.diff(poses[:, :3, 3], axis=0), axis=1)
    assert np.all(np.abs(d - TINY.path.step_m) < 0.05)
    # The quarter turn actually turns: final heading ~ perpendicular.
    f0 = poses[0, :3, 2]
    f1 = poses[-1, :3, 2]
    assert abs(float(f0 @ f1)) < 0.1


def test_city_clears_the_driven_path():
    rects = build_city(TINY.path, seed=3)
    poses = make_path(TINY.path, 150)
    centers = poses[:, :3, 3]
    # No wall's ground line may come within the clearance of any camera
    # position (the carve-out that keeps turns drivable).
    for i in range(rects.count - 1):  # last rect = ground plane
        p0, e1 = rects.p0[i], rects.e1[i]
        pts = p0[None, [0, 2]] + np.linspace(0, 1, 32)[:, None] * e1[None, [0, 2]]
        d = np.sqrt(
            ((pts[:, None, :] - centers[None, :, [0, 2]]) ** 2).sum(-1)
        ).min()
        assert d > 3.0, f"rect {i} at distance {d:.2f}"


def test_renderers_agree():
    rects = build_city(TINY.path, TINY.seed)
    tex = make_texture(TINY.seed + 1, size=256, levels=4)
    poses = make_path(TINY.path, 40)
    K = TINY.K()
    idx = [0, 20, 39]
    acc = render_frames_accel(rects, tex, poses[idx], K, TINY.width, TINY.height)
    ref = np.stack(
        [render_frame(rects, tex, poses[i], K, TINY.width, TINY.height) for i in idx]
    )
    d = np.abs(acc.astype(int) - ref.astype(int))
    assert d.max() <= 2, f"max diff {d.max()}"
    # Images have real texture (not flat / not sky-only).
    assert ref.std(axis=(1, 2)).min() > 10.0


def test_generate_layout_and_loader_roundtrip(tmp_path):
    out = generate(str(tmp_path / "seq"), TINY, verbose=False)
    assert os.path.exists(os.path.join(out, "K.txt"))
    assert os.path.exists(os.path.join(out, "poses.txt"))
    assert len(os.listdir(os.path.join(out, "images"))) == TINY.num_frames
    # Cache hit: second call must not re-render (marker matches).
    mtime = os.path.getmtime(os.path.join(out, "images", "img_00000.png"))
    generate(str(tmp_path / "seq"), TINY, verbose=False)
    assert os.path.getmtime(os.path.join(out, "images", "img_00000.png")) == mtime

    from vo_tpu.data import Sequence

    # Sequence("synthetic") generates under <root>/synthetic.
    os.rename(out, str(tmp_path / "synthetic"))
    seq = Sequence("synthetic", path=str(tmp_path))
    assert len(seq) == TINY.num_frames
    assert seq.K.shape == (3, 3) and seq.K[0, 0] == pytest.approx(TINY.focal)
    assert seq.gt_poses.shape == (TINY.num_frames, 4, 4)
    img = seq.get_frame(0)
    assert img.shape == (TINY.height, TINY.width)
    # GT poses written then re-read must match make_path exactly (f32).
    ref_poses = make_path(TINY.path, TINY.num_frames)
    assert np.allclose(seq.gt_poses[:, :3, :4], ref_poses[:, :3, :4], atol=1e-5)
