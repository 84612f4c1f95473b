"""Viz smoke tests: overlays and figure writers produce valid artifacts."""

import numpy as np

from vo_tpu.utils import viz


def test_keypoint_and_match_overlays(rng, tmp_path):
    img = rng.uniform(0, 255, (120, 160)).astype(np.float32)
    xy = rng.uniform(10, 110, (20, 2)).astype(np.float32)
    st = rng.integers(0, 3, 20)
    out = viz.keypoint_overlay(img, xy, st, xy + 2)
    assert out.shape == (120, 160, 3) and out.dtype == np.uint8

    m = viz.match_overlay(img, img, xy, xy + 3, np.ones(20, bool))
    assert m.shape == (120, 320, 3)


def test_figure_writers(rng, tmp_path):
    lm = rng.normal(0, 5, (200, 3)).astype(np.float32) + [0, 0, 15]
    poses = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    poses[:, 2, 3] = np.arange(5)
    p1 = str(tmp_path / "map.pdf")
    viz.save_point_cloud_plot(p1, lm, poses)
    p2 = str(tmp_path / "traj.pdf")
    viz.save_trajectory_plot(p2, poses[:, :3, 3], poses[:, :3, 3], lm)
    import os
    assert os.path.getsize(p1) > 1000 and os.path.getsize(p2) > 1000
