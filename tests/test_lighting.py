"""Photometric nuisance e2e: the reference's documented Malaga failure is
lighting-correlated (Report.pdf 3.1.2 — exposure/shadow variation on the
sun-side of the drive). The synthetic city can now render per-frame exposure
flicker + a heading-anchored sun gradient (`lighting="varying"`); the KLT
front-end must either track through it or re-detect, and trajectory
accuracy must stay in the same regime as constant lighting."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vo_tpu.data import Sequence
from vo_tpu.data.evaluate import ate_rmse, positions_from_poses
from vo_tpu.data.synthetic import (
    PathSpec,
    SyntheticSpec,
    _apply_lighting,
    _lighting_curves,
    generate,
)
from vo_tpu.models.pipeline import bootstrap, vo_step
from vo_tpu.utils.config import BAConfig, VOConfig


def _spec(lighting):
    return SyntheticSpec(
        num_frames=60, width=320, height=240, focal=260.0,
        lighting=lighting,
        path=PathSpec(
            segments=(("straight", 8.0), ("turn", 45.0, 11.0), ("straight", 8.0))
        ),
    )


def test_lighting_curves_deterministic_and_bounded():
    spec = _spec("varying")
    poses = np.tile(np.eye(4, dtype=np.float32), (60, 1, 1))
    g1, b1, y1 = _lighting_curves(spec, poses)
    g2, b2, _ = _lighting_curves(spec, poses)
    np.testing.assert_array_equal(g1, g2)
    np.testing.assert_array_equal(b1, b2)
    assert 0.7 < g1.min() and g1.max() < 1.3
    assert np.abs(b1).max() < 20.0
    assert np.ptp(g1) > 0.1  # it actually varies


def test_apply_lighting_changes_brightness_but_not_geometry():
    img = np.full((240, 320), 100, np.uint8)
    out = _apply_lighting(img, gain=1.2, bias=5.0, yaw=0.9 + np.pi / 2)
    assert out.shape == img.shape and out.dtype == np.uint8
    # gain+bias: 100*1.2+5 = 125 at center; lateral gradient tilts it.
    assert abs(int(out[120, 160]) - 125) <= 2
    assert int(out[120, -1]) > int(out[120, 0])  # sun-side brighter


@pytest.mark.slow
def test_pipeline_survives_varying_lighting(tmp_path):
    """Same path rendered twice (constant vs varying lighting); the varying
    run must stay finite, keep tracking (no mass fallback), and land within
    3x of the constant run's ATE."""
    ates = {}
    for mode in ("constant", "varying"):
        root = tmp_path / mode
        generate(str(root / "synthetic"), _spec(mode), verbose=False)
        seq = Sequence("synthetic", path=str(root))
        cfg = VOConfig(capacity=512, ba=BAConfig(enabled=False))
        K = jnp.asarray(seq.K)
        state, _ = bootstrap(
            jnp.asarray(seq.get_frame(0)), jnp.asarray(seq.get_frame(2)), K,
            cfg, jax.random.PRNGKey(0),
        )
        poses = [np.eye(4, dtype=np.float32), np.asarray(state.pose)]
        ids = [0, 2]
        n_fallback = 0
        for i in range(3, len(seq)):
            state, o = vo_step(state, jnp.asarray(seq.get_frame(i)), K, cfg)
            poses.append(np.asarray(o.pose))
            n_fallback += int(not bool(o.pose_ok))
            ids.append(i)
        est = np.stack(poses)
        assert np.isfinite(est).all(), f"{mode}: non-finite poses"
        assert n_fallback <= 3, f"{mode}: {n_fallback} pose fallbacks"
        ates[mode] = ate_rmse(
            positions_from_poses(est),
            positions_from_poses(seq.gt_poses[ids]),
        )
    assert ates["varying"] < max(3.0 * ates["constant"], 0.35), ates