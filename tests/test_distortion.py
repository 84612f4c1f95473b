"""Camera distortion: cv2 as oracle for the forward model, round-trip for
the inverse (both are stubs in the reference, camera.py:38-54)."""

import cv2
import numpy as np
import pytest
import jax.numpy as jnp

from vo_tpu.geom.camera import Camera

K = np.array([[450.0, 0, 320], [0, 460.0, 240], [0, 0, 1]], np.float32)
DIST = np.array([-0.28, 0.07, 1e-3, -2e-3, 0.0], np.float32)


def _grid():
    xs = np.linspace(60, 580, 12)
    ys = np.linspace(60, 420, 9)
    return np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2).astype(np.float32)


def test_distort_matches_opencv():
    cam = Camera.create(K, dist=DIST)
    px = _grid()
    ours = np.asarray(cam.distort_points(jnp.asarray(px)))
    # cv2.projectPoints applies the same Brown-Conrady model to normalized pts.
    n = cv2.undistortPoints(px.reshape(-1, 1, 2), K, None).reshape(-1, 2)
    pts3 = np.concatenate([n, np.ones((len(n), 1))], axis=1).astype(np.float64)
    cv_px, _ = cv2.projectPoints(pts3, np.zeros(3), np.zeros(3), K.astype(np.float64),
                                 DIST.astype(np.float64))
    np.testing.assert_allclose(ours, cv_px.reshape(-1, 2), atol=5e-2)


def test_undistort_round_trip():
    cam = Camera.create(K, dist=DIST)
    px = _grid()
    distorted = cam.distort_points(jnp.asarray(px))
    recovered = np.asarray(cam.undistort_points(distorted))
    np.testing.assert_allclose(recovered, px, atol=1e-2)


def test_zero_distortion_is_identity():
    cam = Camera.create(K)
    px = _grid()
    np.testing.assert_allclose(np.asarray(cam.distort_points(jnp.asarray(px))), px, atol=1e-4)


@pytest.mark.slow
def test_pipeline_recovers_trajectory_through_distorted_lens(tmp_path):
    """End-to-end: images rendered through a Brown-Conrady lens; the
    pipeline configured with the true coefficients must recover the
    trajectory much better than one that assumes a pinhole. (The reference
    declares distortion but stubs it, camera.py:38-54.)

    The driven path includes a 45-degree turn: under pure forward motion a
    radial lens error is mostly absorbed by the Sim3 alignment (it looks
    like a scale change), but during rotation the distorted flow field is
    inconsistent with any rigid rotation, so the naive pinhole run picks up
    unabsorbable yaw bias (measured: 0.70 m vs 0.15 m aware)."""
    import jax

    from vo_tpu.data.evaluate import ate_rmse, positions_from_poses
    from vo_tpu.data.synthetic import PathSpec, SyntheticSpec, generate
    from vo_tpu.data import Sequence
    from vo_tpu.models.pipeline import bootstrap, vo_step
    from vo_tpu.utils.config import BAConfig, VOConfig

    spec = SyntheticSpec(
        num_frames=60, width=320, height=240, focal=260.0,
        dist=(-0.28, 0.08, 0.0, 0.0, 0.0),
        path=PathSpec(
            segments=(("straight", 8.0), ("turn", 45.0, 11.0), ("straight", 8.0))
        ),
    )
    out = generate(str(tmp_path / "synthetic"), spec, verbose=False)
    seq = Sequence("synthetic", path=str(tmp_path))
    assert len(seq) == 60 and out

    def run(dist):
        cfg = VOConfig(capacity=512, dist=dist, ba=BAConfig(enabled=False))
        K = jnp.asarray(seq.K)
        state, _ = bootstrap(
            jnp.asarray(seq.get_frame(0)), jnp.asarray(seq.get_frame(2)), K,
            cfg, jax.random.PRNGKey(0),
        )
        poses = [np.eye(4, dtype=np.float32), np.asarray(state.pose)]
        ids = [0, 2]
        for i in range(3, len(seq)):
            state, o = vo_step(state, jnp.asarray(seq.get_frame(i)), K, cfg)
            poses.append(np.asarray(o.pose))
            ids.append(i)
        gt = seq.gt_poses[ids]
        return ate_rmse(
            positions_from_poses(np.stack(poses)), positions_from_poses(gt)
        )

    ate_aware = run(spec.dist)
    ate_naive = run((0.0,) * 5)
    # With the lens modeled the turn is recovered (measured 0.153 m over a
    # ~24 m path); the pinhole assumption at k1=-0.28 is ~4.6x worse
    # (measured 0.70 m) because the turn's yaw bias can't be aligned away.
    assert ate_aware < 0.3, f"distortion-aware ATE {ate_aware:.3f} m"
    assert ate_naive > ate_aware * 2.0, (ate_naive, ate_aware)
