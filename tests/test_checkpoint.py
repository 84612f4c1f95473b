"""Checkpoint/resume: bit-exact state round-trip and continued stepping."""

import numpy as np

import jax
import jax.numpy as jnp

from vo_tpu.data import Sequence
from vo_tpu.models.pipeline import bootstrap, vo_step
from vo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from vo_tpu.utils.config import VOConfig

DATA_ROOT = "/root/reference/tests/test_data"


def test_checkpoint_roundtrip_and_resume(tmp_path):
    seq = Sequence("kitti", path=DATA_ROOT, kitti_sequence="05")
    cfg = VOConfig(capacity=256)
    K = jnp.asarray(seq.K)
    imgs = [jnp.asarray(seq.get_frame(i)) for i in range(len(seq))]
    state, _ = bootstrap(imgs[0], imgs[2], K, cfg, jax.random.PRNGKey(0))
    state, _ = vo_step(state, imgs[3], K, cfg)

    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state, cfg, trajectory=[np.eye(4)], frame_ids=[0])
    state2, cfg2, traj, fids = load_checkpoint(path)

    assert cfg2 == cfg
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert traj.shape == (1, 4, 4)

    # Resume: stepping the restored state must equal stepping the original.
    n1, o1 = vo_step(state, imgs[4], K, cfg)
    n2, o2 = vo_step(state2, imgs[4], K, cfg2)
    np.testing.assert_array_equal(np.asarray(o1.pose), np.asarray(o2.pose))
    np.testing.assert_array_equal(
        np.asarray(n1.table.state), np.asarray(n2.table.state)
    )


def test_checkpoint_preserves_tracker_mode(tmp_path):
    seq = Sequence("kitti", path=DATA_ROOT, kitti_sequence="05")
    cfg = VOConfig(capacity=256, tracker="harris")
    K = jnp.asarray(seq.K)
    imgs = [jnp.asarray(seq.get_frame(i)) for i in range(3)]
    state, _ = bootstrap(imgs[0], imgs[2], K, cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "h.npz")
    save_checkpoint(path, state, cfg)
    state2, cfg2, _, _ = load_checkpoint(path)
    assert cfg2.tracker == "harris"
    assert state2.table.desc.shape == state.table.desc.shape


def test_checkpoint_preserves_nondefault_dist_and_recovery(tmp_path):
    """r4 bug (VERDICT weak #4): _cfg_from_dict hand-enumerated the VOConfig
    fields and silently dropped `dist` and `recovery` — resuming a
    distorted-lens run zeroed the Brown-Conrady model mid-sequence. The
    rebuild is now introspective; every field must round-trip."""
    import dataclasses

    from vo_tpu.utils.config import RecoveryConfig

    seq = Sequence("kitti", path=DATA_ROOT, kitti_sequence="05")
    cfg = VOConfig(
        capacity=256,
        dist=(-0.28, 0.08, 0.001, -0.002, 0.01),
        recovery=RecoveryConfig(enabled=False, min_inliers=17),
    )
    K = jnp.asarray(seq.K)
    imgs = [jnp.asarray(seq.get_frame(i)) for i in range(3)]
    state, _ = bootstrap(imgs[0], imgs[2], K, cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "d.npz")
    save_checkpoint(path, state, cfg)
    _, cfg2, _, _ = load_checkpoint(path)

    assert cfg2.dist == cfg.dist, "lens model must survive resume"
    assert cfg2.recovery == cfg.recovery, "recovery tuning must survive resume"
    assert cfg2 == cfg  # every field, not just the two that regressed
    # hashability (static jit arg) requires the tuple stays a tuple
    hash(cfg2)
    assert not any(
        dataclasses.asdict(cfg2)[f] != dataclasses.asdict(cfg)[f]
        for f in ("detector", "klt", "pnp", "ba")
    )
