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
