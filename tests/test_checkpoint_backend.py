"""Pose-graph back-end checkpoint/resume (VERDICT r3 missing #1).

The reference persists nothing (main.py:330 saves only a PDF); our own bar
from round 3: a resumed long run must be able to close loops whose FIRST
visit happened before the restart — which requires the keyframe DB, the
graph, the accepted-loop bookkeeping, and the verifier RNG key to survive
the checkpoint.
"""

import dataclasses
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_backend():
    from vo_tpu.models.backend import BackendConfig, PoseGraphBackend
    from vo_tpu.models.feature_table import empty_table

    K = jnp.asarray(np.diag([200.0, 200.0, 1.0]).astype(np.float32))
    K = K.at[0, 2].set(80.0).at[1, 2].set(60.0)
    be = PoseGraphBackend(
        K, BackendConfig(nodes=8, loop_edges=4, obs_per_entry=32, grid=8,
                         min_frame_gap=2)
    )
    rng = np.random.default_rng(3)
    table = empty_table(64)
    table = table._replace(
        xy=jnp.asarray(rng.uniform(10, 110, (64, 2)).astype(np.float32)),
        landmark=jnp.asarray(rng.normal(0, 2, (64, 3)).astype(np.float32) + [0, 0, 8]),
        state=jnp.full((64,), 2, jnp.int32),
        score=jnp.asarray(rng.uniform(0, 1, 64).astype(np.float32)),
    )
    img = jnp.asarray(rng.uniform(0, 255, (120, 160)).astype(np.float32))
    for f in (0, 10, 20):
        be.on_keyframe(img, np.eye(4, dtype=np.float32), table, f)
    return be


def test_backend_roundtrip(tmp_path):
    """save_checkpoint(backend=...) -> load_backend is exact: every graph/DB
    array, the RNG key, K, config, and loop telemetry survive."""
    from vo_tpu.data import Sequence
    from vo_tpu.models.pipeline import bootstrap
    from vo_tpu.utils.checkpoint import (
        load_backend, load_checkpoint, save_checkpoint,
    )
    from vo_tpu.utils.config import VOConfig

    seq = Sequence("kitti", path="/root/reference/tests/test_data",
                   kitti_sequence="05")
    cfg = VOConfig(capacity=256)
    K = jnp.asarray(seq.K)
    state, _ = bootstrap(
        jnp.asarray(seq.get_frame(0)), jnp.asarray(seq.get_frame(2)), K, cfg,
        jax.random.PRNGKey(0),
    )
    be = _tiny_backend()
    be.loops.append(dict(frame=20, node=2, matched_node=0, matched_frame=0,
                         similarity=0.97, inliers=25))
    be.n_culled = 1

    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state, cfg, backend=be)

    # The VOState path is untouched by the backend extension.
    state2, cfg2, _, _ = load_checkpoint(path)
    assert cfg2 == cfg
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    be2 = load_backend(path)
    assert be2 is not None
    assert be2.cfg == be.cfg
    for a, b in zip(jax.tree.leaves(be.graph), jax.tree.leaves(be2.graph)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(be.db), jax.tree.leaves(be2.db)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(be.key), np.asarray(be2.key))
    np.testing.assert_array_equal(np.asarray(be.K), np.asarray(be2.K))
    assert be2.loops == be.loops
    assert be2.n_culled == 1

    # A resumed backend keeps WORKING: registering one more keyframe on the
    # restored object matches doing so on the original (same key splits).
    rng = np.random.default_rng(5)
    from vo_tpu.models.feature_table import empty_table
    t2 = empty_table(64)._replace(
        xy=jnp.asarray(rng.uniform(10, 110, (64, 2)).astype(np.float32)),
        landmark=jnp.asarray(rng.normal(0, 2, (64, 3)).astype(np.float32) + [0, 0, 8]),
        state=jnp.full((64,), 2, jnp.int32),
        score=jnp.asarray(rng.uniform(0, 1, 64).astype(np.float32)),
    )
    img2 = jnp.asarray(rng.uniform(0, 255, (120, 160)).astype(np.float32))
    be.on_keyframe(img2, np.eye(4, dtype=np.float32), t2, 30)
    be2.on_keyframe(img2, np.eye(4, dtype=np.float32), t2, 30)
    for a, b in zip(jax.tree.leaves(be.graph), jax.tree.leaves(be2.graph)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert be.loops == be2.loops


def test_checkpoint_without_backend_loads_none(tmp_path):
    from vo_tpu.data import Sequence
    from vo_tpu.models.pipeline import bootstrap
    from vo_tpu.utils.checkpoint import load_backend, save_checkpoint
    from vo_tpu.utils.config import VOConfig

    seq = Sequence("kitti", path="/root/reference/tests/test_data",
                   kitti_sequence="05")
    cfg = VOConfig(capacity=256)
    K = jnp.asarray(seq.K)
    state, _ = bootstrap(
        jnp.asarray(seq.get_frame(0)), jnp.asarray(seq.get_frame(2)), K, cfg,
        jax.random.PRNGKey(0),
    )
    path = str(tmp_path / "nobe.npz")
    save_checkpoint(path, state, cfg)
    assert load_backend(path) is None


@pytest.mark.slow
def test_resume_closes_loop_first_visited_before_restart(tmp_path, capsys):
    """Run half the mini circuit, checkpoint, resume — the post-resume run
    must close a loop against a keyframe STORED BEFORE the restart, and the
    corrected ATE must match the uninterrupted run (VERDICT r3 task #4)."""
    from vo_tpu.data.synthetic import DEFAULT_SPEC, PathSpec, generate

    spec = dataclasses.replace(
        DEFAULT_SPEC,
        num_frames=312,
        path=PathSpec(
            segments=(
                ("straight", 14.0), ("turn", 90.0, 6.0),
                ("straight", 10.0), ("turn", 90.0, 6.0),
                ("straight", 14.0), ("turn", 90.0, 6.0),
                ("straight", 10.0), ("turn", 90.0, 6.0),
                ("straight", 8.0),
            ),
        ),
    )
    root = tmp_path / "mini"
    generate(str(root / "parking"), spec, verbose=False)

    import run_vo

    common = [
        "--dataset", "parking", "--data-root", str(root),
        "--platform", "cpu", "--chunk", "4", "--quiet",
        "--pose-graph", "--pg-every", "4", "--pg-min-frame-gap", "120",
    ]

    # Uninterrupted reference run.
    rc = run_vo.main(common + ["--save-npz", str(tmp_path / "full.npz")])
    assert rc == 0
    full = json.loads([ln for ln in capsys.readouterr().out.splitlines()
                       if ln.startswith("{")][-1])
    assert full["pg_loops"] >= 1

    # First half: stop ~frame 155, checkpointing (incl. the back-end).
    ckpt = str(tmp_path / "half.npz")
    rc = run_vo.main(common + [
        "--max-frames", "156", "--checkpoint", ckpt,
        "--checkpoint-every", "150",
    ])
    assert rc == 0
    capsys.readouterr()

    # Resume to the end. All loop closures happen in the retrace tail
    # (frames ~280+), i.e. AFTER the restart, against pre-restart keyframes.
    rc = run_vo.main(common + [
        "--resume", ckpt, "--save-npz", str(tmp_path / "resumed.npz"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    res = json.loads([ln for ln in out.splitlines()
                      if ln.startswith("{")][-1])

    assert res["pg_loops"] >= 1, out
    z = np.load(tmp_path / "resumed.npz", allow_pickle=True)
    loops = json.loads(str(z["loops"]))
    # The closure pairs a post-resume frame with a pre-restart keyframe.
    assert any(l["frame"] > 156 and l["matched_frame"] < 156 for l in loops), loops
    # Corrected accuracy matches the uninterrupted run.
    assert res["ate_rmse_m"] < 2.0
    assert res["ate_rmse_m"] <= full["ate_rmse_m"] * 1.25 + 0.1
