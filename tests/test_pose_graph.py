"""Pose-graph oracle tests: planted noisy pose chains + loop constraints must
recover ground truth (the reference has no back-end at all — Report.pdf 3.1.1
names it as future work, so the oracle is analytic, like tests/test_ba.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from vo_tpu.geom.lie import pose_inverse, se3_exp
from vo_tpu.models.pose_graph import (
    add_loop_edge,
    add_node,
    chain_span_scores,
    correct_trajectory,
    cull_node,
    empty_pose_graph,
    pg_optimize,
)


def _gt_chain(n, step=1.0, yaw_per=0.05, seed=0):
    """Ground-truth w_T_c chain driving forward with constant yaw rate."""
    poses = [np.eye(4, dtype=np.float32)]
    for _ in range(n - 1):
        c, s = np.cos(yaw_per), np.sin(yaw_per)
        dR = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        d = np.eye(4, dtype=np.float32)
        d[:3, :3] = dR
        d[:3, 3] = [0, 0, step]
        poses.append(poses[-1] @ d)
    return np.stack(poses)


def _graph_from_chain(gt, rel_noise=None, pose_init=None):
    """Build a graph whose chain constraints are (optionally noisy) GT
    relatives and whose node poses integrate those constraints."""
    n = gt.shape[0]
    g = empty_pose_graph(num_nodes=n + 4, num_loop_edges=8)
    cur = jnp.asarray(gt[0])
    g = add_node(g, cur, 0)
    for k in range(1, n):
        rel = np.linalg.inv(gt[k - 1]) @ gt[k]
        if rel_noise is not None:
            rel = rel @ np.asarray(se3_exp(jnp.asarray(rel_noise[k])))
        cur = cur @ jnp.asarray(rel)
        if pose_init == "integrate":
            g = add_node(g, cur, k)
        else:
            g = add_node(g, jnp.asarray(gt[k]), k)
    return g


def test_exact_chain_is_fixed_point():
    """Noise-free chain: optimization must not move any node."""
    gt = _gt_chain(12)
    g = _graph_from_chain(gt)
    out, errs = pg_optimize(g, iters=5)
    np.testing.assert_allclose(
        np.asarray(out.node_pose[:12]), gt.reshape(12, 16), atol=1e-4
    )
    assert float(errs[0]) < 1e-8


def test_loop_closure_recovers_planted_drift():
    """Integrated noisy odometry drifts; a single exact loop edge from the
    last node to the first must pull the chain back toward GT."""
    rng = np.random.default_rng(2023)
    n = 30
    gt = _gt_chain(n, step=1.0, yaw_per=2 * np.pi / n)  # a closed-ish loop
    noise = 0.01 * rng.standard_normal((n, 6)).astype(np.float32)
    g = _graph_from_chain(gt, rel_noise=noise, pose_init="integrate")

    drift0 = np.linalg.norm(
        np.asarray(g.node_pose[n - 1]).reshape(4, 4)[:3, 3] - gt[n - 1][:3, 3]
    )
    # Exact loop measurement: first node seen from the chain start.
    rel = jnp.asarray(np.linalg.inv(gt[0]) @ gt[n - 1])
    g = add_loop_edge(g, jnp.int32(0), jnp.int32(n - 1), rel)
    out, errs = pg_optimize(g, iters=15, damping=1e-5)

    est = np.asarray(out.node_pose[:n]).reshape(n, 4, 4)
    drift1 = np.linalg.norm(est[n - 1][:3, 3] - gt[n - 1][:3, 3])
    assert drift0 > 0.05  # the plant actually drifted
    assert drift1 < 0.3 * drift0, (drift0, drift1)
    assert float(errs[-1]) < float(errs[0])


def test_sim3_loop_closure_recovers_planted_scale_drift():
    """The monocular failure mode: odometry translations inflated by a
    drifting scale factor (the LOOP_SPEC circuit measured 1.66x -> 0.94x).
    A Sim(3) loop edge carrying the measured relative map scale must recover
    the geometry; an SE(3)-only graph (optimize_scale=False) must NOT —
    that contrast is exactly why the graph is Sim(3) (Strasdat RSS'10)."""
    n = 40
    gt = _gt_chain(n, step=1.0, yaw_per=2 * np.pi / n)  # closed circle
    # Map scale decays smoothly from 1.4 to 0.8 along the run.
    scale = np.linspace(1.4, 0.8, n).astype(np.float32)
    g = empty_pose_graph(num_nodes=n + 2, num_loop_edges=4)
    cur = jnp.asarray(gt[0])
    g = add_node(g, cur, 0)
    for k in range(1, n):
        rel = (np.linalg.inv(gt[k - 1]) @ gt[k]).astype(np.float32)
        rel_drifted = rel.copy()
        rel_drifted[:3, 3] *= scale[k]  # odometry believes scale 1
        cur = cur @ jnp.asarray(rel_drifted)
        g = add_node(g, cur, k)
    drift0 = np.linalg.norm(
        np.asarray(g.node_pose[n - 1]).reshape(4, 4)[:3, 3] - gt[n - 1][:3, 3]
    )
    assert drift0 > 1.0  # the plant drifted substantially

    # Loop measurement old(0) <-> new(n-1): exact relative pose, plus the
    # relative map scale s_old/s_new = 1/scale[n-1] in the rotation block.
    rel = (np.linalg.inv(gt[0]) @ gt[n - 1]).astype(np.float32)
    Z = rel.copy()
    Z[:3, :3] *= 1.0 / scale[n - 1]
    g = add_loop_edge(g, jnp.int32(0), jnp.int32(n - 1), jnp.asarray(Z))

    out, errs = pg_optimize(g, iters=20, damping=1e-5)
    est = np.asarray(out.node_pose[:n]).reshape(n, 4, 4)
    # Positions (similarity-corrected nodes): endpoint must come back.
    drift_sim3 = np.linalg.norm(est[n - 1][:3, 3] - gt[n - 1][:3, 3])
    assert drift_sim3 < 0.35 * drift0, (drift0, drift_sim3)
    # Recovered node scale is the CORRECTION factor — the inverse of the
    # planted map scale (the node similarity maps the inflated local frame
    # into the true world): s_end ~ 1/scale[n-1], within 15%.
    s_end = float(np.cbrt(np.linalg.det(est[n - 1][:3, :3])))
    assert abs(s_end - 1.0 / scale[n - 1]) < 0.15, (s_end, 1 / scale[n - 1])
    assert float(errs[-1]) < float(errs[0])

    # Contrast: rigid mode cannot express the scale and must do worse.
    out_rigid, _ = pg_optimize(g, iters=20, damping=1e-5,
                               optimize_scale=False)
    est_r = np.asarray(out_rigid.node_pose[:n]).reshape(n, 4, 4)
    drift_se3 = np.linalg.norm(est_r[n - 1][:3, 3] - gt[n - 1][:3, 3])
    assert drift_sim3 < drift_se3, (drift_sim3, drift_se3)


def test_gauge_first_node_fixed():
    gt = _gt_chain(10)
    rng = np.random.default_rng(7)
    noise = 0.02 * rng.standard_normal((10, 6)).astype(np.float32)
    g = _graph_from_chain(gt, rel_noise=noise, pose_init="integrate")
    out, _ = pg_optimize(g, iters=8)
    np.testing.assert_allclose(
        np.asarray(out.node_pose[0]).reshape(4, 4), gt[0], atol=1e-5
    )


def test_cull_contracts_chain_and_preserves_consistency():
    """Culling an interior node composes its constraints: re-integrating the
    compacted chain must land on the same final pose."""
    gt = _gt_chain(9)
    g = _graph_from_chain(gt)
    scores = chain_span_scores(g)
    assert np.isinf(float(scores[0]))  # gauge protected
    assert np.isinf(float(scores[8]))  # tail protected
    victim = int(np.argmin(np.asarray(scores)))
    g2 = cull_node(g, jnp.int32(victim))
    assert int(g2.n_nodes) == 8
    # Integrate the compacted chain from node 0.
    cur = np.asarray(g2.node_pose[0]).reshape(4, 4)
    for k in range(1, 8):
        cur = cur @ np.asarray(g2.rel_prev[k]).reshape(4, 4)
    np.testing.assert_allclose(cur, gt[8], atol=1e-4)
    # Frame ids shifted: the victim's frame is gone, order preserved.
    frames = np.asarray(g2.node_frame[:8])
    assert victim not in frames.tolist()
    assert (np.diff(frames) > 0).all()


def test_cull_protects_loop_endpoints():
    gt = _gt_chain(8)
    g = _graph_from_chain(gt)
    rel = jnp.asarray(np.linalg.inv(gt[2]) @ gt[6])
    g = add_loop_edge(g, jnp.int32(2), jnp.int32(6), rel)
    scores = np.asarray(chain_span_scores(g))
    assert np.isinf(scores[2]) and np.isinf(scores[6])


def test_cull_remaps_loop_indices():
    gt = _gt_chain(8)
    g = _graph_from_chain(gt)
    rel = jnp.asarray(np.linalg.inv(gt[2]) @ gt[6])
    g = add_loop_edge(g, jnp.int32(2), jnp.int32(6), rel)
    g2 = cull_node(g, jnp.int32(4))
    ij = np.asarray(g2.loop_ij[0])
    assert ij.tolist() == [2, 5]
    # The remapped loop edge must still be exactly consistent.
    out, errs = pg_optimize(g2, iters=3)
    assert float(errs[0]) < 1e-8


def test_add_node_when_full_is_noop():
    g = empty_pose_graph(num_nodes=3, num_loop_edges=2)
    for k in range(5):
        g = add_node(g, jnp.eye(4), k)
    assert int(g.n_nodes) == 3
    assert np.asarray(g.node_frame)[:3].tolist() == [0, 1, 2]


def test_correct_trajectory_reanchors_frames():
    """After optimization moves keyframes, interleaved frames follow their
    preceding keyframe rigidly."""
    gt = _gt_chain(20)
    frame_idx = jnp.arange(20)
    # Keyframes at frames 0, 5, 10, 15; optimization shifts each by +1m in x.
    node_frame = jnp.asarray([0, 5, 10, 15], jnp.int32)
    old = gt[np.asarray(node_frame)].reshape(4, 16)
    shift = np.eye(4, dtype=np.float32)
    shift[0, 3] = 1.0
    new = np.stack([(shift @ p.reshape(4, 4)).reshape(16) for p in old])
    out = correct_trajectory(
        jnp.asarray(gt), frame_idx,
        node_frame, jnp.asarray(old), jnp.asarray(new),
        jnp.ones((4,), bool),
    )
    out = np.asarray(out)
    np.testing.assert_allclose(out[:, 0, 3], gt[:, 0, 3] + 1.0, atol=1e-5)
    np.testing.assert_allclose(out[:, 2, 3], gt[:, 2, 3], atol=1e-5)


def test_pg_optimize_jits_once_and_runs_under_vmap_scale():
    """256-node graph (the deployment capacity) compiles and solves."""
    gt = _gt_chain(60, step=0.5)
    rng = np.random.default_rng(1)
    noise = 0.005 * rng.standard_normal((60, 6)).astype(np.float32)
    g = empty_pose_graph(num_nodes=256, num_loop_edges=32)
    cur = jnp.asarray(gt[0])
    g = add_node(g, cur, 0)
    for k in range(1, 60):
        rel = np.linalg.inv(gt[k - 1]) @ gt[k] @ np.asarray(
            se3_exp(jnp.asarray(noise[k]))
        )
        cur = cur @ jnp.asarray(rel)
        g = add_node(g, cur, k)
    out, errs = pg_optimize(g, iters=5)
    assert np.isfinite(np.asarray(errs)).all()
    # An integrated chain with no loop edges is exactly self-consistent:
    # the optimizer must recognize the fixed point (float noise floor only).
    assert float(errs[-1]) < 1e-8
