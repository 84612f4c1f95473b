"""Keyframe DB + loop closure oracle tests: planted 3D scene, analytic
cameras — place recognition must retrieve the right view and geometric
verification must recover the planted relative pose (same oracle style as
tests/test_p3p.py in the reference: project GT 3D->2D, verify recovery)."""

import numpy as np

import jax
import jax.numpy as jnp

from vo_tpu.geom.lie import pose_inverse
from vo_tpu.models.keyframe_db import (
    KeyframeEntry,
    add_entry,
    cull_entry,
    empty_db,
    global_descriptor,
    make_entry,
    query_loop,
    verify_loop,
)

K_CAM = jnp.asarray([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]], jnp.float32)
H, W = 240, 320


def _textured_image(rng, h=H, w=W):
    """Smooth random texture so patches are discriminative."""
    img = rng.uniform(0, 255, (h // 8, w // 8)).astype(np.float32)
    img = np.asarray(
        jax.image.resize(jnp.asarray(img), (h, w), "cubic")
    )
    return np.clip(img, 0, 255)


def _pose(tx=0.0, tz=0.0, yaw=0.0):
    c, s = np.cos(yaw), np.sin(yaw)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    T[:3, 3] = [tx, 0.0, tz]
    return T


def _project(T_wc, pts):
    T_cw = np.asarray(pose_inverse(jnp.asarray(T_wc)))
    pc = pts @ T_cw[:3, :3].T + T_cw[:3, 3]
    uv = pc[:, :2] / pc[:, 2:3]
    return (uv @ np.asarray(K_CAM)[:2, :2].T + np.asarray(K_CAM)[:2, 2]), pc[:, 2]


def _entry_at(rng, img, pose, frame, npts=64):
    """Build an entry whose observations are GT projections of planted
    landmarks (in front of the camera), with patches from the image."""
    pts = np.stack(
        [rng.uniform(-6, 6, npts), rng.uniform(-3, 3, npts),
         rng.uniform(8, 25, npts)], -1
    ).astype(np.float32)
    # Put landmarks in the camera's frame -> world.
    Tw = np.asarray(pose)
    pts_w = pts @ Tw[:3, :3].T + Tw[:3, 3]
    uv, z = _project(pose, pts_w)
    inside = (uv[:, 0] > 10) & (uv[:, 0] < W - 10) & (uv[:, 1] > 10) & (uv[:, 1] < H - 10)
    xy = np.where(inside[:, None], uv, np.array([W / 2, H / 2]))
    return make_entry(
        jnp.asarray(img), jnp.asarray(xy.astype(np.float32)),
        jnp.asarray(pts_w), jnp.asarray(inside.astype(np.float32)),
        jnp.asarray(inside), jnp.asarray(pose), frame,
        obs_per_entry=64, patch_radius=4,
    )


def test_global_descriptor_discriminates():
    rng = np.random.default_rng(2023)
    a = _textured_image(rng)
    b = _textured_image(rng)
    ga, gb = global_descriptor(jnp.asarray(a)), global_descriptor(jnp.asarray(b))
    assert float(ga @ ga) > 0.999
    assert float(ga @ gb) < 0.5
    # Brightness/contrast invariance (Malaga's exposure variation).
    ga2 = global_descriptor(jnp.asarray(0.6 * a + 30.0))
    assert float(ga @ ga2) > 0.999


def test_query_retrieves_revisit_and_gates_recent():
    rng = np.random.default_rng(7)
    imgs = [_textured_image(rng) for _ in range(4)]
    db = empty_db(8, obs_per_entry=64)
    for i, im in enumerate(imgs):
        db = add_entry(db, _entry_at(rng, im, _pose(tz=3.0 * i), i * 10))
    # Revisit of view 1's appearance at a much later frame.
    revisit = _entry_at(rng, imgs[1], _pose(tz=3.0), 500)
    cand = query_loop(db, revisit, min_frame_gap=100)
    assert bool(cand.found)
    assert int(cand.idx) == 1
    # The same query with a huge gap requirement finds nothing.
    cand2 = query_loop(db, revisit, min_frame_gap=10_000)
    assert not bool(cand2.found)


def test_verify_loop_recovers_planted_relative_pose():
    rng = np.random.default_rng(11)
    img = _textured_image(rng)
    old_pose = _pose(tz=0.0)
    db = empty_db(4, obs_per_entry=64)
    old_entry = _entry_at(rng, img, old_pose, 0)
    db = add_entry(db, old_entry)

    # The new keyframe sees the SAME landmarks from a slightly moved pose;
    # its observations are GT projections under the new pose, its patches
    # come from the same texture (KLT-style small-baseline revisit).
    new_pose = _pose(tx=0.4, tz=1.0, yaw=0.05)
    lm = np.asarray(old_entry.obs_lm)
    uv, z = _project(new_pose, lm)
    inside = (
        (uv[:, 0] > 10) & (uv[:, 0] < W - 10)
        & (uv[:, 1] > 10) & (uv[:, 1] < H - 10)
        & np.asarray(old_entry.obs_valid) & (z > 0)
    )
    # Patches: sample the old image at the OLD projection of each landmark
    # (appearance matches the stored descriptors).
    old_uv = np.asarray(old_entry.obs_xy)
    from vo_tpu.ops.descriptors import extract_patches

    desc = extract_patches(jnp.asarray(img), jnp.asarray(old_uv), 4, normalize=True)
    new_entry = KeyframeEntry(
        pose=jnp.asarray(new_pose).reshape(16),  # estimate (unused by verify)
        frame=jnp.asarray(300, jnp.int32),
        gdesc=global_descriptor(jnp.asarray(img)),
        obs_xy=jnp.asarray(uv.astype(np.float32)),
        obs_lm=jnp.asarray(lm),
        obs_desc=jnp.where(jnp.asarray(inside)[:, None], desc, 0.0),
        obs_valid=jnp.asarray(inside),
    )
    out = verify_loop(
        jax.random.PRNGKey(0), db, jnp.int32(0), new_entry, K_CAM,
        min_inliers=15,
    )
    assert bool(out.ok), int(out.num_inliers)
    rel_gt = np.linalg.inv(old_pose) @ new_pose
    np.testing.assert_allclose(np.asarray(out.rel), rel_gt, atol=5e-2)


def test_verify_loop_rejects_wrong_place():
    """Descriptors from an unrelated scene must not verify."""
    rng = np.random.default_rng(13)
    db = empty_db(4, obs_per_entry=64)
    db = add_entry(db, _entry_at(rng, _textured_image(rng), _pose(), 0))
    other = _entry_at(rng, _textured_image(rng), _pose(tz=50.0), 400)
    out = verify_loop(jax.random.PRNGKey(0), db, jnp.int32(0), other, K_CAM)
    assert not bool(out.ok)


def test_cull_entry_compacts_like_pose_graph():
    rng = np.random.default_rng(3)
    img = _textured_image(rng)
    db = empty_db(6, obs_per_entry=64)
    for i in range(5):
        db = add_entry(db, _entry_at(rng, img, _pose(tz=float(i)), i))
    db2 = cull_entry(db, jnp.int32(2))
    assert int(db2.n_entries) == 4
    assert np.asarray(db2.frame)[:4].tolist() == [0, 1, 3, 4]
    assert not bool(db2.valid[4])
