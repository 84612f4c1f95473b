"""Long-term keyframe database + appearance loop closure.

The reference forgets everything older than two frames (state.py:9-13); once
a landmark leaves the 6-keyframe BA window here, it used to be gone too
(VERDICT r2 gap #1). This module is the long-term memory behind the pose
graph (models/pose_graph.py):

  * fixed-capacity entry store, 1:1 with pose-graph node ids (append order;
    culling compacts both stores with the same permutation);
  * per entry: pose, frame id, a **global appearance descriptor** (normalized
    mean-pooled thumbnail — one jax.image.resize, retrieval is a single
    cosine-similarity matmul on the MXU), and M local observations
    (pixel, world landmark, normalized intensity patch) for geometric
    verification;
  * **loop detection** = gdesc matmul + frame-gap gate; **verification** =
    mutual-ratio descriptor matching (ops/descriptors.py, MXU) + P3P RANSAC
    of the OLD entry's landmarks against the CURRENT keyframe's pixels
    (ops/pnp.py) — the resulting pose is metrically consistent with the old
    map region, so the loop edge closes scale drift accumulated in between
    up to the SE(3) approximation (see pose_graph.py docstring).

Everything is jit-compatible (fixed capacities, masked appends); the driver
invokes these once per pose-graph keyframe, not per frame.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vo_tpu.geom.lie import pose_inverse
from vo_tpu.geom.points import to_homogeneous as to_h
from vo_tpu.ops.descriptors import extract_patches, match_descriptors
from vo_tpu.ops.pnp import pnp_ransac


class KeyframeEntry(NamedTuple):
    pose: jnp.ndarray  # (16,) w_T_c
    frame: jnp.ndarray  # () int32
    gdesc: jnp.ndarray  # (G,) normalized global descriptor
    obs_xy: jnp.ndarray  # (M, 2)
    obs_lm: jnp.ndarray  # (M, 3) world landmarks at entry time
    obs_desc: jnp.ndarray  # (M, D) normalized intensity patches
    obs_valid: jnp.ndarray  # (M,) bool


class KeyframeDB(NamedTuple):
    pose: jnp.ndarray  # (N, 16)
    frame: jnp.ndarray  # (N,) int32
    valid: jnp.ndarray  # (N,) bool
    gdesc: jnp.ndarray  # (N, G)
    obs_xy: jnp.ndarray  # (N, M, 2)
    obs_lm: jnp.ndarray  # (N, M, 3)
    obs_desc: jnp.ndarray  # (N, M, D)
    obs_valid: jnp.ndarray  # (N, M)

    @property
    def capacity(self) -> int:
        return self.pose.shape[0]

    @property
    def n_entries(self) -> jnp.ndarray:
        return self.valid.sum()


def empty_db(
    num_entries: int,
    obs_per_entry: int = 256,
    patch_radius: int = 4,
    grid: int = 16,
) -> KeyframeDB:
    d = (2 * patch_radius + 1) ** 2
    eye = jnp.eye(4, dtype=jnp.float32).reshape(1, 16)
    return KeyframeDB(
        pose=jnp.tile(eye, (num_entries, 1)),
        frame=jnp.full((num_entries,), -1, jnp.int32),
        valid=jnp.zeros((num_entries,), bool),
        gdesc=jnp.zeros((num_entries, grid * grid), jnp.float32),
        obs_xy=jnp.zeros((num_entries, obs_per_entry, 2), jnp.float32),
        obs_lm=jnp.zeros((num_entries, obs_per_entry, 3), jnp.float32),
        obs_desc=jnp.zeros((num_entries, obs_per_entry, d), jnp.float32),
        obs_valid=jnp.zeros((num_entries, obs_per_entry), bool),
    )


def global_descriptor(image: jnp.ndarray, grid: int = 16) -> jnp.ndarray:
    """Mean-pooled thumbnail, zero-mean / unit-norm: cheap, rotation-variant
    (fine for forward-facing VO), illumination-bias-free via the mean/std
    normalization."""
    thumb = jax.image.resize(image.astype(jnp.float32), (grid, grid), "linear")
    v = thumb.reshape(-1)
    v = v - v.mean()
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-6)


def make_entry(
    image: jnp.ndarray,  # (H, W) current frame (u8 or f32)
    xy: jnp.ndarray,  # (K, 2) table keypoints
    landmark: jnp.ndarray,  # (K, 3) table landmarks
    score: jnp.ndarray,  # (K,) detector responses
    triangulated: jnp.ndarray,  # (K,) bool
    pose: jnp.ndarray,  # (4, 4) w_T_c
    frame: jnp.ndarray,  # () int32
    obs_per_entry: int = 256,
    patch_radius: int = 4,
    grid: int = 16,
) -> KeyframeEntry:
    """Snapshot the current frame's triangulated map slots as a DB entry.

    Top `obs_per_entry` slots by detector score; intensity patches are
    re-extracted from the image at the CURRENT keypoint position (in KLT
    mode the table's descriptor lane is unused — ref parity note in
    feature_table.py)."""
    img = image.astype(jnp.float32)
    masked = jnp.where(triangulated, score, -jnp.inf)
    _, top = jax.lax.top_k(masked, obs_per_entry)
    sel_valid = triangulated[top]
    sel_xy = xy[top]
    desc = extract_patches(img, sel_xy, radius=patch_radius, normalize=True)
    return KeyframeEntry(
        pose=pose.reshape(16),
        frame=jnp.asarray(frame, jnp.int32),
        gdesc=global_descriptor(img, grid),
        obs_xy=sel_xy,
        obs_lm=landmark[top],
        obs_desc=jnp.where(sel_valid[:, None], desc, 0.0),
        obs_valid=sel_valid,
    )


def add_entry(db: KeyframeDB, entry: KeyframeEntry) -> KeyframeDB:
    """Masked append (no-op when full — cull first, mirroring the graph)."""
    k = db.n_entries
    ok = k < db.capacity
    idx = jnp.where(ok, k, 0)

    def wr(arr, row):
        return arr.at[idx].set(jnp.where(ok, row, arr[idx]))

    return KeyframeDB(
        pose=wr(db.pose, entry.pose),
        frame=wr(db.frame, entry.frame),
        valid=wr(db.valid, ok),
        gdesc=wr(db.gdesc, entry.gdesc),
        obs_xy=wr(db.obs_xy, entry.obs_xy),
        obs_lm=wr(db.obs_lm, entry.obs_lm),
        obs_desc=wr(db.obs_desc, entry.obs_desc),
        obs_valid=wr(db.obs_valid, entry.obs_valid),
    )


def cull_entry(db: KeyframeDB, victim: jnp.ndarray) -> KeyframeDB:
    """Compact out row `victim` — the same gather permutation as
    pose_graph.cull_node, so DB rows stay 1:1 with graph node ids."""
    v = jnp.asarray(victim, jnp.int32)
    ok = (v >= 0) & (v < db.n_entries) & db.valid[v]
    idx = jnp.arange(db.capacity)
    src = jnp.where(idx < v, idx, jnp.minimum(idx + 1, db.capacity - 1))
    last = db.n_entries - 1

    def compact(arr, fill):
        out = jnp.where(ok, arr[src], arr)  # scalar ok broadcasts
        return out.at[last].set(jnp.where(ok, fill, out[last]))

    eye16 = jnp.eye(4, dtype=jnp.float32).reshape(16)
    return KeyframeDB(
        pose=compact(db.pose, eye16),
        frame=compact(db.frame, jnp.asarray(-1, jnp.int32)),
        valid=compact(db.valid, jnp.asarray(False)),
        gdesc=compact(db.gdesc, jnp.zeros_like(db.gdesc[0])),
        obs_xy=compact(db.obs_xy, jnp.zeros_like(db.obs_xy[0])),
        obs_lm=compact(db.obs_lm, jnp.zeros_like(db.obs_lm[0])),
        obs_desc=compact(db.obs_desc, jnp.zeros_like(db.obs_desc[0])),
        obs_valid=compact(db.obs_valid, jnp.zeros_like(db.obs_valid[0])),
    )


class LoopCandidate(NamedTuple):
    idx: jnp.ndarray  # () int32 DB row of the best candidate
    similarity: jnp.ndarray  # () cosine similarity
    found: jnp.ndarray  # () bool


def query_loop(
    db: KeyframeDB,
    entry: KeyframeEntry,
    min_frame_gap: int = 100,
    min_similarity: float = 0.85,
) -> LoopCandidate:
    """Place recognition: best stored view by global-descriptor cosine
    similarity, excluding temporally-near keyframes (those match trivially
    and carry no new constraint)."""
    sim = db.gdesc @ entry.gdesc  # (N,)
    eligible = db.valid & (db.frame <= entry.frame - min_frame_gap)
    sim = jnp.where(eligible, sim, -jnp.inf)
    idx = jnp.argmax(sim)
    best = sim[idx]
    return LoopCandidate(
        idx=idx.astype(jnp.int32),
        similarity=best,
        found=best >= min_similarity,
    )


class LoopCandidates(NamedTuple):
    idx: jnp.ndarray  # (k,) int32 DB rows, best first
    similarity: jnp.ndarray  # (k,)
    found: jnp.ndarray  # (k,) bool


def query_loop_topk(
    db: KeyframeDB,
    entry: KeyframeEntry,
    k: int = 4,
    min_frame_gap: int = 100,
    min_similarity: float = 0.85,
) -> LoopCandidates:
    """Top-k place recognition: the k best stored views by global-descriptor
    cosine similarity. Geometric verification (not retrieval) separates true
    revisits from self-similar streetscape, so verifying several candidates
    per keyframe in one batched launch both raises recall (the best-cosine
    candidate can fail geometry while #2 passes) and keeps the device hot
    (VERDICT r3 task #7 "batch loop verification over candidates")."""
    sim = db.gdesc @ entry.gdesc  # (N,)
    eligible = db.valid & (db.frame <= entry.frame - min_frame_gap)
    sim = jnp.where(eligible, sim, -jnp.inf)
    top_sim, top_idx = jax.lax.top_k(sim, k)
    return LoopCandidates(
        idx=top_idx.astype(jnp.int32),
        similarity=top_sim,
        found=top_sim >= min_similarity,
    )


class LoopConstraint(NamedTuple):
    rel: jnp.ndarray  # (4, 4) measured old_S_new (SIMILARITY: scale = det^1/3)
    num_inliers: jnp.ndarray  # () int32
    ok: jnp.ndarray  # () bool


def _umeyama_sim(X: jnp.ndarray, Y: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted Umeyama: the similarity (4, 4) mapping X -> Y
    (y ~ s R x + t), closed form via SVD of the weighted cross-covariance.
    Degenerate weights (sum ~ 0) return identity."""
    wsum = jnp.maximum(w.sum(), 1e-9)
    wn = w / wsum
    mx = (wn[:, None] * X).sum(0)
    my = (wn[:, None] * Y).sum(0)
    Xc = X - mx
    Yc = Y - my
    C = (wn[:, None] * Yc).T @ Xc  # (3, 3)
    U, D, Vt = jnp.linalg.svd(C)
    sgn = jnp.sign(jnp.linalg.det(U @ Vt))
    S = jnp.diag(jnp.asarray([1.0, 1.0, 1.0]) * jnp.asarray([1.0, 1.0, sgn]))
    R = U @ S @ Vt
    var_x = (wn * (Xc * Xc).sum(-1)).sum()
    s = (D * jnp.diagonal(S)).sum() / jnp.maximum(var_x, 1e-12)
    t = my - s * (R @ mx)
    out = jnp.eye(4, dtype=X.dtype)
    out = out.at[:3, :3].set(s * R)
    out = out.at[:3, 3].set(t)
    degenerate = (w.sum() < 3.0) | ~jnp.isfinite(s) | (s < 1e-3)
    return jnp.where(degenerate, jnp.eye(4, dtype=X.dtype), out)


def verify_loop(
    key: jax.Array,
    db: KeyframeDB,
    cand_idx: jnp.ndarray,
    entry: KeyframeEntry,
    K: jnp.ndarray,
    ratio: float = 0.8,
    inlier_threshold_px: float = 2.0,
    min_inliers: int = 25,
    num_hypotheses: int = 256,
    search_radius_px: float = 120.0,
) -> LoopConstraint:
    """Geometric verification of a loop candidate.

    Matches the current entry's patches against the candidate's (mutual +
    Lowe ratio, one MXU matmul — ops/descriptors.py), then P3P-RANSACs the
    candidate's stored WORLD landmarks against the current PIXELS: the
    recovered T_cw lives in the old map's metric frame, so
    rel = old_pose^-1 · T_cw^-1 measures the new keyframe in the old
    keyframe's frame, closing any drift accumulated in between.

    `search_radius_px` gates matches to a pixel window between the two
    views: a retrieved candidate only verifies when the revisit shares the
    viewpoint (same lane/heading), in which case corresponding points land
    near each other — without the gate, repetitive facade texture floods
    the mutual-ratio test and true matches die (measured on the LOOP_SPEC
    circuit: 3-6 inliers without, >>min_inliers with). Heading-reversed
    loop closure is out of scope (documented limitation)."""
    d2 = jnp.sum(
        (entry.obs_xy[:, None, :] - db.obs_xy[cand_idx][None, :, :]) ** 2,
        axis=-1,
    )
    near = d2 <= search_radius_px * search_radius_px
    m = match_descriptors(
        entry.obs_desc,
        db.obs_desc[cand_idx],
        valid1=entry.obs_valid,
        valid2=db.obs_valid[cand_idx],
        ratio=ratio,
        pair_valid=near,
    )
    pair_ok = m.valid
    X = db.obs_lm[cand_idx][jnp.clip(m.idx, 0, None)]
    res = pnp_ransac(
        key,
        X,
        entry.obs_xy,
        K,
        valid=pair_ok,
        inlier_threshold_px=inlier_threshold_px,
        num_hypotheses=num_hypotheses,
    )
    # Sim(3) edge from the inlier 3D-3D pairs, both point sets expressed in
    # their own keyframe's CAMERA frame (each self-consistent in its local
    # map scale): Z maps new-cam points -> old-cam points, so its scale is
    # the relative map scale s_old/s_new — the quantity SE(3) closure cannot
    # express and monocular drift accumulates in (Strasdat RSS'10).
    old = db.pose[cand_idx].reshape(4, 4)
    new = entry.pose.reshape(4, 4)
    X_old_cam = (pose_inverse(old)[None] @ to_h(X)[..., None])[..., :3, 0]
    X_new_cam = (pose_inverse(new)[None] @ to_h(entry.obs_lm)[..., None])[..., :3, 0]
    w_in = (pair_ok & res.inliers).astype(X.dtype)
    rel = _umeyama_sim(X_new_cam, X_old_cam, w_in)
    ok = (
        (res.num_inliers >= min_inliers)
        & jnp.isfinite(rel).all()
        & (pair_ok.sum() >= min_inliers)
    )
    return LoopConstraint(rel=rel, num_inliers=res.num_inliers, ok=ok)
