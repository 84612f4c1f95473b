"""Sliding-window bundle adjustment: batched Schur-complement Gauss-Newton.

The reference names windowed BA as its top future-work item (Report §3.1.1:
"bundle adjustment ... would likely reduce the scale drift"); nothing like it
exists in the reference code, so this module is designed TPU-first from
scratch:

  * fixed-size window of W keyframes and L landmark slots (L = the feature
    table capacity, slot identity = landmark identity via uid);
  * all (L, W) reprojection residuals and analytic Jacobians in one vmapped
    sweep (2x6 pose blocks, 2x3 point blocks), masked where unobserved;
  * normal equations assembled with einsums (MXU); the landmark blocks are
    eliminated with batched closed-form 3x3 inverses and the reduced camera
    system (6W x 6W, tiny) is solved densely — the classic Schur trick,
    expressed as dense batched algebra instead of sparse scatter;
  * fixed iteration count, Levenberg damping, gauge frozen at the first
    keyframe: jit-compatible, no data-dependent control flow.

Pose convention: window poses are w_T_c (camera-to-world, like VOState);
optimization increments are left-multiplied se(3) twists on c_T_w.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vo_tpu.geom.lie import pose_inverse, se3_exp
from vo_tpu.ops.linalg import spd_solve_blocked

# Gauge fixing: diagonal added to the first keyframe's camera block.
_GAUGE = 1e8


class BAWindow(NamedTuple):
    """Fixed-capacity keyframe window. L rows are 1:1 with feature-table
    slots; `uid` invalidates stale observations when a slot is recycled."""

    kf_pose: jnp.ndarray  # (W, 16) w_T_c per keyframe
    kf_valid: jnp.ndarray  # (W,) bool
    obs_uv: jnp.ndarray  # (L, W, 2) pixel observations
    obs_mask: jnp.ndarray  # (L, W) bool
    landmark: jnp.ndarray  # (L, 3) world points (current estimate)
    lm_uid: jnp.ndarray  # (L,) int32 slot uid the row belongs to
    lm_valid: jnp.ndarray  # (L,) bool

    @property
    def window_size(self) -> int:
        return self.kf_pose.shape[0]


def empty_window(num_keyframes: int, capacity: int) -> BAWindow:
    eye = jnp.eye(4, dtype=jnp.float32).reshape(1, 16)
    return BAWindow(
        kf_pose=jnp.tile(eye, (num_keyframes, 1)),
        kf_valid=jnp.zeros((num_keyframes,), bool),
        obs_uv=jnp.zeros((capacity, num_keyframes, 2), jnp.float32),
        obs_mask=jnp.zeros((capacity, num_keyframes), bool),
        landmark=jnp.zeros((capacity, 3), jnp.float32),
        lm_uid=jnp.full((capacity,), -1, jnp.int32),
        lm_valid=jnp.zeros((capacity,), bool),
    )


def push_keyframe(
    window: BAWindow,
    pose: jnp.ndarray,  # (4, 4) w_T_c of the new keyframe
    slot_xy: jnp.ndarray,  # (L, 2) current keypoint per table slot
    slot_landmark: jnp.ndarray,  # (L, 3)
    slot_uid: jnp.ndarray,  # (L,) int32
    slot_triangulated: jnp.ndarray,  # (L,) bool
) -> BAWindow:
    """Shift the window left and append the current frame as newest keyframe.

    Observations of slots whose uid changed since the window row was bound
    are dropped (the slot was recycled to a new track)."""
    same = window.lm_uid == slot_uid
    obs_uv = jnp.where(same[:, None, None], window.obs_uv, 0.0)
    obs_mask = window.obs_mask & same[:, None]

    # Shift left (oldest keyframe falls out).
    kf_pose = jnp.concatenate([window.kf_pose[1:], pose.reshape(1, 16)])
    kf_valid = jnp.concatenate([window.kf_valid[1:], jnp.ones((1,), bool)])
    obs_uv = jnp.concatenate(
        [obs_uv[:, 1:], jnp.where(slot_triangulated[:, None], slot_xy, 0.0)[:, None]],
        axis=1,
    )
    obs_mask = jnp.concatenate(
        [obs_mask[:, 1:], slot_triangulated[:, None]], axis=1
    )
    return BAWindow(
        kf_pose=kf_pose,
        kf_valid=kf_valid,
        obs_uv=obs_uv,
        obs_mask=obs_mask,
        landmark=jnp.where(slot_triangulated[:, None], slot_landmark, window.landmark),
        lm_uid=slot_uid,
        lm_valid=slot_triangulated & (obs_mask.sum(axis=1) >= 2),
    )


def _residuals_jacobians(kf_pose_flat, landmark, obs_uv, K):
    """Per-(L, W) residuals + Jacobians.

    Returns r (L, W, 2), Jc (L, W, 2, 6), Jx (L, W, 2, 3), depth_ok (L, W).
    Twist convention: increment delta applied as c_T_w <- exp(delta) c_T_w,
    so d x_c / d delta = [I | -[x_c]x]."""
    T_cw = pose_inverse(kf_pose_flat.reshape(-1, 4, 4))  # (W, 4, 4)
    R = T_cw[:, :3, :3]
    t = T_cw[:, :3, 3]
    # x_c[l, w] = R_w X_l + t_w
    xc = jnp.einsum("wij,lj->lwi", R, landmark) + t[None]
    x, y, z = xc[..., 0], xc[..., 1], xc[..., 2]
    depth_ok = z > 1e-3
    zs = jnp.where(depth_ok, z, 1.0)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    u = fx * x / zs + cx
    v = fy * y / zs + cy
    r = jnp.stack([u, v], axis=-1) - obs_uv  # (L, W, 2)

    iz = 1.0 / zs
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    # J_pi (L, W, 2, 3): d(u,v)/d x_c
    Jpi = jnp.stack(
        [
            jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1),
            jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1),
        ],
        axis=-2,
    )
    # d x_c / d delta = [ I  -[x_c]x ]  (2x6 after J_pi)
    hat = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )  # (L, W, 3, 3) = [x_c]x
    Jc = jnp.concatenate([Jpi, -Jpi @ hat], axis=-1)  # (L, W, 2, 6)
    Jx = jnp.einsum("lwij,wjk->lwik", Jpi, R)  # (L, W, 2, 3)
    return r, Jc, Jx, depth_ok


def _inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    adj = jnp.stack(
        [
            jnp.stack([A, B, C], axis=-1),
            jnp.stack([D, E, F], axis=-1),
            jnp.stack([G, H, I], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def _gn_step(window: BAWindow, K: jnp.ndarray, damping: float, huber_px: float,
             reduce_fn=None):
    """One damped Schur-complement GN step. Returns (new kf_pose, new
    landmark, mean masked reprojection error before the step).

    `reduce_fn` sums landmark-partitioned contributions across shards (e.g.
    `lambda x: jax.lax.psum(x, "model")` under shard_map) — the distributed
    Schur trick: camera-side normal equations ride the collective, landmark
    elimination stays shard-local."""
    if reduce_fn is None:
        reduce_fn = lambda x: x
    W = window.window_size
    r, Jc, Jx, depth_ok = _residuals_jacobians(
        window.kf_pose, window.landmark, window.obs_uv, K
    )
    mask = (
        window.obs_mask
        & depth_ok
        & window.lm_valid[:, None]
        & window.kf_valid[None, :]
    )
    # Huber IRLS weight per observation.
    rn = jnp.linalg.norm(r, axis=-1)
    wgt = jnp.where(rn > huber_px, huber_px / jnp.maximum(rn, 1e-9), 1.0)
    m = (mask * wgt)[..., None, None]
    err = reduce_fn(jnp.sum(jnp.where(mask, rn, 0.0))) / jnp.maximum(
        reduce_fn(mask.sum()), 1
    )

    Jc_m = Jc * m
    # Camera blocks U (W, 6, 6); gradient bc (W, 6)
    U = reduce_fn(jnp.einsum("lwia,lwib->wab", Jc_m, Jc))
    bc = reduce_fn(jnp.einsum("lwia,lwi->wa", Jc_m, r))
    # Landmark blocks V (L, 3, 3); gradient bx (L, 3)
    Jx_m = Jx * m
    V = jnp.einsum("lwia,lwib->lab", Jx_m, Jx)
    bx = jnp.einsum("lwia,lwi->la", Jx_m, r)
    # Cross blocks W_cross (L, W, 6, 3)
    Wc = jnp.einsum("lwia,lwib->lwab", Jc_m, Jx)

    lam = damping
    V = V + lam * jnp.eye(3)[None]
    Vinv = _inv3(V) * window.lm_valid[:, None, None]

    # Schur complement S = U - sum_l Wc V^-1 Wc^T  (full 6W x 6W).
    WVi = jnp.einsum("lwab,lbc->lwac", Wc, Vinv)  # (L, W, 6, 3)
    S_off = reduce_fn(jnp.einsum("lwac,lvbc->wvab", WVi, Wc))  # (W, W, 6, 6)
    S = -S_off
    S = S.at[jnp.arange(W), jnp.arange(W)].add(U + lam * jnp.eye(6)[None])
    b_red = bc - reduce_fn(jnp.einsum("lwac,lc->wa", WVi, bx))

    # Gauge: freeze the first (oldest valid) keyframe.
    first = jnp.argmax(window.kf_valid)
    S = S.at[first, first].add(_GAUGE * jnp.eye(6))
    # Dead keyframes: identity blocks so the dense solve stays well-posed.
    dead = ~window.kf_valid
    S = S.at[jnp.arange(W), jnp.arange(W)].add(
        dead[:, None, None] * _GAUGE * jnp.eye(6)[None]
    )

    # Unrolled block-Cholesky (ops/linalg.py): the reduced camera system is
    # SPD by construction (J^T J + damping + gauge), so the LU pivot loop
    # XLA lowers jnp.linalg.solve to (~0.3 ms at 36x36 on v5e) buys nothing.
    delta_c = spd_solve_blocked(S, -b_red)
    # A degenerate window (floored Cholesky pivot) must yield a no-op step,
    # not NaN poses — same guard refine_pose_gn applies (ops/pnp.py).
    solve_ok = jnp.isfinite(delta_c).all()
    delta_c = jnp.where(solve_ok, delta_c, 0.0)
    # Back-substitute landmarks: V dx = -bx - Wc^T dc
    rhs = -bx - jnp.einsum("lwab,wa->lb", Wc, delta_c)
    delta_x = jnp.einsum("lab,lb->la", Vinv, rhs)
    delta_x = jnp.where(
        solve_ok & jnp.isfinite(delta_x).all(axis=-1, keepdims=True),
        delta_x, 0.0,
    )

    # Apply: c_T_w <- exp(delta) c_T_w; landmarks += delta_x (valid only).
    delta_c = jnp.where(window.kf_valid[:, None], delta_c, 0.0)
    T_cw = pose_inverse(window.kf_pose.reshape(-1, 4, 4))
    T_cw_new = jax.vmap(lambda d, T: se3_exp(d) @ T)(delta_c, T_cw)
    kf_pose = pose_inverse(T_cw_new).reshape(W, 16)
    landmark = window.landmark + jnp.where(window.lm_valid[:, None], delta_x, 0.0)
    return kf_pose, landmark, err


def _mean_reproj_err(window: BAWindow, K: jnp.ndarray, reduce_fn=None):
    """Masked mean reprojection error of the window (no Jacobians)."""
    if reduce_fn is None:
        reduce_fn = lambda x: x
    r, _, _, depth_ok = _residuals_jacobians(
        window.kf_pose, window.landmark, window.obs_uv, K
    )
    mask = (
        window.obs_mask
        & depth_ok
        & window.lm_valid[:, None]
        & window.kf_valid[None, :]
    )
    rn = jnp.linalg.norm(r, axis=-1)
    return reduce_fn(jnp.sum(jnp.where(mask, rn, 0.0))) / jnp.maximum(
        reduce_fn(mask.sum()), 1
    )


def _two_oldest_valid(kf_valid: jnp.ndarray):
    idx = jnp.arange(kf_valid.shape[0])
    first = jnp.argmax(kf_valid)
    second = jnp.argmax(kf_valid & (idx > first))
    has2 = (kf_valid.sum() >= 2) & (second > first)
    return first, second, has2


@partial(jax.jit, static_argnames=("iters", "reduce_fn", "fix_scale"))
def ba_refine(
    window: BAWindow,
    K: jnp.ndarray,
    iters: int = 5,
    damping: float = 1e-3,
    huber_px: float = 2.0,
    reduce_fn=None,
    fix_scale: bool = True,
) -> tuple[BAWindow, jnp.ndarray]:
    """Run `iters` damped GN steps. Returns (refined window, (iters,) mean
    reprojection error trace — err[i] is BEFORE step i).

    Monocular gauge: freezing one keyframe pose fixes 6 DoF but NOT the 7th
    (scale) — left free, windowed BA lets the map scale wander and writes
    that wander back into the live landmarks every refinement. With
    `fix_scale` the window is similarity-renormalized after the GN steps so
    the baseline between the two oldest keyframes is exactly preserved
    (rescale of all camera centers + landmarks about the gauge keyframe).

    Safety: the refined window is accepted only if its masked mean
    reprojection error did not increase — a diverged GN (ill-conditioned
    turn windows) must never corrupt the live map.
    """
    err0 = _mean_reproj_err(window, K, reduce_fn)
    centers0 = window.kf_pose.reshape(-1, 4, 4)[:, :3, 3]
    i0, i1, has2 = _two_oldest_valid(window.kf_valid)
    d_before = jnp.linalg.norm(centers0[i1] - centers0[i0])

    def body(win, _):
        kf_pose, landmark, err = _gn_step(win, K, damping, huber_px, reduce_fn)
        return win._replace(kf_pose=kf_pose, landmark=landmark), err

    refined, errs = jax.lax.scan(body, window, None, length=iters)

    if fix_scale:
        poses = refined.kf_pose.reshape(-1, 4, 4)
        centers = poses[:, :3, 3]
        anchor = centers[i0]
        d_after = jnp.linalg.norm(centers[i1] - anchor)
        s = jnp.where(has2 & (d_after > 1e-9), d_before / d_after, 1.0)
        new_centers = anchor + s * (centers - anchor)
        poses = poses.at[:, :3, 3].set(new_centers)
        landmark = anchor + s * (refined.landmark - anchor)
        refined = refined._replace(
            kf_pose=poses.reshape(-1, 16), landmark=landmark
        )

    err1 = _mean_reproj_err(refined, K, reduce_fn)
    # The reprojection error alone cannot veto a non-finite keyframe: its
    # NaN depth fails depth_ok, masking that keyframe's residuals OUT of
    # err1 (observed: SIFT-mode NaN poses shipped through an "accepting"
    # gate every keyframe frame). Require explicit finiteness of the poses
    # and of every landmark the window still considers valid.
    # The landmark rows may be SHARDED under shard_map (dist_ba): fold the
    # per-shard finite check through reduce_fn so the accept predicate stays
    # replication-invariant — a raw .all() over a varying array would make
    # kf_pose's out_spec P() uninferable (jax 0.9 VMA check).
    rsum = reduce_fn if reduce_fn is not None else (lambda x: x)
    bad = rsum(
        (~jnp.isfinite(refined.kf_pose)).sum()
        + (refined.lm_valid[:, None] & ~jnp.isfinite(refined.landmark)).sum()
    )
    finite_ok = bad == 0
    accept = jnp.isfinite(err1) & (err1 <= err0 * 1.02) & finite_ok
    out = jax.tree_util.tree_map(
        lambda a, b: jnp.where(accept, a, b), refined, window
    )
    return out, errs
