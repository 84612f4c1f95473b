"""Fixed-capacity feature/landmark table — the TPU-native replacement for the
reference's dynamically-resized Features/Matches object model.

The reference stores per-keypoint arrays that grow and shrink every frame
(features.py:239-265 mask(), klt.py:128-189 appends, matches.py:39-212
in-place re-orderings). None of that survives contact with XLA's static
shapes. Instead: a table of `capacity` SLOTS. A slot carries one track
through its whole lifecycle; the lifecycle state machine is the reference's
(features.py:41-43) with one extra value for empty slots:

    -1 empty        (no track)
     0 unmatched    (fresh detection, not yet tracked to a second frame)
     1 matched      (tracked >= once; a triangulation CANDIDATE)
     2 triangulated (carries a world landmark)

Per-slot lanes mirror Features exactly: keypoint position, landmark,
track-start pixel + track-start camera pose (features.py:47-52), uid
(klt.py:69-81), detector score. All updates are masked `where`s; slot
identity IS track identity, so the reference's Matches bookkeeping
(carrying landmarks/tracks across frames, matches.py:113-212) happens for
free.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

STATE_EMPTY = -1
STATE_UNMATCHED = 0  # ref features.py:41 "unmatched"
STATE_MATCHED = 1  # ref features.py:42 "matched" (candidate)
STATE_TRIANGULATED = 2  # ref features.py:43 "triangulated"


class FeatureTable(NamedTuple):
    xy: jnp.ndarray  # (K, 2) f32 current keypoint position
    landmark: jnp.ndarray  # (K, 3) f32 world landmark (state==2 only)
    state: jnp.ndarray  # (K,) int32 lifecycle state
    track_xy: jnp.ndarray  # (K, 2) f32 track-start pixel (ref features.py:47)
    track_pose: jnp.ndarray  # (K, 16) f32 w_T_c at track start (ref :48-52)
    uid: jnp.ndarray  # (K,) int32 stable track identity
    score: jnp.ndarray  # (K,) f32 detector response at birth
    desc: jnp.ndarray  # (K, D) f32 descriptor of the last match (D=1: unused)
    sigma: jnp.ndarray  # (K,) f32 detection scale (SIFT); 0 = base scale
    # (K,) int32 consecutive frames this slot went unmatched. Opt-in miss
    # grace (cfg.<mode>.max_miss > 0) coasts a slot instead of freeing it
    # on its first missed re-detection; coasting slots keep identity but
    # are excluded from every geometric consumer (stale xy). Defaults are
    # 0 — measured (r5): coasting+rematch corrupts more tracks than it
    # saves on both harris and sift (lookalike rematches through the
    # widened gate). Always 0 in KLT mode.
    miss: jnp.ndarray

    # -- derived masks (ref features.py:89-97) ------------------------------
    @property
    def occupied(self) -> jnp.ndarray:
        return self.state >= STATE_UNMATCHED

    @property
    def matched_candidates(self) -> jnp.ndarray:
        """state == 1 (ref matched_candidate_inliers, features.py:89)."""
        return self.state == STATE_MATCHED

    @property
    def match_inliers(self) -> jnp.ndarray:
        """state >= 1 (ref match_inliers, features.py:93)."""
        return self.state >= STATE_MATCHED

    @property
    def triangulated(self) -> jnp.ndarray:
        """state >= 2 (ref triangulate_inliers, features.py:97)."""
        return self.state >= STATE_TRIANGULATED

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]

    def count(self, mask: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum(mask.astype(jnp.int32))


def empty_table(capacity: int, desc_dim: int = 1) -> FeatureTable:
    return FeatureTable(
        xy=jnp.zeros((capacity, 2), jnp.float32),
        landmark=jnp.zeros((capacity, 3), jnp.float32),
        state=jnp.full((capacity,), STATE_EMPTY, jnp.int32),
        track_xy=jnp.zeros((capacity, 2), jnp.float32),
        track_pose=jnp.tile(jnp.eye(4, dtype=jnp.float32).reshape(1, 16), (capacity, 1)),
        uid=jnp.zeros((capacity,), jnp.int32),
        score=jnp.zeros((capacity,), jnp.float32),
        desc=jnp.zeros((capacity, desc_dim), jnp.float32),
        sigma=jnp.zeros((capacity,), jnp.float32),
        miss=jnp.zeros((capacity,), jnp.int32),
    )


def restart_tracks(
    table: FeatureTable, mask: jnp.ndarray, pose_flat: jnp.ndarray
) -> FeatureTable:
    """Reset masked slots to fresh unmatched tracks starting at their current
    position/pose. Ref parity: State.reset_outliers (state.py:162-172) —
    state -> 0, track restarts at the current keypoint with the current
    camera pose."""
    m = mask[:, None]
    return table._replace(
        state=jnp.where(mask, STATE_UNMATCHED, table.state),
        track_xy=jnp.where(m, table.xy, table.track_xy),
        track_pose=jnp.where(m, pose_flat[None, :], table.track_pose),
    )


def fill_free_slots(
    table: FeatureTable,
    det_xy: jnp.ndarray,  # (C, 2) candidate detections (strongest first)
    det_score: jnp.ndarray,  # (C,)
    det_ok: jnp.ndarray,  # (C,) bool eligible (valid + far from live tracks)
    pose_flat: jnp.ndarray,  # (16,) current w_T_c
    next_uid: jnp.ndarray,  # () int32
    det_desc: jnp.ndarray | None = None,  # (C, D) descriptors at detection
    det_sigma: jnp.ndarray | None = None,  # (C,) detection scales
) -> tuple[FeatureTable, jnp.ndarray]:
    """Scatter eligible detections into empty slots (rank-matching trick:
    r-th eligible detection -> r-th free slot). Replaces the reference's
    array-append re-detection path (klt.py:117-189) with a static-shape
    scatter. Returns (table, new next_uid)."""
    k = table.capacity
    free = table.state == STATE_EMPTY
    # Position of each free slot among free slots; stable order by index.
    free_order = jnp.argsort(jnp.where(free, 0, 1), stable=True)  # free first
    n_free = free.sum()
    det_rank = jnp.cumsum(det_ok.astype(jnp.int32)) - 1  # rank per detection
    use = det_ok & (det_rank < n_free)
    target = free_order[jnp.clip(det_rank, 0, k - 1)]  # slot per detection
    # Scatter: detections have unique targets (ranks are unique among used).
    safe_target = jnp.where(use, target, k)  # k = dropped (out of bounds)
    new_uid = next_uid + det_rank

    xy = table.xy.at[safe_target].set(det_xy, mode="drop")
    score = table.score.at[safe_target].set(det_score, mode="drop")
    state = table.state.at[safe_target].set(STATE_UNMATCHED, mode="drop")
    track_xy = table.track_xy.at[safe_target].set(det_xy, mode="drop")
    track_pose = table.track_pose.at[safe_target].set(
        jnp.broadcast_to(pose_flat, det_xy.shape[:1] + (16,)), mode="drop"
    )
    uid = table.uid.at[safe_target].set(new_uid, mode="drop")
    desc = table.desc
    if det_desc is not None:
        desc = desc.at[safe_target].set(det_desc, mode="drop")
    sigma = table.sigma.at[safe_target].set(
        det_sigma if det_sigma is not None else jnp.zeros_like(det_score),
        mode="drop",
    )
    miss = table.miss.at[safe_target].set(0, mode="drop")
    n_added = use.sum()
    return (
        table._replace(
            xy=xy, score=score, state=state, track_xy=track_xy,
            track_pose=track_pose, uid=uid, desc=desc, sigma=sigma,
            miss=miss,
        ),
        next_uid + n_added,
    )


def debug_validate(table: FeatureTable) -> list[str]:
    """Host-side invariant checks — the reference enforces its state machine
    with dense runtime asserts (features.py:136-222 congruence asserts,
    matches.py:82-104 / state.py:76-88 NaN and already-triangulated guards;
    SURVEY §5 calls these asserts "the spec"). In the TPU build the jitted
    step cannot assert, so the same spec lives here as an explicit validator
    for tests and debug-mode drivers. Returns a list of violation messages
    (empty = valid).
    """
    import numpy as np

    xy = np.asarray(table.xy)
    lm = np.asarray(table.landmark)
    st = np.asarray(table.state)
    txy = np.asarray(table.track_xy)
    tp = np.asarray(table.track_pose)
    uid = np.asarray(table.uid)
    k = st.shape[0]
    errs: list[str] = []

    def chk(cond, msg):
        if not cond:
            errs.append(msg)

    # Congruence (features.py:136-222): every lane has one row per slot.
    chk(xy.shape == (k, 2), f"xy shape {xy.shape} != ({k}, 2)")
    chk(lm.shape == (k, 3), f"landmark shape {lm.shape} != ({k}, 3)")
    chk(txy.shape == (k, 2), f"track_xy shape {txy.shape} != ({k}, 2)")
    chk(tp.shape == (k, 16), f"track_pose shape {tp.shape} != ({k}, 16)")
    # State domain (features.py:41-43 + empty).
    chk(bool(np.isin(st, [-1, 0, 1, 2]).all()), "state outside {-1,0,1,2}")
    ms = np.asarray(table.miss)
    chk(ms.shape == (k,), f"miss shape {ms.shape} != ({k},)")
    chk(bool((ms >= 0).all()), "negative miss counter")
    live = st >= 0
    # NaN guards (matches.py:82-104): live slots carry finite geometry.
    chk(bool(np.isfinite(xy[live]).all()), "non-finite keypoint on live slot")
    chk(bool(np.isfinite(txy[live]).all()), "non-finite track_xy on live slot")
    chk(bool(np.isfinite(tp[live]).all()), "non-finite track_pose on live slot")
    # Triangulated slots carry a finite landmark (state.py:76-88).
    tri = st == 2
    chk(bool(np.isfinite(lm[tri]).all()), "non-finite landmark on state==2")
    # Track-start poses are rigid transforms (bottom row 0 0 0 1).
    if live.any():
        bottom = tp[live].reshape(-1, 4, 4)[:, 3, :]
        chk(
            bool(np.allclose(bottom, [0.0, 0.0, 0.0, 1.0], atol=1e-5)),
            "track_pose bottom row != [0,0,0,1]",
        )
    # uid uniqueness over live slots (klt.py:69-81: uids identify tracks).
    chk(len(np.unique(uid[live])) == int(live.sum()), "duplicate uid on live slots")
    return errs
