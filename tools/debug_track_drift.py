#!/usr/bin/env python
"""Isolate the turn-time triangulation failure: triangulate the SAME pixel
tracks with exact GT poses at both ends. If residuals stay ~10 px, the
tracks themselves (KLT drift) are the problem; if they drop to noise, the
estimated poses are."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vo_tpu.data import Sequence  # noqa: E402
from vo_tpu.models.feature_table import STATE_MATCHED  # noqa: E402
from vo_tpu.models.pipeline import _proj_matrix, bootstrap, vo_step  # noqa: E402
from vo_tpu.ops.triangulate import reprojection_error, triangulate_dlt  # noqa: E402
from vo_tpu.utils.cache import enable_compilation_cache  # noqa: E402
from vo_tpu.utils.config import BAConfig, VOConfig  # noqa: E402

enable_compilation_cache()


def main(first=195, last=232):
    seq = Sequence("synthetic", path="./data")
    cfg = VOConfig(ba=BAConfig(enabled=False))
    K = jnp.asarray(seq.K)
    gt = jnp.asarray(seq.gt_poses)
    state, _ = bootstrap(
        jnp.asarray(seq.get_frame(0)), jnp.asarray(seq.get_frame(2)), K, cfg,
        jax.random.PRNGKey(2023),
    )
    uid_start = {int(u): 0 for u in np.asarray(state.table.uid)}
    for i in range(3, last):
        prev_uids = set(np.asarray(state.table.uid).tolist())
        state, out = vo_step(state, jnp.asarray(seq.get_frame(i)), K, cfg)
        for u in np.asarray(state.table.uid).tolist():
            if u not in prev_uids:
                uid_start[int(u)] = i
        # Track restarts (outlier reset) change track_xy but keep uid; detect
        # by comparing track_xy to last frame? Approximation: restarted
        # tracks have track_xy == xy this frame.
        t = state.table
        restarted = np.asarray(
            (t.track_xy == t.xy).all(-1) & (np.asarray(t.state) >= 0)
        )
        for idx in np.nonzero(restarted)[0]:
            uid_start[int(np.asarray(t.uid)[idx])] = i
        if i < first:
            continue
        cand = np.asarray(t.state) == STATE_MATCHED
        if cand.sum() == 0:
            continue
        starts = np.array(
            [uid_start.get(int(u), 0) for u in np.asarray(t.uid)], int
        )
        P_s_gt = _proj_matrix(gt[starts], K)
        P_n_gt = _proj_matrix(gt[i], K)
        Xg = triangulate_dlt(P_s_gt, P_n_gt, t.track_xy, t.xy)
        r_s = np.asarray(reprojection_error(P_s_gt, Xg, t.track_xy))
        r_n = np.asarray(reprojection_error(P_n_gt, Xg, t.xy))
        age = i - starts
        m = cand & np.isfinite(r_s)
        by_age = []
        for lo, hi in [(1, 5), (5, 15), (15, 60), (60, 1000)]:
            sel = m & (age >= lo) & (age < hi)
            if sel.sum():
                by_age.append(f"age{lo}-{hi}: {np.median(r_s[sel]):5.1f}px n={sel.sum()}")
        print(f"f{i:3d} GT-pose med r_start={np.median(r_s[m]):5.1f} "
              f"r_now={np.median(r_n[m]):5.1f} | " + "  ".join(by_age))


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
