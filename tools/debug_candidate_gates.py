#!/usr/bin/env python
"""Per-gate kill counts for candidate triangulation through the first turn
of the synthetic sequence — which quality gate starves landmark conversion
when the view sweeps (vo_step step 6, models/pipeline.py)."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vo_tpu.data import Sequence  # noqa: E402
from vo_tpu.geom.lie import pose_inverse  # noqa: E402
from vo_tpu.models.feature_table import STATE_MATCHED  # noqa: E402
from vo_tpu.models.pipeline import _proj_matrix, _rays_world, bootstrap, vo_step  # noqa: E402
from vo_tpu.ops.triangulate import reprojection_error, triangulate_dlt  # noqa: E402
from vo_tpu.utils.cache import enable_compilation_cache  # noqa: E402
from vo_tpu.utils.config import BAConfig, VOConfig  # noqa: E402

enable_compilation_cache()


def main(first=150, last=240):
    seq = Sequence("synthetic", path="./data")
    cfg = VOConfig(ba=BAConfig(enabled=False))
    K = jnp.asarray(seq.K)
    state, _ = bootstrap(
        jnp.asarray(seq.get_frame(0)), jnp.asarray(seq.get_frame(2)), K, cfg,
        jax.random.PRNGKey(2023),
    )
    tcfg = cfg.triangulation
    Kinv = jnp.linalg.inv(K)
    for i in range(3, last):
        state, out = vo_step(state, jnp.asarray(seq.get_frame(i)), K, cfg)
        if i < first:
            continue
        t = state.table
        pose = state.pose
        cand = np.asarray(t.state) == STATE_MATCHED
        track_pose = t.track_pose.reshape(-1, 4, 4)
        ray_s = _rays_world(track_pose, Kinv, t.track_xy)
        ray_n = _rays_world(pose, Kinv, t.xy)
        ang = np.arccos(np.clip(np.asarray((ray_s * ray_n).sum(-1)), -1, 1))
        gate_b = cand & (ang >= tcfg.bearing_threshold)
        P_s = _proj_matrix(track_pose, K)
        P_n = _proj_matrix(pose, K)
        X = triangulate_dlt(P_s, P_n, t.track_xy, t.xy)
        T_cw = pose_inverse(pose)
        z_s = np.asarray(
            (pose_inverse(track_pose)[:, 2, :3] * X).sum(-1)
            + pose_inverse(track_pose)[:, 2, 3]
        )
        z_n = np.asarray((T_cw[2, :3] * X).sum(-1) + T_cw[2, 3])
        r_n = np.asarray(reprojection_error(P_n, X, t.xy))
        r_s = np.asarray(reprojection_error(P_s, X, t.track_xy))
        fin = np.asarray(jnp.isfinite(X).all(-1))
        kill_depth = gate_b & fin & ~(
            (z_s > tcfg.min_depth) & (z_n > tcfg.min_depth) & (z_n < tcfg.max_depth)
        )
        ok_depth = gate_b & fin & ~kill_depth
        kill_rn = ok_depth & (r_n >= tcfg.max_reproj_px)
        kill_rs = ok_depth & (r_s >= tcfg.max_reproj_px)
        good = ok_depth & (r_n < tcfg.max_reproj_px) & (r_s < tcfg.max_reproj_px)
        med_rs = np.median(r_s[ok_depth]) if ok_depth.any() else np.nan
        print(
            f"f{i:3d} ok={int(out.pose_ok)} cand={cand.sum():3d} "
            f"pass_bear={gate_b.sum():3d} kill_depth={kill_depth.sum():3d} "
            f"kill_rnow={kill_rn.sum():3d} kill_rstart={kill_rs.sum():3d} "
            f"good={good.sum():3d} med_r_start={med_rs:6.1f}px"
        )


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
