#!/usr/bin/env python
"""Pinpoint the first non-finite value in a SIFT/Harris-mode run.

The r4 full-length mode eval (VERDICT r3 task #5) found SIFT diverging at
frame 72 and Harris at 78 on the 600-frame headline sequence — NaN poses on
exactly the keyframe cadence. This steps the pipeline per frame and reports
which state component goes non-finite first (PnP pose vs BA window vs
written-back landmarks), which the chunked driver cannot see.

Usage: python tools/debug_sift_nan.py [--tracker sift] [--frames 90]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracker", default="sift")
    ap.add_argument("--frames", type=int, default=90)
    ap.add_argument("--platform", choices=["tpu", "cpu"], default="tpu")
    ap.add_argument("--dump-at", type=int, default=0,
                    help="checkpoint the state BEFORE stepping this frame")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from vo_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from vo_tpu.data import Sequence
    from vo_tpu.models.pipeline import bootstrap, vo_step
    from vo_tpu.utils.config import VOConfig

    seq = Sequence("synthetic", path="./data")
    cfg = VOConfig(capacity=1024, tracker=args.tracker)
    K = jnp.asarray(seq.K)
    state, _ = bootstrap(
        jnp.asarray(seq.get_frame(0)), jnp.asarray(seq.get_frame(2)), K, cfg,
        jax.random.PRNGKey(2023),
    )

    def fin(x):
        return bool(np.isfinite(np.asarray(x)).all())

    for i in range(3, args.frames):
        if args.dump_at and i == args.dump_at:
            from vo_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(f"/tmp/dbg_state_{i}.npz", state, cfg)
            print(f"dumped pre-step state -> /tmp/dbg_state_{i}.npz")
        state, out = vo_step(state, jnp.asarray(seq.get_frame(i)), K, cfg)
        pose_f = fin(out.pose)
        win_f = fin(state.window.kf_pose)
        lm = np.asarray(state.table.landmark)
        st = np.asarray(state.table.state)
        lm_nan = int((~np.isfinite(lm).all(-1) & (st == 2)).sum())
        wlm = np.asarray(state.window.landmark)
        wlv = np.asarray(state.window.lm_valid)
        wlm_nan = int((~np.isfinite(wlm).all(-1) & wlv).sum())
        flag = "" if (pose_f and win_f and lm_nan == 0 and wlm_nan == 0) else "  <-- NONFINITE"
        # scale telemetry (r4 harris tail: exponential scale drift overflows
        # f32 near frame 586 — watch |t| and landmark depth grow)
        tnorm = float(np.linalg.norm(np.asarray(out.pose)[:3, 3]))
        live = st == 2
        depth = float(np.nanmedian(np.abs(lm[live, 2]))) if live.any() else 0.0
        print(
            f"f{i:3d} ok={int(np.asarray(out.pose_ok))} "
            f"trk={int(out.num_tracked):4d} cand={int(out.num_candidates):4d} "
            f"inl={int(out.num_pnp_inliers):4d} tri={int(out.num_triangulated):4d} "
            f"pose_fin={int(pose_f)} win_fin={int(win_f)} "
            f"tbl_lm_nan={lm_nan:3d} win_lm_nan={wlm_nan:3d} "
            f"|t|={tnorm:.3e} med_depth={depth:.3e}{flag}",
            flush=True,
        )
        if not pose_f:
            print("pose:", np.asarray(out.pose))
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
