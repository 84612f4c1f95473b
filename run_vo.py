#!/usr/bin/env python
"""CLI driver for the TPU-native VO pipeline.

The reference's driver is a module-constant-configured script with a live
matplotlib GUI in the hot loop (src/main.py:27-47, 248-327). This driver is
headless and typed: the device owns the per-frame step; the host decodes
frames, collects poses/stats, and (optionally) writes overlay frames and a
trajectory figure at the end.

Examples:
  python run_vo.py --dataset kitti --data-root /root/reference/tests/test_data \
      --max-frames 6 --platform cpu
  python run_vo.py --dataset parking --data-root ./data --platform tpu \
      --viz-dir out/frames --trajectory-pdf out/full_trajectory.pdf
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[1])
    p.add_argument("--dataset", choices=["kitti", "malaga", "parking", "synthetic"], default="kitti")
    p.add_argument("--data-root", default="./data")
    p.add_argument("--kitti-sequence", default="05")
    p.add_argument("--increment", type=int, default=1)
    p.add_argument("--max-frames", type=int, default=0, help="0 = all")
    p.add_argument("--platform", choices=["tpu", "cpu"], default="tpu")
    p.add_argument("--capacity", type=int, default=1024)
    p.add_argument("--tracker", choices=["klt", "harris", "sift"], default="klt",
                   help="front-end mode (ref tracker.py dispatch)")
    p.add_argument("--detector", choices=["shi_tomasi", "harris"], default="shi_tomasi")
    p.add_argument("--no-ba", action="store_true", help="disable windowed BA")
    # None -> defer to the BAConfig dataclass defaults (utils/config.py), so
    # tuning the library default cannot silently diverge from the CLI.
    p.add_argument("--ba-window", type=int, default=None)
    p.add_argument("--ba-every", type=int, default=None)
    p.add_argument("--kf-mode", choices=["adaptive", "every"], default="every",
                   help="keyframe policy: fixed cadence (every --ba-every "
                        "frames; the validated default) or motion/"
                        "covisibility-gated (adaptive — use on stop-and-go "
                        "footage; see tools/ablate_keyframes.py + EVAL.md)")
    p.add_argument("--checkpoint", default="", help="write checkpoints here (.npz)")
    p.add_argument("--checkpoint-every", type=int, default=100)
    p.add_argument("--resume", default="", help="resume from a checkpoint (.npz)")
    p.add_argument("--viz-dir", default="", help="write keypoint-overlay PNGs here")
    p.add_argument("--trajectory-pdf", default="", help="write final trajectory figure")
    p.add_argument("--map-pdf", default="", help="write final 3-D point-cloud figure")
    p.add_argument("--landmarks-pdf", default="",
                   help="write per-frame landmark-count history figure "
                        "(ref main.py:144-165 plot_nr_of_landmarks)")
    p.add_argument("--save-npz", default="", help="save poses/stats to .npz")
    p.add_argument("--profile-dir", default="", help="jax.profiler trace directory")
    p.add_argument("--debug-validate", action="store_true",
                   help="run the feature-table invariant validator every frame "
                        "(the reference's runtime asserts, SURVEY §5)")
    p.add_argument("--chunk", type=int, default=1,
                   help="frames per device-resident lax.scan rollout chunk "
                        "(1 = per-frame stepping; >1 = deployment shape, one "
                        "launch/fetch per chunk)")
    p.add_argument("--no-pallas", action="store_true",
                   help="disable the Pallas kernels (fused detect NMS + LK "
                        "DMA patch gather); XLA fallback paths are used")
    p.add_argument("--no-prefetch", action="store_true",
                   help="disable the native decode-ahead frame prefetcher")
    p.add_argument("--pose-graph", action="store_true",
                   help="long-term pose-graph back-end with appearance loop "
                        "closure (keyframe DB + SE(3) graph GN); the global "
                        "trajectory is re-anchored after optimization")
    p.add_argument("--pg-every", type=int, default=8,
                   help="frames between pose-graph keyframes")
    p.add_argument("--pg-nodes", type=int, default=256,
                   help="pose-graph capacity; older keyframes are culled by "
                        "chain-span score when full")
    p.add_argument("--pg-min-frame-gap", type=int, default=100)
    # 0.95 measured on the 1169-frame circuit (r5): genuine revisit edges
    # retrieve at >= 0.978 while the one false candidate that survived
    # geometric verification (18 inliers, exactly at threshold) retrieved
    # at 0.925 — and that single false Sim(3) edge bent the corrected
    # trajectory from 2.07 m to 21.5 m ATE. Retrieval similarity separates
    # the two populations more cleanly than inlier count here.
    p.add_argument("--pg-min-similarity", type=float, default=0.95)
    p.add_argument("--quiet", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from vo_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from vo_tpu.data import Sequence, ate_rmse, rpe
    from vo_tpu.data.evaluate import positions_from_poses
    from vo_tpu.models.feature_table import STATE_TRIANGULATED
    from vo_tpu.models.pipeline import bootstrap, vo_step
    from vo_tpu.utils import viz
    from vo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from vo_tpu.utils.config import BAConfig, DetectorConfig, VOConfig

    seq = Sequence(
        args.dataset,
        path=args.data_root,
        increment=args.increment,
        kitti_sequence=args.kitti_sequence,
    )
    n_frames = len(seq) if args.max_frames <= 0 else min(args.max_frames, len(seq))
    from vo_tpu.utils.config import KLTConfig

    cfg = VOConfig(
        capacity=args.capacity,
        tracker=args.tracker,
        detector=DetectorConfig(
            method=args.detector,
            use_pallas=False if args.no_pallas else None,
        ),
        klt=KLTConfig(use_pallas=False if args.no_pallas else None),
        ba=BAConfig(enabled=not args.no_ba, keyframe_mode=args.kf_mode,
                    **{k: v for k, v in (("window", args.ba_window),
                                         ("keyframe_every", args.ba_every))
                       if v is not None}),
    )
    K = jnp.asarray(seq.K)
    gap = cfg.bootstrap.frame_gap
    if n_frames <= gap:
        print(f"need more than {gap} frames, got {n_frames}", file=sys.stderr)
        return 2

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)

    print(f"[vo_tpu] {args.dataset}: {n_frames} frames, device={jax.devices()[0]}")
    t_start = time.time()
    if args.resume:
        state, cfg, traj, fids = load_checkpoint(args.resume)
        frame_ids = list(np.asarray(fids)) if fids is not None else []
        poses = list(traj) if traj is not None else []
        start_frame = int(state.frame_idx) + 1
        print(f"[vo_tpu] resumed from {args.resume} at frame {start_frame - 1}")
    else:
        state, out = bootstrap(
            jnp.asarray(seq.get_frame(0)), jnp.asarray(seq.get_frame(gap)), K, cfg,
            jax.random.PRNGKey(2023),
        )
        jax.block_until_ready(state)
        t_boot = time.time() - t_start
        print(
            f"[vo_tpu] bootstrap(0,{gap}) in {t_boot:.1f}s: "
            f"tracked={int(out.num_tracked)} landmarks={int(out.num_triangulated)} "
            f"ok={bool(out.pose_ok)}"
        )
        frame_ids = [0, gap]
        poses = [np.eye(4, dtype=np.float32), np.asarray(out.pose)]
        start_frame = gap + 1
    stats = []
    t_loop = time.time()
    compile_time = 0.0
    first_i = start_frame
    fps_meter = viz.FpsMeter()
    # Decode-ahead: the native C++ prefetch ring (native/frame_loader.cc)
    # keeps decode off the critical path; PIL fallback decodes lazily.
    prefetch = None
    if not args.no_prefetch:
        try:
            prefetch = seq.prefetch(start=start_frame)
        except TypeError:  # iterator fallback path has no start arg
            prefetch = None
    chunk = max(1, args.chunk)
    if chunk > 1 and (args.viz_dir or args.debug_validate):
        print("[vo_tpu] --viz-dir/--debug-validate need per-frame stepping; "
              "falling back to --chunk 1")
        chunk = 1

    backend = None
    next_pg = start_frame
    if args.pose_graph:
        from vo_tpu.models.backend import BackendConfig, PoseGraphBackend
        from vo_tpu.utils.checkpoint import load_backend

        if args.resume:
            backend = load_backend(args.resume)
            if backend is not None:
                last_kf = int(np.max(np.asarray(backend.graph.node_frame)))
                next_pg = max(start_frame, last_kf + args.pg_every)
                print(
                    f"[vo_tpu] pose-graph back-end resumed: "
                    f"{backend.n_nodes} nodes, {backend.n_loops} loop(s)"
                )
        if backend is None:
            backend = PoseGraphBackend(
                K,
                BackendConfig(
                    nodes=args.pg_nodes,
                    min_frame_gap=args.pg_min_frame_gap,
                    min_similarity=args.pg_min_similarity,
                ),
            )

    def maybe_pose_graph(i, img_np):
        """Register frame i as a pose-graph keyframe if its cadence is due
        (runs off the per-frame critical path, once per pg_every frames)."""
        nonlocal next_pg
        if backend is None or i < next_pg:
            return
        next_pg = i + args.pg_every
        info = backend.on_keyframe(img_np, state.pose, state.table, i)
        if info and not args.quiet:
            print(
                f"[vo_tpu] LOOP closed: frame {info['frame']} <-> "
                f"{info['matched_frame']} (sim {info['similarity']:.2f}, "
                f"{info['inliers']} inliers)"
            )

    def record(i, out, dt):
        frame_ids.append(i)
        poses.append(np.asarray(out.pose))
        stats.append(
            dict(frame=i, dt=dt, ok=bool(out.pose_ok),
                 tracked=int(out.num_tracked), tri=int(out.num_triangulated),
                 cand=int(out.num_candidates), inl=int(out.num_pnp_inliers),
                 new=int(out.num_new_landmarks), frozen=bool(out.frozen))
        )
        if not args.quiet:
            tag = "" if bool(out.pose_ok) else (
                "  [POSE FROZEN]" if bool(out.frozen) else "  [POSE FALLBACK]"
            )
            print(f"[vo_tpu] frame {i:5d} {fps_meter.text()}  {viz.hud_text(out)}"
                  + tag)

    def maybe_checkpoint(i):
        if args.checkpoint and (i - first_i + 1) % args.checkpoint_every < chunk:
            save_checkpoint(args.checkpoint, state, cfg,
                            trajectory=poses, frame_ids=frame_ids,
                            backend=backend)
            if not args.quiet:
                print(f"[vo_tpu] checkpoint @ frame {i} -> {args.checkpoint}")

    if chunk > 1:
        # Device-resident rollout: the whole per-frame loop runs on device
        # as a lax.scan over a stacked frame chunk (`vo_rollout`) — one
        # launch + one fetch per chunk instead of per frame. This is the
        # deployment shape; per-frame stepping is for debugging/viz.
        from vo_tpu.models.pipeline import vo_rollout

        i = start_frame
        while i < n_frames:
            n = min(chunk, n_frames - i)
            raw = [
                prefetch.get(j - start_frame) if prefetch is not None
                else seq.get_frame(j)
                for j in range(i, i + n)
            ]
            imgs = np.stack(raw)
            if n < chunk:  # pad the tail chunk; padded outputs are dropped
                imgs = np.concatenate([imgs, np.repeat(imgs[-1:], chunk - n, 0)])
            t0 = time.time()
            state, outs = vo_rollout(state, jnp.asarray(imgs), K, cfg)
            jax.block_until_ready(outs.pose)
            dt = time.time() - t0
            if i == first_i:
                compile_time = dt
            outs_np = jax.tree_util.tree_map(np.asarray, outs)
            for k in range(n):
                one = jax.tree_util.tree_map(lambda x: x[k], outs_np)
                record(i + k, one, dt / chunk)
                fps_meter.tick()
            maybe_pose_graph(i + n - 1, raw[n - 1])
            maybe_checkpoint(i + n - 1)  # after pose graph: ckpt includes it
            i += n
    else:
        for i in range(start_frame, n_frames):
            raw = (prefetch.get(i - start_frame) if prefetch is not None
                   else seq.get_frame(i))
            img = jnp.asarray(raw)
            t0 = time.time()
            state, out = vo_step(state, img, K, cfg)
            jax.block_until_ready(out.pose)
            dt = time.time() - t0
            if i == first_i:
                compile_time = dt
            record(i, out, dt)
            maybe_pose_graph(i, np.asarray(raw))
            maybe_checkpoint(i)
            fps_meter.tick()
            if args.debug_validate:
                from vo_tpu.models.feature_table import debug_validate

                violations = debug_validate(state.table)
                if violations:
                    raise AssertionError(
                        f"frame {i}: invariants violated: {violations}")
            if args.viz_dir:
                tab = state.table
                rgb = viz.keypoint_overlay(
                    np.asarray(img), np.asarray(tab.xy), np.asarray(tab.state),
                    np.asarray(tab.track_xy),
                )
                os.makedirs(args.viz_dir, exist_ok=True)
                from PIL import Image

                Image.fromarray(rgb).save(
                    os.path.join(args.viz_dir, f"{i:06d}.png"))

    steady = [s["dt"] for s in stats[chunk:]] or [compile_time]
    wall = time.time() - t_loop
    fps = len(steady) / max(sum(steady), 1e-9)
    print(f"[vo_tpu] {len(stats)} steps in {wall:.1f}s "
          f"(first-step compile {compile_time:.1f}s, steady-state {fps:.2f} fps)")

    if args.profile_dir:
        jax.profiler.stop_trace()

    est = np.stack(poses)
    result = {"fps_steady": fps, "frames": len(stats) + 2}

    est_raw = None
    if backend is not None and backend.n_nodes >= 2:
        t0 = time.time()
        backend.optimize()
        est_raw = est
        est = backend.correct(est, np.asarray(frame_ids))
        result.update(
            pg_nodes=backend.n_nodes, pg_loops=backend.n_loops,
            pg_culled=backend.n_culled, pg_seconds=round(time.time() - t0, 2),
        )
        print(
            f"[vo_tpu] pose graph: {backend.n_nodes} nodes, "
            f"{backend.n_loops} loop(s), {len(backend.rejected)} candidate(s) "
            f"failed verification, {backend.n_culled} culled, "
            f"optimized in {time.time() - t0:.1f}s"
        )
        if backend.rejected and not args.quiet:
            for r in backend.rejected[:10] + [
                x for x in backend.rejected[10:]
                if x["frame"] - x["matched_frame"] > 800
            ]:
                print(f"[vo_tpu]   rejected loop {r['frame']} <-> "
                      f"{r['matched_frame']} sim {r['similarity']:.3f} "
                      f"inliers {r['inliers']}")

    if args.save_npz:
        os.makedirs(os.path.dirname(args.save_npz) or ".", exist_ok=True)
        extra = {}
        if est_raw is not None:
            extra = dict(poses_raw=est_raw,
                         loops=json.dumps(backend.loops))
        np.savez(args.save_npz, poses=est, frame_ids=np.asarray(frame_ids),
                 stats=json.dumps(stats), **extra)
        print(f"[vo_tpu] wrote {args.save_npz}")

    # Metrics over the finite prefix: a diverged run (non-finite poses after
    # repeated fallback) still reports how far it got instead of crashing.
    finite = np.isfinite(est.reshape(len(est), -1)).all(axis=1)
    n_ok = int(np.argmin(finite)) if not finite.all() else len(est)
    n_frozen = sum(1 for s in stats if s.get("frozen"))
    if n_frozen:
        result["frozen_frames"] = n_frozen
        print(f"[vo_tpu] WARNING: fail-safe froze the pose on {n_frozen} "
              f"frame(s) — those frames are NOT tracking")
    if n_ok < len(est):
        result["diverged_at_frame"] = int(frame_ids[n_ok])
        print(f"[vo_tpu] WARNING: pose non-finite from frame {frame_ids[n_ok]}; "
              f"metrics over first {n_ok} poses")
    if seq.gt_poses is not None and len(seq.gt_poses) >= n_frames and n_ok >= 3:
        gt = seq.gt_poses[frame_ids][:n_ok]
        est_m = est[:n_ok]
        ate = ate_rmse(positions_from_poses(est_m), positions_from_poses(gt))
        t_rpe, r_rpe = rpe(est_m, gt)
        result.update(ate_rmse_m=ate, rpe_trans_m=t_rpe, rpe_rot_rad=r_rpe)
        print(f"[vo_tpu] ATE RMSE {ate:.4f} m | RPE {t_rpe:.4f} m / {r_rpe*57.3:.3f} deg")
        if est_raw is not None:
            ate_raw = ate_rmse(
                positions_from_poses(est_raw[:n_ok]), positions_from_poses(gt)
            )
            result.update(ate_rmse_m_pre_pg=ate_raw)
            print(f"[vo_tpu] ATE RMSE before pose graph: {ate_raw:.4f} m "
                  f"({ate_raw / max(ate, 1e-9):.1f}x)")

    if args.trajectory_pdf:
        tab = state.table
        lm = np.asarray(tab.landmark)[np.asarray(tab.state) == STATE_TRIANGULATED]
        gtp = (positions_from_poses(seq.gt_poses[frame_ids])
               if seq.gt_poses is not None and len(seq.gt_poses) >= n_frames else None)
        viz.save_trajectory_plot(
            args.trajectory_pdf, positions_from_poses(est), gtp, lm,
            title=f"{args.dataset} ({len(frame_ids)} frames)",
        )
        print(f"[vo_tpu] wrote {args.trajectory_pdf}")

    if args.map_pdf:
        tab = state.table
        lm = np.asarray(tab.landmark)[np.asarray(tab.state) == STATE_TRIANGULATED]
        viz.save_point_cloud_plot(args.map_pdf, lm, est,
                                  title=f"{args.dataset} map")
        print(f"[vo_tpu] wrote {args.map_pdf}")

    if args.landmarks_pdf:
        viz.save_landmark_history_plot(
            args.landmarks_pdf,
            np.asarray([s["frame"] for s in stats]),
            np.asarray([s["tri"] for s in stats]),
            np.asarray([s["cand"] for s in stats]),
            np.asarray([s["tracked"] for s in stats]),
            title=f"{args.dataset} landmark history",
        )
        print(f"[vo_tpu] wrote {args.landmarks_pdf}")

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
