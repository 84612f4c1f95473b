#!/usr/bin/env python
"""Multi-sequence VO evaluation driver (data-parallel scaling).

Runs B independent sequences in lockstep through ONE batched, jitted device
program (`batched_vo_rollout`), the TPU-native throughput-scaling mode for an
inherently sequential task (SURVEY §7 "hard parts": frame t+1 needs pose t,
so latency per sequence is fixed — aggregate frames/s scales with the batch
and, on a pod, with chips over the mesh "data" axis).

Reference contrast: the reference processes exactly one sequence in one
python loop (src/main.py:248). Nothing like a suite evaluator exists there.

Examples:
  # 4 lockstep copies of the KITTI 05 micro-dataset on the real chip
  python run_multiseq.py --data-root /root/reference/tests/test_data \
      --sequences 05,05,05,05 --steps 40

  # scaling sweep: aggregate fps at B = 1, 2, 4, 8
  python run_multiseq.py --data-root /root/reference/tests/test_data \
      --sweep 1,2,4,8 --steps 40
"""

from __future__ import annotations

import argparse
import json
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[1])
    p.add_argument("--dataset", choices=["kitti", "malaga", "parking"], default="kitti")
    p.add_argument("--data-root", default="./data")
    p.add_argument("--sequences", default="05",
                   help="comma-separated KITTI sequence ids (one per batch lane)")
    p.add_argument("--sweep", default="",
                   help="comma-separated batch sizes: replicate sequence 0 and "
                        "report aggregate fps per size")
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--capacity", type=int, default=512)
    p.add_argument("--platform", choices=["tpu", "cpu"], default="tpu")
    p.add_argument("--multihost", default="",
                   help="comma-separated process counts (e.g. 1,2): launch a "
                        "jax.distributed local cluster per count (workers = "
                        "vo_tpu.parallel.multihost) and print the weak-scaling "
                        "table. Runs on virtual CPU devices; on a pod the same "
                        "workers run one-per-host unchanged.")
    p.add_argument("--devices-per-proc", type=int, default=2,
                   help="virtual CPU devices per worker process (multihost)")
    p.add_argument("--mh-steps", type=int, default=6)
    p.add_argument("--mh-capacity", type=int, default=128)
    p.add_argument("--mh-crop", default="",
                   help="HxW crop for multihost workers (empty = worker "
                        "default 128x256; '370x1226' = full KITTI frames)")
    p.add_argument("--mh-repeats", type=int, default=4,
                   help="timed rollout repeats per worker (first is warmup; "
                        "best of the rest is reported)")
    p.add_argument("--full", action="store_true",
                   help="full-length multi-sequence accuracy eval: render 6 "
                        "DISTINCT synthetic city sequences (varied seeds/"
                        "paths, one stop-and-go), roll them full-length in "
                        "lockstep, report per-lane ATE + aggregate fps, plus "
                        "a distorted-lens lane run separately (distortion "
                        "coefficients are config-static)")
    p.add_argument("--full-frames", type=int, default=600,
                   help="frames per lane for --full")
    p.add_argument("--full-root", default="./data/multiseq")
    p.add_argument("--no-pallas", action="store_true",
                   help="route detection/LK through the XLA op chain "
                        "instead of the Pallas kernels (fault isolation)")
    p.add_argument("--seqpar-shards", type=int, default=0,
                   help="deploy the sequence-parallel composed-window BA "
                        "inside a real rollout: W_eff = 4*shards keyframes "
                        "pushed by the pipeline (refine_in_step=False), "
                        "refined by seqpar_ba_refine sharded over this many "
                        "virtual CPU devices between rollout chunks, "
                        "refined poses/landmarks handed back to the "
                        "front-end. Reports ATE with vs without the "
                        "composed-window backend.")
    p.add_argument("--seqpar-steps", type=int, default=150,
                   help="rollout frames for --seqpar-shards (CPU-bound)")
    p.add_argument("--full-lanes", type=str, default="",
                   help="limit --full to N lanes (int) or a comma-separated "
                        "lane-name list (e.g. city_lr,stopgo); empty = all")
    return p.parse_args(argv)


def _full_specs(frames: int):
    """Six distinct full-length drives over six distinct procedural cities
    (seed varies scene AND path noise)."""
    from vo_tpu.data.synthetic import DEFAULT_SPEC, PathSpec
    import dataclasses

    def spec(seed, segments, stops=()):
        return dataclasses.replace(
            DEFAULT_SPEC, num_frames=frames, seed=seed,
            path=PathSpec(segments=segments, stops=stops),
        )

    return {
        "city_lr": spec(0, (("straight", 50.0), ("turn", 90.0, 8.0),
                            ("straight", 45.0), ("turn", -90.0, 8.0),
                            ("straight", 60.0))),
        "city_rl": spec(1, (("straight", 40.0), ("turn", -90.0, 9.0),
                            ("straight", 55.0), ("turn", 90.0, 7.0),
                            ("straight", 55.0))),
        "scurve": spec(2, (("straight", 30.0), ("turn", 45.0, 20.0),
                           ("turn", -45.0, 20.0), ("straight", 30.0),
                           ("turn", -45.0, 20.0), ("turn", 45.0, 20.0),
                           ("straight", 25.0))),
        "stopgo": spec(3, (("straight", 40.0), ("turn", 90.0, 8.0),
                           ("straight", 35.0), ("turn", -90.0, 8.0),
                           ("straight", 30.0)),
                       stops=((70, 45), (240, 45))),
        "tight": spec(4, (("straight", 35.0), ("turn", 90.0, 6.0),
                          ("straight", 30.0), ("turn", 90.0, 6.0),
                          ("straight", 35.0), ("turn", 90.0, 6.0),
                          ("straight", 30.0))),
        "longrun": spec(5, (("straight", 90.0), ("turn", -60.0, 15.0),
                            ("straight", 70.0))),
    }


def run_full(args):
    """Full-length lockstep eval over 6 distinct sequences (VERDICT r2 item
    6: nothing ran B>1 DISTINCT full-length sequences before)."""
    import dataclasses
    import os
    import time

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from vo_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from vo_tpu.data import Sequence, ate_rmse
    from vo_tpu.data.evaluate import positions_from_poses
    from vo_tpu.data.synthetic import generate
    from vo_tpu.models.pipeline import bootstrap, vo_rollout
    from vo_tpu.parallel.multiseq import batched_vo_rollout
    from vo_tpu.utils.config import DetectorConfig, KLTConfig, VOConfig

    specs = _full_specs(args.full_frames)
    # Keyframe policy is a TRACED lane parameter (VOState.kf_adaptive), so
    # the lockstep batch mixes policies inside ONE compiled program: the
    # stop-and-go and tight-turn lanes run the motion/covisibility-gated
    # adaptive policy (their validated config — tools/ablate_keyframes.py),
    # the constant-speed lanes keep the fixed cadence default.
    ADAPTIVE_LANES = {"stopgo", "tight"}
    cfg = VOConfig(capacity=args.capacity)
    if args.no_pallas:
        cfg = dataclasses.replace(
            cfg, detector=DetectorConfig(use_pallas=False),
            klt=KLTConfig(use_pallas=False),
        )
    names = list(specs)
    if args.full_lanes:
        if args.full_lanes.isdigit():
            # 0 keeps the historical meaning "all lanes" (matches the old
            # int-default behaviour) rather than slicing names[:0].
            if int(args.full_lanes) > 0:
                names = names[: int(args.full_lanes)]
        else:
            want = [w.strip() for w in args.full_lanes.split(",") if w.strip()]
            unknown = [w for w in want if w not in specs]
            assert not unknown, f"unknown lanes {unknown}; have {names}"
            names = want
    stacks, states, gts = [], [], []
    for i, name in enumerate(names):
        root = os.path.join(args.full_root, name)
        generate(os.path.join(root, "parking"), specs[name])
        seq = Sequence("parking", path=root)
        n = len(seq)
        imgs = np.stack([np.asarray(seq.get_frame(j)) for j in range(n)])
        K = jnp.asarray(seq.K)
        st, _ = bootstrap(
            jnp.asarray(imgs[0]), jnp.asarray(imgs[2]), K, cfg,
            jax.random.PRNGKey(2023 + i),
        )
        stacks.append(imgs[3:])
        states.append(st)
        gts.append(seq.gt_poses)
    B = len(names)
    n_steps = min(s.shape[0] for s in stacks)
    images_np = np.stack([s[:n_steps] for s in stacks], axis=1)  # (N,B,H,W)
    batched = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *states
    )
    lane_adaptive = jnp.asarray([name in ADAPTIVE_LANES for name in names])
    batched = batched._replace(kf_adaptive=lane_adaptive)
    Ks = jnp.broadcast_to(jnp.asarray(seq.K), (B, 3, 3))

    # Chunked launches (the run_vo --chunk deployment shape): one
    # uninterrupted 597-step x 6-lane scan is a multi-minute device launch,
    # which the tunnel reliably kills on the second run; 64-step chunks
    # keep launches short and the state carries across chunks regardless.
    CHUNK = 64
    n_chunks = (n_steps + CHUNK - 1) // CHUNK
    pad = n_chunks * CHUNK - n_steps
    if pad:
        images_np = np.concatenate(
            [images_np, np.repeat(images_np[-1:], pad, axis=0)], axis=0
        )

    def run_chunks(st):
        outs_pose = []
        for c in range(n_chunks):
            block = jnp.asarray(images_np[c * CHUNK:(c + 1) * CHUNK])
            st, outs = batched_vo_rollout(st, block, Ks, cfg)
            outs_pose.append(np.asarray(outs.pose))
        return st, np.concatenate(outs_pose)[:n_steps]

    run_chunks(batched)  # compile + warmup
    t0 = time.perf_counter()
    _, poses = run_chunks(batched)  # (N, B, 4, 4)
    dt = time.perf_counter() - t0

    lanes = []
    for b, name in enumerate(names):
        est = np.concatenate([
            np.stack([np.eye(4, dtype=np.float32), np.asarray(states[b].pose)]),
            poses[:, b],
        ])
        gt = gts[b][[0, 2] + list(range(3, 3 + n_steps))]
        ate = ate_rmse(positions_from_poses(est), positions_from_poses(gt))
        ok = bool(np.isfinite(poses[:, b]).all())
        lanes.append({"lane": name, "ate_rmse_m": round(float(ate), 3),
                      "finite": ok})
        print(json.dumps(lanes[-1]), flush=True)

    # Distorted-lens lane (config-static coefficients -> separate program).
    dist = (-0.28, 0.08, 0.0005, -0.0005, 0.0)
    droot = os.path.join(args.full_root, "distorted")
    dspec = dataclasses.replace(specs["city_lr"], seed=6, dist=dist)
    generate(os.path.join(droot, "parking"), dspec)
    dseq = Sequence("parking", path=droot)
    dcfg = VOConfig(capacity=args.capacity, dist=dist)
    dimgs = np.stack([np.asarray(dseq.get_frame(j)) for j in range(len(dseq))])
    dK = jnp.asarray(dseq.K)
    dst, _ = bootstrap(jnp.asarray(dimgs[0]), jnp.asarray(dimgs[2]), dK, dcfg,
                       jax.random.PRNGKey(2030))
    _, douts = vo_rollout(dst, jnp.asarray(dimgs[3:]), dK, dcfg)
    dest = np.concatenate([
        np.stack([np.eye(4, dtype=np.float32), np.asarray(dst.pose)]),
        np.asarray(douts.pose),
    ])
    dgt = dseq.gt_poses[[0, 2] + list(range(3, len(dseq)))]
    date = ate_rmse(positions_from_poses(dest), positions_from_poses(dgt))
    lanes.append({"lane": "distorted", "ate_rmse_m": round(float(date), 3),
                  "finite": bool(np.isfinite(dest).all())})
    print(json.dumps(lanes[-1]), flush=True)

    report = {
        "metric": "multiseq_full",
        "lanes": lanes,
        "batch": B,
        "steps": int(n_steps),
        "agg_fps": round(B * n_steps / dt, 2),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(report))
    return 0


def run_seqpar(args):
    """Deploy sequence-parallel composed-window BA inside a REAL rollout
    (VERDICT r4 task #4c: not a fixture — the pipeline pushes keyframes,
    the sharded backend refines them, the front-end consumes the result).

    The pipeline runs with ba.refine_in_step=False and a composed window of
    W_eff = 4 * shards keyframes: per-device memory holds only the obs
    arrays of its block in the target deployment, and the refinement runs
    as seqpar_ba_refine over the mesh between rollout chunks. Refined
    keyframe poses and landmarks are handed back to the front-end (rigid
    delta of the newest keyframe applied to the live pose, landmark rows by
    uid — the same write-back vo_step's in-step BA does). Reports ATE of
    the backend-refined run vs the same rollout with no refinement at all.
    """
    import os
    import sys

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.seqpar_shards}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.execv(sys.executable, [sys.executable] + sys.argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    from vo_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from vo_tpu.data import Sequence, ate_rmse
    from vo_tpu.data.evaluate import positions_from_poses
    from vo_tpu.geom.lie import pose_inverse
    from vo_tpu.models.feature_table import STATE_TRIANGULATED
    from vo_tpu.models.pipeline import bootstrap, vo_rollout
    from vo_tpu.parallel.mesh import make_mesh
    from vo_tpu.parallel.window_blocks import (
        seqpar_ba_refine,
        shard_window_blocks,
    )
    from vo_tpu.utils.config import BAConfig, VOConfig

    shards = args.seqpar_shards
    assert len(jax.devices()) >= shards, (len(jax.devices()), shards)
    W_eff = 4 * shards
    mesh = make_mesh(n_data=1, n_model=shards)

    seq = Sequence("synthetic", path="./data")
    n = min(args.seqpar_steps, len(seq))
    imgs = np.stack([np.asarray(seq.get_frame(i)) for i in range(n)])
    K = jnp.asarray(seq.K)
    cfg = VOConfig(
        capacity=args.capacity,
        ba=BAConfig(window=W_eff, refine_in_step=False),
    )

    CHUNK = 16

    def rollout(refine: bool):
        state, _ = bootstrap(
            jnp.asarray(imgs[0]), jnp.asarray(imgs[2]), K, cfg,
            jax.random.PRNGKey(2023),
        )
        poses = []
        for c in range(3, n, CHUNK):
            block = jnp.asarray(imgs[c:c + CHUNK])
            state, outs = vo_rollout(state, block, K, cfg)
            poses.append(np.asarray(outs.pose))
            if refine and bool(state.window.kf_valid[-1]):
                old_last = state.window.kf_pose[-1].reshape(4, 4)
                refined, _ = seqpar_ba_refine(
                    mesh, shard_window_blocks(state.window, mesh), K,
                    iters=cfg.ba.iters, damping=cfg.ba.damping,
                    huber_px=cfg.ba.huber_px,
                )
                refined = jax.tree.map(
                    lambda x: jnp.asarray(jax.device_get(x)), refined
                )
                tbl = state.table
                match = (
                    (refined.lm_uid == tbl.uid)
                    & refined.lm_valid
                    & (tbl.state == STATE_TRIANGULATED)
                )
                tbl = tbl._replace(
                    landmark=jnp.where(
                        match[:, None], refined.landmark, tbl.landmark
                    )
                )
                # Rigid handoff: apply the newest keyframe's correction to
                # the live pose (frontend consumes the backend's estimate).
                new_last = refined.kf_pose[-1].reshape(4, 4)
                delta = new_last @ pose_inverse(old_last)
                state = state._replace(
                    table=tbl, window=refined, pose=delta @ state.pose
                )
        est = np.concatenate(
            [np.stack([np.eye(4, dtype=np.float32)]), np.concatenate(poses)]
        )
        gt_idx = [0] + list(range(3, 3 + est.shape[0] - 1))
        gt = seq.gt_poses[gt_idx]
        return float(
            ate_rmse(positions_from_poses(est), positions_from_poses(gt))
        ), bool(np.isfinite(est).all())

    ate_plain, fin_plain = rollout(refine=False)
    ate_seqpar, fin_seqpar = rollout(refine=True)
    report = {
        "metric": "seqpar_window_rollout",
        "shards": shards,
        "window_effective": W_eff,
        "frames": int(n),
        "ate_no_refine_m": round(ate_plain, 3),
        "ate_seqpar_m": round(ate_seqpar, 3),
        "finite": bool(fin_plain and fin_seqpar),
        "improvement_x": round(ate_plain / max(ate_seqpar, 1e-9), 2),
    }
    print(json.dumps(report))
    return 0 if (fin_plain and fin_seqpar and ate_seqpar < ate_plain) else 1


def run_multihost(args):
    """Weak-scaling harness: for each process count P, spawn P workers
    joined through a jax.distributed coordinator, each worker driving
    `--devices-per-proc` virtual CPU devices with one VO lane per device.
    Global work scales with P; ideal weak scaling keeps agg_fps/P flat."""
    import json
    import os
    import socket
    import subprocess
    import sys

    # Weak scaling is only meaningful if each process keeps the same compute
    # budget as the cluster grows: pin each worker to a disjoint, equal slice
    # of the machine's cores (on a pod, each worker IS its own host). With
    # more processes than cores the run is oversubscribed and flagged.
    cores = sorted(os.sched_getaffinity(0))
    counts = [int(x) for x in args.multihost.split(",")]
    # The budget is fixed by the LARGEST cluster in the sweep so every row
    # gives each process identical resources — otherwise the 1-process row
    # would hog the whole machine and fake a scaling loss.
    per = len(cores) // max(counts)
    rows = []
    for nproc in counts:
        pinnings = (
            [cores[i * per:(i + 1) * per] for i in range(nproc)]
            if per >= 1 else [None] * nproc
        )
        with socket.socket() as s:  # free port for this cluster
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={args.devices_per_proc}"
        )
        cmd = [
            sys.executable, "-m", "vo_tpu.parallel.multihost",
            "--coordinator", f"127.0.0.1:{port}",
            "--num-processes", str(nproc),
            "--steps", str(args.mh_steps),
            "--capacity", str(args.mh_capacity),
            "--repeats", str(args.mh_repeats),
        ]
        if args.mh_crop:
            cmd += ["--crop", args.mh_crop]
        procs = [
            subprocess.Popen(
                (["taskset", "-c", ",".join(map(str, pinnings[i]))]
                 if pinnings[i] else [])
                + cmd + ["--process-id", str(i)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
            for i in range(nproc)
        ]
        # A hung/dead worker must not orphan its siblings on the coordinator
        # port: kill the whole cluster on any failure and surface the
        # captured output instead of a bare returncode assert (ADVICE r2).
        outs = []
        try:
            for p in procs:
                so, se = p.communicate(timeout=900)
                outs.append(so)
                if p.returncode != 0:
                    raise RuntimeError(
                        f"multihost worker rc={p.returncode}\n"
                        f"--- stdout ---\n{so[-2000:]}\n"
                        f"--- stderr ---\n{se[-2000:]}"
                    )
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        rep = json.loads(
            [ln for ln in outs[0].splitlines() if ln.startswith("{")][-1]
        )
        rep["fps_per_process"] = round(rep["agg_fps"] / nproc, 3)
        rep["cores_per_process"] = per if per >= 1 else f"oversubscribed({len(cores)}/{nproc})"
        rows.append(rep)
        print(json.dumps(rep), flush=True)
    base = rows[0]["fps_per_process"]
    table = [
        {
            "processes": r["num_processes"],
            "devices": r["devices_global"],
            "lanes": r["lanes_global"],
            "agg_fps": r["agg_fps"],
            "weak_scaling_eff": round(r["fps_per_process"] / base, 3),
        }
        for r in rows
    ]
    print(json.dumps({"metric": "multihost_weak_scaling", "rows": table}))


def main(argv=None):
    args = parse_args(argv)
    if args.multihost:
        return run_multihost(args)
    if args.full:
        return run_full(args)
    if args.seqpar_shards:
        return run_seqpar(args)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from vo_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from vo_tpu.data import Sequence, ate_rmse
    from vo_tpu.data.evaluate import positions_from_poses
    from vo_tpu.models.pipeline import bootstrap
    from vo_tpu.parallel.mesh import make_mesh
    from vo_tpu.parallel.multiseq import (
        batched_vo_rollout,
        make_sharded_rollout,
        replicate_state,
        shard_batched_state,
    )
    from vo_tpu.utils.config import VOConfig

    cfg = VOConfig(capacity=args.capacity)

    def load(seq_id):
        seq = Sequence(args.dataset, path=args.data_root, kitti_sequence=seq_id)
        imgs = [jnp.asarray(seq.get_frame(i)) for i in range(len(seq))]
        return seq, imgs

    def frame_plan(n_imgs, steps):
        # Ping-pong frame order keeps motion physical on short sequences.
        order = list(range(3, n_imgs)) + list(range(n_imgs - 2, 0, -1)) + [1, 2]
        return (order * (steps // len(order) + 1))[:steps]

    def run_batch(seq_ids):
        b = len(seq_ids)
        loaded = [load(s) for s in seq_ids]
        K = jnp.asarray(loaded[0][0].K)
        Ks = jnp.broadcast_to(K, (b, 3, 3))
        mesh = make_mesh(n_data=min(b, len(jax.devices())), n_model=1)

        # Bootstrap each lane, then stack states along the batch axis.
        states = []
        for i, (seq, imgs) in enumerate(loaded):
            st, _ = bootstrap(imgs[0], imgs[2], K, cfg, jax.random.PRNGKey(2023 + i))
            states.append(st)
        batched = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *states
        ) if b > 1 else replicate_state(states[0], 1)
        batched = shard_batched_state(batched, mesh)

        plans = [frame_plan(len(imgs), args.steps) for (_, imgs) in loaded]
        stack = jnp.stack(
            [
                jnp.stack([loaded[i][1][f] for i, plan in enumerate(plans) for f in [plan[n]]])
                for n in range(args.steps)
            ]
        )  # (N, B, H, W)

        # shard_map keeps every lane's while-loops/top_k device-local (no
        # SPMD collectives — see make_sharded_rollout); GSPMD fallback when
        # lanes don't divide the mesh.
        if b % mesh.shape["data"] == 0:
            sharded = make_sharded_rollout(mesh, cfg)
            rollout = lambda s, im, k: sharded(s, im, k)  # noqa: E731
        else:
            rollout = lambda s, im, k: batched_vo_rollout(s, im, k, cfg)  # noqa: E731
        w_state, w_out = rollout(batched, stack, Ks)
        np.asarray(w_out.pose[-1])  # warmup fetch
        t0 = time.perf_counter()
        _, outs = rollout(batched, stack, Ks)
        np.asarray(outs.pose[-1])
        dt = time.perf_counter() - t0
        agg_fps = args.steps * b / dt

        # Per-lane ATE over the true forward pass (frames 3..len-1).
        ates = []
        for i, (seq, imgs) in enumerate(loaded):
            if seq.gt_poses is None:
                ates.append(None)
                continue
            # Clamp to the frames the rollout actually executed: the scan ran
            # args.steps frames, of which only the first len(imgs)-3 are the
            # true forward pass (the rest is ping-pong replay).
            fwd = min(len(imgs) - 3, args.steps)
            est = np.concatenate(
                [
                    np.stack([np.eye(4, dtype=np.float32), np.asarray(states[i].pose)]),
                    np.asarray(outs.pose[:fwd, i]),
                ]
            )
            gt = seq.gt_poses[[0, 2] + list(range(3, 3 + fwd))]
            ates.append(
                round(float(ate_rmse(positions_from_poses(est), positions_from_poses(gt))), 5)
            )
        return agg_fps, ates

    if args.sweep:
        rows = []
        base = None
        for b in [int(x) for x in args.sweep.split(",")]:
            fps, _ = run_batch([args.sequences.split(",")[0]] * b)
            base = base or fps
            rows.append({"batch": b, "agg_fps": round(fps, 2),
                         "scaling": round(fps / base, 3)})
            print(json.dumps(rows[-1]), flush=True)
        print(json.dumps({"metric": "multiseq_scaling", "rows": rows}))
    else:
        seq_ids = args.sequences.split(",")
        fps, ates = run_batch(seq_ids)
        print(
            json.dumps(
                {
                    "metric": "multiseq_throughput",
                    "batch": len(seq_ids),
                    "agg_fps": round(fps, 2),
                    "ate_rmse_m": ates,
                    "device": str(jax.devices()[0]),
                }
            )
        )


if __name__ == "__main__":
    main()
