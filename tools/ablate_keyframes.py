#!/usr/bin/env python
"""Keyframe-policy ablation: fixed cadence vs motion/covisibility-adaptive.

Renders (once) a stop-and-go city sequence — straights, two 90-degree
turns, and two 45-frame traffic stops (the reference's Malaga drive has
exactly these; its Report 3.1.2 failure is turn+stop territory) — then
rolls the full sequence on device under each keyframe policy and prints
ATE / keyframe count / fps per policy.

The stop is the scenario fixed-cadence keyframing cannot survive in
monocular BA: at zero baseline, every pushed keyframe shrinks the window's
physical span toward zero, the gauge pair degenerates, and scale drifts.
Adaptive selection (baseline/rotation/covisibility-gated) simply stops
pushing keyframes while the camera is stopped.

Usage: python tools/ablate_keyframes.py [--platform tpu|cpu] [--frames 400]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", choices=["tpu", "cpu"], default="tpu")
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--data-root", default="./data/stopgo")
    ap.add_argument(
        "--scenario", choices=["stopgo", "headline", "both"], default="both",
        help="stopgo: stop-and-go city (adaptive's home turf); headline: "
        "the default 600-frame no-stop sequence bench.py measures",
    )
    ap.add_argument("--min-baseline-ratio", type=float, default=None)
    ap.add_argument("--min-covisibility", type=float, default=None)
    ap.add_argument("--max-gap", type=int, default=None)
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from vo_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from vo_tpu.data import Sequence, ate_rmse
    from vo_tpu.data.evaluate import positions_from_poses
    from vo_tpu.data.synthetic import DEFAULT_SPEC, PathSpec, generate
    import dataclasses
    import os

    from vo_tpu.models.pipeline import bootstrap, vo_step
    from vo_tpu.utils.config import BAConfig, VOConfig

    stopgo_spec = dataclasses.replace(
        DEFAULT_SPEC,
        num_frames=args.frames,
        path=PathSpec(
            segments=(
                ("straight", 40.0),
                ("turn", 90.0, 8.0),
                ("straight", 35.0),
                ("turn", -90.0, 8.0),
                ("straight", 30.0),
            ),
            stops=((70, 45), (240, 45)),
        ),
    )

    def load(root, spec):
        if spec is not None:
            generate(os.path.join(root, "parking"), spec)
            seq = Sequence("parking", path=root)
        else:
            seq = Sequence("synthetic", path=root)  # DEFAULT_SPEC headline
        K = jnp.asarray(seq.K)
        n = len(seq)
        imgs = jnp.asarray(
            np.stack([np.asarray(seq.get_frame(i)) for i in range(3, n)])
        )
        img0, img2 = jnp.asarray(seq.get_frame(0)), jnp.asarray(seq.get_frame(2))
        return K, n, imgs, img0, img2, seq.gt_poses

    def adaptive_cfg():
        kw = {}
        if args.min_baseline_ratio is not None:
            kw["min_baseline_ratio"] = args.min_baseline_ratio
        if args.min_covisibility is not None:
            kw["min_covisibility"] = args.min_covisibility
        if args.max_gap is not None:
            kw["max_gap"] = args.max_gap
        return BAConfig(keyframe_mode="adaptive", **kw)

    def run_scenario(title, K, n, imgs, img0, img2, gt):
        @partial(jax.jit, static_argnames=("c",))
        def roll(st, imgs, c):
            def body(s, im):
                s2, out = vo_step(s, im, K, c)
                return s2, (s2.last_kf_idx, out.pose, out.pose_ok)
            return jax.lax.scan(body, st, imgs)

        def trial(name, ba):
            cfg = VOConfig(capacity=1024, ba=ba)
            st, _ = bootstrap(img0, img2, K, cfg, jax.random.PRNGKey(2023))
            _, (kf, poses, ok) = roll(st, imgs, cfg)  # compile + warmup
            jax.block_until_ready(poses)
            t0 = time.perf_counter()
            _, (kf, poses, ok) = roll(st, imgs, cfg)
            jax.block_until_ready(poses)
            dt = time.perf_counter() - t0
            est = np.concatenate(
                [np.stack([np.eye(4, dtype=np.float32), np.asarray(st.pose)]),
                 np.asarray(poses)]
            )
            g = gt[[0, 2] + list(range(3, n))]
            ate = ate_rmse(positions_from_poses(est), positions_from_poses(g))
            n_kf = len(set(np.asarray(kf).tolist()))
            n_fb = int((~np.asarray(ok)).sum())
            print(f"{name:>10}: ATE {ate:7.3f} m   keyframes {n_kf:4d}   "
                  f"fallbacks {n_fb:3d}   fps {(n - 3) / dt:6.1f}")
            return ate

        print(title)
        trial("every3", BAConfig(keyframe_mode="every", keyframe_every=3))
        trial("adaptive", adaptive_cfg())
        trial("no-ba", BAConfig(enabled=False))

    if args.scenario in ("stopgo", "both"):
        run_scenario(
            f"[stopgo] {args.frames} frames, two 45-frame stops, two 90-deg turns",
            *load(args.data_root, stopgo_spec),
        )
    if args.scenario in ("headline", "both"):
        run_scenario(
            "[headline] DEFAULT_SPEC 600 frames, no stops (the bench.py sequence)",
            *load("./data", None),
        )


if __name__ == "__main__":
    main()
