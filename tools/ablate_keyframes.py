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

    spec = dataclasses.replace(
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
    generate(os.path.join(args.data_root, "parking"), spec)
    seq = Sequence("parking", path=args.data_root)
    K = jnp.asarray(seq.K)
    n = len(seq)
    imgs = jnp.asarray(np.stack([np.asarray(seq.get_frame(i)) for i in range(3, n)]))
    img0, img2 = jnp.asarray(seq.get_frame(0)), jnp.asarray(seq.get_frame(2))
    gt = seq.gt_poses

    from vo_tpu.models.pipeline import bootstrap, vo_step
    from vo_tpu.utils.config import BAConfig, VOConfig

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

    print(f"[stopgo] {n} frames, two 45-frame stops, two 90-deg turns")
    trial("every3", BAConfig(keyframe_mode="every", keyframe_every=3))
    trial("adaptive", BAConfig(keyframe_mode="adaptive"))
    trial("no-ba", BAConfig(enabled=False))


if __name__ == "__main__":
    main()
