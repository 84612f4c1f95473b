#!/usr/bin/env python
"""KITTI-sized throughput probe under feature toggles.

The like-for-like probe regressed across rounds (r1 134.8 -> r2 120.0 fps)
while features landed in the step (constant-velocity LK warp seeding,
two-tier lost-pose recovery, adaptive-KF machinery). This tool measures the
probe with each feature toggled so every fps point has a line-item owner
(VERDICT r2 item 7). Same methodology as bench.py's bench_kitti_probe:
512-slot capacity, 370x1226 real KITTI frames, 40-step ping-pong rollout.

Usage: python tools/probe_ablate.py [--steps 40]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KITTI_ROOT = "/root/reference/tests/test_data"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax

    from vo_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from vo_tpu.data import Sequence
    from vo_tpu.models.pipeline import bootstrap, vo_rollout
    from vo_tpu.utils.config import (
        BAConfig, KLTConfig, RecoveryConfig, VOConfig,
    )

    seq = Sequence("kitti", path=KITTI_ROOT, kitti_sequence="05")
    K = jnp.asarray(seq.K)
    imgs = [jnp.asarray(seq.get_frame(i)) for i in range(len(seq))]
    order = list(range(3, len(imgs))) + list(range(len(imgs) - 2, 0, -1)) + [1, 2]
    frames = (order * 20)[: args.steps]
    stack = jnp.stack([imgs[f] for f in frames])

    base = VOConfig(capacity=512)
    variants = {
        "default": base,
        "no_recovery": dataclasses.replace(
            base, recovery=RecoveryConfig(enabled=False)),
        "no_predict_motion": dataclasses.replace(
            base, klt=KLTConfig(predict_motion=False)),
        "kf_adaptive": dataclasses.replace(
            base, ba=BAConfig(keyframe_mode="adaptive")),
        "no_ba": dataclasses.replace(base, ba=BAConfig(enabled=False)),
        "r1_like": dataclasses.replace(
            base,
            recovery=RecoveryConfig(enabled=False),
            klt=KLTConfig(predict_motion=False),
        ),
    }
    rows = {}
    for name, cfg in variants.items():
        state, _ = bootstrap(imgs[0], imgs[2], K, cfg, jax.random.PRNGKey(2023))
        _, w = vo_rollout(state, stack, K, cfg)  # compile + warmup
        np.asarray(w.pose[-1])
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            _, outs = vo_rollout(state, stack, K, cfg)
            np.asarray(outs.pose[-1])
            best = min(best, time.perf_counter() - t0)
        rows[name] = round(args.steps / best, 2)
        print(json.dumps({"variant": name, "fps": rows[name]}), flush=True)
    print(json.dumps({
        "metric": "kitti_probe_ablation",
        "device": str(jax.devices()[0]),
        "fps": rows,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
