#!/usr/bin/env python
"""Root-cause harness for the r3 bench-vs-EVAL ATE split (VERDICT r3 weak #1).

Runs the exact bench.py headline program (full 600-frame device-resident
vo_rollout) twice at HEAD — Pallas DMA patch gather ON vs OFF — so the one
hot-path change between the 0.78 m commit (1e7fdb6) and the 1.35 m bench
(002bee2 gather rework) is isolated directly on the deployment shapes.

Usage: python tools/repro_headline.py [--also-detect]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from vo_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def run(cfg, imgs, K, gt_poses):
    from vo_tpu.data import ate_rmse, rpe
    from vo_tpu.data.evaluate import positions_from_poses
    from vo_tpu.models.pipeline import bootstrap, vo_rollout

    state, _ = bootstrap(
        jnp.asarray(imgs[0]), jnp.asarray(imgs[2]), K, cfg,
        jax.random.PRNGKey(2023),
    )
    stack = jnp.asarray(imgs[3:])
    steps = stack.shape[0]
    t0 = time.perf_counter()
    _, outs = vo_rollout(state, stack, K, cfg)  # compile + run (ATE only:
    jax.block_until_ready(outs.pose)           # fps here includes compile)
    dt = time.perf_counter() - t0

    est = np.concatenate(
        [
            np.stack([np.eye(4, dtype=np.float32), np.asarray(state.pose)]),
            np.asarray(outs.pose),
        ]
    )
    gt = gt_poses[[0, 2] + list(range(3, 3 + steps))]
    ate = float(ate_rmse(positions_from_poses(est), positions_from_poses(gt)))
    t_rpe, r_rpe = rpe(est, gt)
    return {
        "fps": round(steps / dt, 2),
        "ate_rmse_m": round(ate, 4),
        "rpe_trans_m": round(float(t_rpe), 5),
        "rpe_rot_deg": round(float(r_rpe) * 57.29578, 5),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--also-detect", action="store_true",
                    help="also toggle the detect-side Pallas kernel")
    args = ap.parse_args()

    from vo_tpu.data import Sequence
    from vo_tpu.utils.config import VOConfig

    seq = Sequence("synthetic", path="./data")
    K = jnp.asarray(seq.K)
    imgs = np.stack([np.asarray(seq.get_frame(i)) for i in range(len(seq))])

    base = VOConfig(capacity=1024)
    variants = {
        "pallas_auto(default)": base,
        "klt_pallas_off": dataclasses.replace(
            base, klt=dataclasses.replace(base.klt, use_pallas=False)),
    }
    if args.also_detect:
        variants["detect_pallas_off"] = dataclasses.replace(
            base, detector=dataclasses.replace(base.detector, use_pallas=False))
        variants["all_pallas_off"] = dataclasses.replace(
            base,
            klt=dataclasses.replace(base.klt, use_pallas=False),
            detector=dataclasses.replace(base.detector, use_pallas=False),
        )

    out = {"device": str(jax.devices()[0])}
    for name, cfg in variants.items():
        res = run(cfg, imgs, K, seq.gt_poses)
        out[name] = res
        print(f"{name}: {res}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
