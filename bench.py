#!/usr/bin/env python
"""Benchmark: steady-state per-frame throughput of the full jitted VO
pipeline on real hardware, KITTI 05 imagery.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: the reference pipeline's best published no-plotting throughput,
10-15 fps on an Apple M2 (Report.pdf §3/§3.1.3; BASELINE.md) -> 15 fps.

Measurement shape: the whole frame loop runs ON DEVICE as a lax.scan
(`vo_rollout`) — one launch + one device->host fetch per chunk, which is
both how the framework is meant to be deployed (no per-frame host
round-trips) and the only honest timing through a remote-device transport.
The 6-frame micro-dataset is looped ping-pong (0..5..0) so frame-to-frame
motion stays physical while giving an arbitrarily long steady-state run.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from vo_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

BASELINE_FPS = 15.0  # reference, M2 MacBook Air, plotting disabled
DATA_ROOT = "/root/reference/tests/test_data"
MEASURE_STEPS = 40


def main():
    from vo_tpu.data import Sequence, ate_rmse
    from vo_tpu.data.evaluate import positions_from_poses
    from vo_tpu.models.pipeline import bootstrap, vo_rollout
    from vo_tpu.utils.config import VOConfig

    seq = Sequence("kitti", path=DATA_ROOT, kitti_sequence="05")
    # 512 slots = the reference KLT front-end's operating point (klt.py:24
    # maxCorners=500). ATE on the micro-dataset is the same as at 1024
    # (16 mm); throughput is ~1.6x higher.
    cfg = VOConfig(capacity=512)
    K = jnp.asarray(seq.K)
    imgs = [jnp.asarray(seq.get_frame(i)) for i in range(len(seq))]
    device = str(jax.devices()[0])

    state, out = bootstrap(imgs[0], imgs[2], K, cfg, jax.random.PRNGKey(2023))

    # Ping-pong frame order: 3,4,5,4,3,2,1,2,3,... (physical motion).
    order = list(range(3, len(imgs))) + list(range(len(imgs) - 2, 0, -1)) + [1, 2]
    frames = (order * 20)[:MEASURE_STEPS]
    stack = jnp.stack([imgs[f] for f in frames])

    # Warmup: compiles bootstrap+rollout, flushes the device queue, and (on
    # tunneled devices) settles the transport into its steady execution mode.
    w_state, w_outs = vo_rollout(state, stack, K, cfg)
    np.asarray(w_outs.pose[-1])

    t0 = time.perf_counter()
    _, outs = vo_rollout(state, stack, K, cfg)
    last = np.asarray(outs.pose[-1])  # single fetch ends the timed section
    dt = time.perf_counter() - t0
    fps = MEASURE_STEPS / dt

    # Accuracy spot-check on the true forward pass (frames 3..5 of the scan).
    ate = None
    if seq.gt_poses is not None:
        est = np.concatenate(
            [
                np.stack([np.eye(4, dtype=np.float32), np.asarray(state.pose)]),
                np.asarray(outs.pose[:3]),
            ]
        )
        gt = seq.gt_poses[[0, 2, 3, 4, 5]]
        ate = ate_rmse(positions_from_poses(est), positions_from_poses(gt))

    print(
        json.dumps(
            {
                "metric": "vo_step_throughput_kitti05",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "device": device,
                "ate_rmse_m": None if ate is None else round(float(ate), 5),
                "capacity": cfg.capacity,
                "steps": MEASURE_STEPS,
            }
        )
    )


if __name__ == "__main__":
    main()
