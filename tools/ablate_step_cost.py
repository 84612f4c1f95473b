#!/usr/bin/env python
"""In-scan step-cost ablation: where do the ~11 ms/frame of vo_rollout go?

Standalone kernel timings are launch-bound through the axon tunnel
(~25 us floor), so the only honest attribution of the rollout's per-frame
cost is differential: run the SAME full-sequence scan with one component
dialed down at a time and report the fps/ms deltas.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vo_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from vo_tpu.data import Sequence  # noqa: E402
from vo_tpu.models.pipeline import bootstrap, vo_rollout  # noqa: E402
from vo_tpu.utils.config import VOConfig  # noqa: E402


def run(cfg, imgs, K, steps_cap=150):
    state, _ = bootstrap(
        jnp.asarray(imgs[0]), jnp.asarray(imgs[2]), K, cfg,
        jax.random.PRNGKey(2023),
    )
    stack = jnp.asarray(imgs[3 : 3 + steps_cap])
    steps = stack.shape[0]
    _, w = vo_rollout(state, stack, K, cfg)
    jax.block_until_ready(w.pose)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _, outs = vo_rollout(state, stack, K, cfg)
        jax.block_until_ready(outs.pose)
        best = min(best, time.perf_counter() - t0)
    return steps / best, best / steps * 1e3


def main():
    seq = Sequence("synthetic", path="./data")
    K = jnp.asarray(seq.K)
    print("loading frames...", flush=True)
    imgs = np.stack([np.asarray(seq.get_frame(i)) for i in range(160)])
    print("loaded", flush=True)

    base = VOConfig(capacity=1024)
    variants = [
        ("default", base),
        ("ba off", dataclasses.replace(base, ba=dataclasses.replace(base.ba, enabled=False))),
        ("ba iters 5->1", dataclasses.replace(base, ba=dataclasses.replace(base.ba, iters=1))),
        ("ba window 6->4", dataclasses.replace(base, ba=dataclasses.replace(base.ba, window=4))),
        ("pnp hyp 256->64", dataclasses.replace(base, pnp=dataclasses.replace(base.pnp, num_hypotheses=64))),
        ("pnp refine 10->3", dataclasses.replace(base, pnp=dataclasses.replace(base.pnp, refine_iters=3))),
        ("klt iters 10->5", dataclasses.replace(base, klt=dataclasses.replace(base.klt, max_iters=5))),
        ("no motion predict", dataclasses.replace(base, klt=dataclasses.replace(base.klt, predict_motion=False))),
        ("recovery off", dataclasses.replace(base, recovery=dataclasses.replace(base.recovery, enabled=False))),
    ]
    print(f"device: {jax.devices()[0]}  (150 steps, 640x480, cap 1024)", flush=True)
    base_ms = None
    for name, cfg in variants:
        try:
            fps, ms = run(cfg, imgs, K)
        except KeyboardInterrupt:
            raise
        except Exception as e:  # config knob absent etc.
            import traceback
            print(f"{name:22s} FAILED: {type(e).__name__}: {e}")
            traceback.print_exc()
            continue
        delta = "" if base_ms is None else f"  delta {base_ms - ms:+6.2f} ms"
        if base_ms is None:
            base_ms = ms
        print(f"{name:22s} {fps:7.1f} fps  {ms:6.2f} ms/frame{delta}", flush=True)


if __name__ == "__main__":
    main()
