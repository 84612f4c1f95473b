"""Bisect which part of bench's pattern triggers the 576ms/step stall."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from vo_tpu.data import Sequence
from vo_tpu.models.pipeline import bootstrap, vo_step
from vo_tpu.utils.config import VOConfig

DATA_ROOT = "/root/reference/tests/test_data"


def measure(state, imgs, K, cfg, frames, label):
    t0 = time.perf_counter()
    for f in frames:
        state, out = vo_step(state, imgs[f], K, cfg)
    jax.block_until_ready(out.pose)
    dt = time.perf_counter() - t0
    n = len(frames)
    print(f"{label}: {dt:7.2f}s, {dt/n*1e3:8.2f} ms/step", flush=True)
    return state


def main():
    seq = Sequence("kitti", path=DATA_ROOT, kitti_sequence="05")
    cfg = VOConfig(capacity=1024)
    K = jnp.asarray(seq.K)
    imgs = [jnp.asarray(seq.get_frame(i)) for i in range(len(seq))]

    order = list(range(3, len(imgs))) + list(range(len(imgs) - 2, 0, -1)) + [1, 2]
    frame_iter = (order * 20)[:45]

    t = time.perf_counter()
    state, out = bootstrap(imgs[0], imgs[2], K, cfg, jax.random.PRNGKey(2023))
    jax.block_until_ready(state)
    print(f"bootstrap: {time.perf_counter()-t:.1f}s", flush=True)

    # bench-style warmup: 5 steps with np.asarray host reads on first 3
    t = time.perf_counter()
    for i, f in enumerate(frame_iter[:5]):
        state, out = vo_step(state, imgs[f], K, cfg)
        if i < 3:
            np.asarray(out.pose)
    jax.block_until_ready(out.pose)
    print(f"warmup: {time.perf_counter()-t:.1f}s", flush=True)

    state = measure(state, imgs, K, cfg, frame_iter[5:], "measure-1 (40)")
    state = measure(state, imgs, K, cfg, frame_iter[5:], "measure-2 (40)")
    state = measure(state, imgs, K, cfg, frame_iter[5:], "measure-3 (40)")


if __name__ == "__main__":
    main()
