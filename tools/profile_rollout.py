"""Per-step compute via on-device scan rollouts, measured in sync mode."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from vo_tpu.data import Sequence
from vo_tpu.models.pipeline import bootstrap, vo_rollout, vo_step
from vo_tpu.utils.config import VOConfig

DATA_ROOT = "/root/reference/tests/test_data"


def main():
    seq = Sequence("kitti", path=DATA_ROOT, kitti_sequence="05")
    cfg = VOConfig(capacity=1024)
    K = jnp.asarray(seq.K)
    imgs = [jnp.asarray(seq.get_frame(i)) for i in range(len(seq))]
    frames = (list(range(3, 6)) + [4, 3, 2, 1, 2]) * 5

    state, out = bootstrap(imgs[0], imgs[2], K, cfg, jax.random.PRNGKey(2023))
    np.asarray(out.pose)  # enter steady sync mode (pays the one-time flush)
    print("sync mode entered", flush=True)

    # single-step sync launches
    st = state
    for i in range(3):
        t = time.perf_counter()
        st, out = vo_step(st, imgs[3], K, cfg)
        np.asarray(out.pose)
        print(f"vo_step sync launch {i}: {time.perf_counter()-t:.3f}s", flush=True)

    for n in (5, 20, 40):
        stack = jnp.stack([imgs[f] for f in frames[:n]])
        jax.block_until_ready(stack)
        t = time.perf_counter()
        st2, outs = vo_rollout(state, stack, K, cfg)
        np.asarray(outs.pose[-1])
        dt = time.perf_counter() - t
        print(f"rollout n={n:3d} (first, incl compile): {dt:7.2f}s", flush=True)
        t = time.perf_counter()
        st2, outs = vo_rollout(state, stack, K, cfg)
        np.asarray(outs.pose[-1])
        dt = time.perf_counter() - t
        print(f"rollout n={n:3d}: {dt:7.3f}s total, {dt/n*1e3:8.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
