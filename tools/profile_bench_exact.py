"""Exact replica of bench.py's flow with phase timing prints."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

DATA_ROOT = "/root/reference/tests/test_data"
WARMUP_STEPS = 5
MEASURE_STEPS = 40


def main():
    from vo_tpu.data import Sequence, ate_rmse
    from vo_tpu.data.evaluate import positions_from_poses
    from vo_tpu.models.pipeline import bootstrap, vo_step
    from vo_tpu.utils.config import VOConfig

    seq = Sequence("kitti", path=DATA_ROOT, kitti_sequence="05")
    cfg = VOConfig(capacity=1024)
    K = jnp.asarray(seq.K)
    imgs = [jnp.asarray(seq.get_frame(i)) for i in range(len(seq))]

    t = time.perf_counter()
    state, out = bootstrap(imgs[0], imgs[2], K, cfg, jax.random.PRNGKey(2023))
    jax.block_until_ready(state)
    print(f"bootstrap: {time.perf_counter()-t:.1f}s", flush=True)

    order = list(range(3, len(imgs))) + list(range(len(imgs) - 2, 0, -1)) + [1, 2]
    frame_iter = (order * 20)[: WARMUP_STEPS + MEASURE_STEPS]

    poses = [np.eye(4, dtype=np.float32), np.asarray(state.pose)]
    frame_ids = [0, 2]

    t = time.perf_counter()
    for i, f in enumerate(frame_iter[:WARMUP_STEPS]):
        state, out = vo_step(state, imgs[f], K, cfg)
        if i < 3:
            poses.append(np.asarray(out.pose))
            frame_ids.append(f)
    jax.block_until_ready(out.pose)
    print(f"warmup: {time.perf_counter()-t:.1f}s", flush=True)

    t0 = time.perf_counter()
    for j, f in enumerate(frame_iter[WARMUP_STEPS:]):
        td = time.perf_counter()
        state, out = vo_step(state, imgs[f], K, cfg)
        td = time.perf_counter() - td
        if td > 0.1:
            print(f"  measure dispatch {j} (frame {f}) took {td:.2f}s", flush=True)
    tb = time.perf_counter()
    jax.block_until_ready(out.pose)
    print(f"final block: {time.perf_counter()-tb:.2f}s", flush=True)
    dt = time.perf_counter() - t0
    print(f"measure loop: {dt:.2f}s -> {MEASURE_STEPS/dt:.3f} fps", flush=True)


if __name__ == "__main__":
    main()
