"""Reproduce bench.py's measure loop with per-step timing (fresh process)."""
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


def main():
    seq = Sequence("kitti", path=DATA_ROOT, kitti_sequence="05")
    cfg = VOConfig(capacity=1024)
    K = jnp.asarray(seq.K)
    imgs = [jnp.asarray(seq.get_frame(i)) for i in range(len(seq))]
    print("device:", jax.devices()[0], flush=True)

    t0 = time.perf_counter()
    state, out = bootstrap(imgs[0], imgs[2], K, cfg, jax.random.PRNGKey(2023))
    jax.block_until_ready(state)
    print(f"bootstrap (incl compile): {time.perf_counter()-t0:.1f}s", flush=True)

    order = list(range(3, len(imgs))) + list(range(len(imgs) - 2, 0, -1)) + [1, 2]
    frame_iter = (order * 20)[:20]

    for i, f in enumerate(frame_iter):
        t0 = time.perf_counter()
        state, out = vo_step(state, imgs[f], K, cfg)
        t_disp = time.perf_counter() - t0
        jax.block_until_ready(out.pose)
        t_tot = time.perf_counter() - t0
        print(f"step {i:2d} frame {f}: dispatch {t_disp*1e3:8.1f} ms  total {t_tot*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
