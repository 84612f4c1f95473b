"""Find the async-dispatch queue-depth behavior through the axon tunnel."""
import sys
import time

sys.path.insert(0, "/root/repo")

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

    state0, out = bootstrap(imgs[0], imgs[2], K, cfg, jax.random.PRNGKey(2023))
    jax.block_until_ready(state0)
    st, out = vo_step(state0, imgs[3], K, cfg)
    jax.block_until_ready(out.pose)
    print("compiled", flush=True)

    order = (list(range(3, 6)) + [4, 3, 2, 1, 2]) * 20

    for n in (10, 20, 30, 40, 40, 40):
        st = state0
        t0 = time.perf_counter()
        for f in order[:n]:
            st, out = vo_step(st, imgs[f], K, cfg)
        jax.block_until_ready(out.pose)
        dt = time.perf_counter() - t0
        print(f"n={n:3d}: {dt:7.2f}s total, {dt/n*1e3:8.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
