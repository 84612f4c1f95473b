"""Which D2H patterns degrade the axon stream, and does it recover?"""
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
    print(f"{label}: {dt:7.2f}s, {dt/len(frames)*1e3:8.2f} ms/step", flush=True)
    return state, out


def main():
    seq = Sequence("kitti", path=DATA_ROOT, kitti_sequence="05")
    cfg = VOConfig(capacity=1024)
    K = jnp.asarray(seq.K)
    imgs = [jnp.asarray(seq.get_frame(i)) for i in range(len(seq))]
    frames = (list(range(3, 6)) + [4, 3, 2, 1, 2]) * 5  # 40

    state0, out = bootstrap(imgs[0], imgs[2], K, cfg, jax.random.PRNGKey(2023))
    jax.block_until_ready(state0)
    st, out = vo_step(state0, imgs[3], K, cfg)
    jax.block_until_ready(out.pose)
    print("compiled", flush=True)

    st, out = measure(state0, imgs, K, cfg, frames, "baseline-1 (no D2H yet)")

    # 1. read of a READY buffer (already blocked)
    t = time.perf_counter()
    p = np.asarray(out.pose)
    print(f"np.asarray(ready pose): {time.perf_counter()-t:.3f}s", flush=True)
    st, out = measure(state0, imgs, K, cfg, frames, "after ready-read")

    # 2. async copy then read
    st2, out2 = vo_step(state0, imgs[3], K, cfg)
    try:
        out2.pose.copy_to_host_async()
    except Exception as e:
        print("copy_to_host_async failed:", e, flush=True)
    jax.block_until_ready(out2.pose)
    p = np.asarray(out2.pose)
    st, out = measure(state0, imgs, K, cfg, frames, "after async-copy read")

    # 3. read of an IN-FLIGHT buffer (the bench pattern)
    st3, out3 = vo_step(state0, imgs[3], K, cfg)
    t = time.perf_counter()
    p = np.asarray(out3.pose)
    print(f"np.asarray(in-flight pose): {time.perf_counter()-t:.3f}s", flush=True)
    st, out = measure(state0, imgs, K, cfg, frames, "after in-flight read")

    # 4. recovery check after some idle + pure-device work
    for _ in range(3):
        st, out = measure(state0, imgs, K, cfg, frames, "recovery check")


if __name__ == "__main__":
    main()
