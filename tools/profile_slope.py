"""True per-step device time: enqueue N chained steps, one D2H fetch.
Slope of total time vs N = real per-step compute (amortizes the tunnel RTT).
Run as: python tools/profile_slope.py N
(fresh process per N — D2H poisons pipelined mode)."""
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


def main(n):
    seq = Sequence("kitti", path=DATA_ROOT, kitti_sequence="05")
    cfg = VOConfig(capacity=1024)
    K = jnp.asarray(seq.K)
    imgs = [jnp.asarray(seq.get_frame(i)) for i in range(len(seq))]
    frames = ((list(range(3, 6)) + [4, 3, 2, 1, 2]) * 40)[:n]

    state, out = bootstrap(imgs[0], imgs[2], K, cfg, jax.random.PRNGKey(2023))
    st, out = vo_step(state, imgs[3], K, cfg)
    jax.block_until_ready(out.pose)  # compile barrier (enqueue-complete at least)
    # settle: give the remote queue time to drain bootstrap+1 step
    time.sleep(30)

    t0 = time.perf_counter()
    for f in frames:
        state, out = vo_step(state, imgs[f], K, cfg)
    t_enq = time.perf_counter() - t0
    p = np.asarray(out.pose)  # ONE D2H — waits for the whole chain
    t_tot = time.perf_counter() - t0
    print(f"n={n}: enqueue {t_enq:.3f}s, total-to-fetch {t_tot:.3f}s", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]))
