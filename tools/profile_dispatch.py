"""Dispatch-pattern timing: pipelined vs per-call-blocked vs sequential-dep."""
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
    print("device:", jax.devices()[0], flush=True)

    state0, _ = bootstrap(imgs[0], imgs[2], K, cfg, jax.random.PRNGKey(0))
    out = vo_step(state0, imgs[3], K, cfg)
    jax.block_until_ready(out)

    n = 20

    # A: same args, pipelined (no deps), single block at end
    t0 = time.perf_counter()
    outs = [vo_step(state0, imgs[3], K, cfg) for _ in range(n)]
    jax.block_until_ready(outs)
    print(f"A pipelined same-args:      {(time.perf_counter()-t0)/n*1e3:8.2f} ms/step", flush=True)

    # B: same args, block every call
    t0 = time.perf_counter()
    for _ in range(n):
        o = vo_step(state0, imgs[3], K, cfg)
        jax.block_until_ready(o)
    print(f"B blocked same-args:        {(time.perf_counter()-t0)/n*1e3:8.2f} ms/step", flush=True)

    # C: sequential dependency (state threads through), block at end
    order = (list(range(3, 6)) + [4, 3, 2, 1, 2]) * 3
    st = state0
    t0 = time.perf_counter()
    for f in order[:n]:
        st, o = vo_step(st, imgs[f], K, cfg)
    jax.block_until_ready(o)
    print(f"C sequential-dep:           {(time.perf_counter()-t0)/n*1e3:8.2f} ms/step", flush=True)

    # D: trivial jit round-trip latency
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(8)
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(f(x))
    print(f"D trivial jit blocked:      {(time.perf_counter()-t0)/n*1e3:8.2f} ms/call", flush=True)

    t0 = time.perf_counter()
    y = x
    for _ in range(n):
        y = f(y)
    jax.block_until_ready(y)
    print(f"E trivial jit seq-dep:      {(time.perf_counter()-t0)/n*1e3:8.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
