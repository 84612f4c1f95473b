"""Final breakdown: what remains in vo_step at capacity 512."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from vo_tpu.data import Sequence
from vo_tpu.models.pipeline import bootstrap, vo_step
from vo_tpu.utils.config import VOConfig
import dataclasses

def device_loop_time(name, step_fn, init, n=40):
    @jax.jit
    def run(c):
        return jax.lax.scan(lambda cc, _: (step_fn(cc), 0.0), c, None, length=n)[0]
    out = run(init); np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    best = np.inf
    for _ in range(3):
        t = time.perf_counter(); out = run(init)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        best = min(best, (time.perf_counter()-t)/n)
    print(f"{name:40s} {best*1e3:8.3f} ms/iter", flush=True)

seq = Sequence("kitti", path="/root/reference/tests/test_data", kitti_sequence="05")
K = jnp.asarray(seq.K)
imgs = [jnp.asarray(seq.get_frame(i)) for i in range(len(seq))]

for cap in (512,):
    cfg = VOConfig(capacity=cap)
    state, _ = bootstrap(imgs[0], imgs[2], K, cfg, jax.random.PRNGKey(2023))
    device_loop_time(f"vo_step cap={cap} (full)", lambda st: vo_step(st, imgs[3], K, cfg)[0], state)
    cfg_noba = dataclasses.replace(cfg, ba=dataclasses.replace(cfg.ba, enabled=False))
    st2, _ = bootstrap(imgs[0], imgs[2], K, cfg_noba, jax.random.PRNGKey(2023))
    device_loop_time(f"vo_step cap={cap} (no BA)", lambda st: vo_step(st, imgs[3], K, cfg_noba)[0], st2)
    cfg_klt1 = dataclasses.replace(cfg, klt=dataclasses.replace(cfg.klt, pyramid_levels=1))
    st3, _ = bootstrap(imgs[0], imgs[2], K, cfg_klt1, jax.random.PRNGKey(2023))
    device_loop_time(f"vo_step cap={cap} (1-level LK)", lambda st: vo_step(st, imgs[3], K, cfg_klt1)[0], st3)
