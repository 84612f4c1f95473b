"""Tight on-device timing: run each op N times inside one lax.scan launch
(dependency-chained to prevent CSE/DCE), fetch once. Removes tunnel noise."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from vo_tpu.ops.harris import (
    nms_masked_response, select_from_masked, shi_tomasi_response,
)
from vo_tpu.ops.pallas_kernels import corner_response_nms
from vo_tpu.ops.pnp import pnp_ransac
from vo_tpu.ops.klt import pyramidal_lk
from vo_tpu.ops.image import build_pyramid

N_REPS = 50


def device_loop_time(name, step_fn, init, n=N_REPS):
    """step_fn: carry -> carry. Times n chained applications on device."""

    @jax.jit
    def run(c):
        return jax.lax.scan(lambda cc, _: (step_fn(cc), 0.0), c, None, length=n)[0]

    out = run(init)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    best = np.inf
    for _ in range(3):
        t = time.perf_counter()
        out = run(init)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        best = min(best, (time.perf_counter() - t) / n)
    print(f"{name:44s} {best*1e3:9.3f} ms/iter", flush=True)


key = jax.random.PRNGKey(0)
img = 127.0 + 60.0 * jax.random.normal(key, (370, 1226), jnp.float32)

# Detection: carry the image, add a tiny data dependency each rep.
def xla_det(im):
    kp = select_from_masked(
        nms_masked_response(shi_tomasi_response(im, 7), 8), 1024, border=16,
        quality_level=0.01)
    return im + kp.score[0] * 1e-20

def pallas_det(im):
    kp = select_from_masked(
        corner_response_nms(im, "shi_tomasi", 7, 0.08, 8), 1024, border=16,
        quality_level=0.01)
    return im + kp.score[0] * 1e-20

device_loop_time("XLA detect (resp+NMS17x17+topk)", xla_det, img)
device_loop_time("PALLAS detect (fused+topk)", pallas_det, img)

# PnP
Np = 1024
X = jax.random.uniform(key, (Np, 3), jnp.float32, -5, 5) + jnp.asarray([0, 0, 15.0])
K = jnp.asarray([[707.0, 0, 601.0], [0, 707.0, 183.0], [0, 0, 1.0]], jnp.float32)
uvh = (K @ X.T).T
uv = uvh[:, :2] / uvh[:, 2:]

def pnp_step(carry):
    k, x = carry
    k1, k2 = jax.random.split(k)
    res = pnp_ransac(k1, x, uv, K, num_hypotheses=256, refine_iters=10)
    return k2, x + res.T_cw[0, 0] * 1e-20

device_loop_time("pnp_ransac 256hyp+refine (triad)", pnp_step, (key, X))

# LK
img2 = 127.0 + 60.0 * jax.random.normal(jax.random.PRNGKey(2), (370, 1226), jnp.float32)
pyr1 = tuple(build_pyramid(img, 3))
pyr2 = tuple(build_pyramid(img2, 3))
xy = jnp.stack([
    jax.random.uniform(key, (1024,), jnp.float32, 30, 1190),
    jax.random.uniform(jax.random.PRNGKey(3), (1024,), jnp.float32, 30, 340),
], -1)

def lk_step(p):
    tr = pyramidal_lk(list(pyr1), list(pyr2), p, radius=8)
    return p + tr.err[:, None] * 1e-20

device_loop_time("pyramidal_lk 1024", lk_step, xy)

# Full vo_step
from vo_tpu.models.pipeline import bootstrap, vo_step
from vo_tpu.utils.config import VOConfig
from vo_tpu.data import Sequence

seq = Sequence("kitti", path="/root/reference/tests/test_data", kitti_sequence="05")
cfg = VOConfig(capacity=1024)
Kk = jnp.asarray(seq.K)
imgs = [jnp.asarray(seq.get_frame(i)) for i in range(len(seq))]
state, _ = bootstrap(imgs[0], imgs[2], Kk, cfg, jax.random.PRNGKey(2023))

def step_fn(st):
    new, out = vo_step(st, imgs[3], Kk, cfg)
    return new

device_loop_time("FULL vo_step (pallas detect)", step_fn, state, n=30)

import dataclasses
cfg2 = dataclasses.replace(cfg, detector=dataclasses.replace(cfg.detector, use_pallas=False))

def step_fn2(st):
    new, out = vo_step(st, imgs[3], Kk, cfg2)
    return new

device_loop_time("FULL vo_step (xla detect)", step_fn2, state, n=30)
