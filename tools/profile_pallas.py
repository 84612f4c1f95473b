"""TPU timing: fused Pallas detection vs XLA chain + updated step parts."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from vo_tpu.ops.harris import (
    detect_keypoints, nms_masked_response, select_from_masked,
    shi_tomasi_response,
)
from vo_tpu.ops.pallas_kernels import corner_response_nms
from vo_tpu.ops.pnp import pnp_ransac


def sync_time(name, fn, *args, n=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    best = np.inf
    for _ in range(n):
        t = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        best = min(best, time.perf_counter() - t)
    print(f"{name:44s} {best*1e3:9.2f} ms", flush=True)
    return out


key = jax.random.PRNGKey(0)
noop = jax.jit(lambda x: x + 1.0)
sync_time("OVERHEAD noop", noop, jnp.zeros(8))

img = 127.0 + 60.0 * jax.random.normal(key, (370, 1226), jnp.float32)

xla_det = jax.jit(lambda im: select_from_masked(
    nms_masked_response(shi_tomasi_response(im, 7), 8), 1024, border=16,
    quality_level=0.01))
sync_time("XLA detect chain (resp+NMS+topk)", xla_det, img)

pallas_det = jax.jit(lambda im: select_from_masked(
    corner_response_nms(im, "shi_tomasi", 7, 0.08, 8), 1024, border=16,
    quality_level=0.01))
a = sync_time("PALLAS detect (fused kernel+topk)", pallas_det, img)

b = xla_det(img)
print("parity:", bool(jnp.array_equal(a.valid, b.valid)),
      bool(jnp.allclose(a.xy[a.valid], b.xy[b.valid])))

# PnP after the triad fix
N = 1024
X = jax.random.uniform(key, (N, 3), jnp.float32, -5, 5) + jnp.asarray([0, 0, 15.0])
K = jnp.asarray([[707.0, 0, 601.0], [0, 707.0, 183.0], [0, 0, 1.0]], jnp.float32)
uvh = (K @ X.T).T
uv = uvh[:, :2] / uvh[:, 2:]
sync_time("pnp_ransac 256hyp (triad)", jax.jit(
    lambda k: pnp_ransac(k, X, uv, K, num_hypotheses=256, refine_iters=10)), key)
