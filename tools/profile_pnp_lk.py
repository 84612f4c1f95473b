"""Micro-profile: which parts of pnp_ransac and pyramidal_lk dominate."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from vo_tpu.ops.klt import _extract_patches, _resample, pyramidal_lk
from vo_tpu.ops.pnp import p3p_solve_sample, pnp_ransac, refine_pose_gn, solve_quartic, _kabsch
from vo_tpu.ops.image import build_pyramid


def sync_time(name, fn, *args, n=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    best = np.inf
    for _ in range(n):
        t = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        best = min(best, time.perf_counter() - t)
    print(f"{name:40s} {best*1e3:9.2f} ms", flush=True)


key = jax.random.PRNGKey(0)
noop = jax.jit(lambda x: x + 1.0)
sync_time("OVERHEAD noop", noop, jnp.zeros(8))

# --- PnP parts ---
N, H = 1024, 256
X = jax.random.uniform(key, (N, 3), jnp.float32, -5, 5) + jnp.asarray([0, 0, 15.0])
K = jnp.asarray([[707.0, 0, 601.0], [0, 707.0, 183.0], [0, 0, 1.0]], jnp.float32)
uvh = (K @ X.T).T
uv = uvh[:, :2] / uvh[:, 2:]

sync_time("pnp_ransac full (256 hyp, refine10)", jax.jit(
    lambda k: pnp_ransac(k, X, uv, K, num_hypotheses=256, refine_iters=10)), key)
sync_time("pnp_ransac no refine", jax.jit(
    lambda k: pnp_ransac(k, X, uv, K, num_hypotheses=256, refine_iters=0)), key)

X4 = X[:4]
uv4 = uv[:4]
Xh = jnp.broadcast_to(X4, (H, 4, 3))
uvh4 = jnp.broadcast_to(uv4, (H, 4, 2))
sync_time("vmap p3p_solve_sample x256", jax.jit(
    lambda a, b: jax.vmap(lambda x, u: p3p_solve_sample(x, u, K))(a, b)), Xh, uvh4)

co = jax.random.normal(key, (H * 4, 5))
sync_time("solve_quartic x1024", jax.jit(jax.vmap(solve_quartic)), co)

src = jax.random.normal(key, (H * 4, 3, 3))
dst = jax.random.normal(jax.random.PRNGKey(1), (H * 4, 3, 3))
sync_time("kabsch(svd3x3) x1024", jax.jit(jax.vmap(_kabsch)), src, dst)

T0 = jnp.eye(4, dtype=jnp.float32)
sync_time("refine_pose_gn 10 iters", jax.jit(
    lambda t: refine_pose_gn(t, X, uv, K, jnp.ones(N), iters=10)), T0)

# --- LK parts ---
img = 127.0 + 60.0 * jax.random.normal(key, (370, 1226), jnp.float32)
img2 = 127.0 + 60.0 * jax.random.normal(jax.random.PRNGKey(2), (370, 1226), jnp.float32)
pyr_f = jax.jit(lambda im: tuple(build_pyramid(im, 3)))
p1, p2 = pyr_f(img), pyr_f(img2)
xy = jnp.stack([
    jax.random.uniform(key, (1024,), jnp.float32, 30, 1190),
    jax.random.uniform(jax.random.PRNGKey(3), (1024,), jnp.float32, 30, 340),
], -1)

sync_time("pyramidal_lk full", jax.jit(
    lambda a, b, p: pyramidal_lk(list(a), list(b), p, radius=8)), p1, p2, xy)

corners = xy.astype(jnp.int32)
sync_time("extract_patches 1024x39", jax.jit(
    lambda im, c: _extract_patches(im, c, 39)), img, corners)

patches = _extract_patches(img, corners, 39)
pos = jnp.ones((1024, 2)) * 2.5
sync_time("resample 1024: 39->19 (1 einsum pair)", jax.jit(
    lambda p, q: _resample(p, q, 19)), patches, pos)
