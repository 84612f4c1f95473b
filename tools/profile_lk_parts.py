"""Device-loop timing of pyramidal_lk internals: extracts vs einsums."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from vo_tpu.ops.klt import _extract_patches, _resample, _lk_level, MARGIN
from vo_tpu.ops.image import build_pyramid

N_REPS = 50


def device_loop_time(name, step_fn, init, n=N_REPS):
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
    print(f"{name:46s} {best*1e3:9.3f} ms/iter", flush=True)


key = jax.random.PRNGKey(0)
img = 127.0 + 60.0 * jax.random.normal(key, (370, 1226), jnp.float32)
img_p = jnp.pad(img, 18, mode="edge")
K = 1024
corners = jnp.stack([
    jax.random.randint(key, (K,), 20, 1180),
    jax.random.randint(jax.random.PRNGKey(1), (K,), 20, 330),
], -1).astype(jnp.int32)

# extract: search-patch size at radius 8 -> sp = 17+16+2 = 35
def ext_step(c):
    p = _extract_patches(img_p, c, 35)
    return c + (p[:, 0, 0] > 1e30).astype(jnp.int32)[:, None]

device_loop_time("extract_patches 1024x35 (search)", ext_step, corners)

def ext_step21(c):
    p = _extract_patches(img_p, c, 21)
    return c + (p[:, 0, 0] > 1e30).astype(jnp.int32)[:, None]

device_loop_time("extract_patches 1024x21 (template)", ext_step21, corners)

patches = _extract_patches(img_p, corners, 35)
pos0 = jnp.ones((K, 2)) * 8.5

def resample_step(pos):
    out = _resample(patches, pos, 17)
    return pos + out[:, 0, 0:2] * 1e-20

device_loop_time("resample 35->17 (2 einsums)", resample_step, pos0)

# one full level (10 iters) at full res
img2 = 127.0 + 60.0 * jax.random.normal(jax.random.PRNGKey(2), (370, 1226), jnp.float32)
xy = corners.astype(jnp.float32)

def level_step(g):
    flow, cond, err = _lk_level(img, img2, xy, g, 8, 10, 0.03, 1e-4)
    return g + flow * 1e-20

device_loop_time("_lk_level full-res (10 iters)", level_step, jnp.zeros((K, 2)))
