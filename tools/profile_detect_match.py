#!/usr/bin/env python
"""Break down detection + matcher time into stages (roofline follow-up).

roofline.py flagged detect (7.6% SoL) and match (19% SoL) as the two
kernels with the most headroom; this tool attributes their time to stages
so the optimization lands where the microseconds are.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from vo_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

H, W, CAP = 480, 640, 1024
DESC_D = 361


def measure(fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e6


def main():
    from vo_tpu.ops.descriptors import match_descriptors
    from vo_tpu.ops.harris import detect_keypoints, select_from_masked
    from vo_tpu.ops.pallas_kernels import corner_response_nms

    rng = np.random.default_rng(2023)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))

    print(f"device: {jax.devices()[0]}")

    # --- detection stages ---------------------------------------------------
    full = jax.jit(lambda im: detect_keypoints(im, CAP))
    t_full = measure(full, img)
    kern = jax.jit(lambda im: corner_response_nms(im))
    t_kern = measure(kern, img)
    masked = kern(img)
    sel = jax.jit(lambda m: select_from_masked(m, CAP))
    t_sel = measure(sel, masked)
    topk = jax.jit(lambda m: lax.top_k(m.reshape(-1), CAP))
    t_topk = measure(topk, masked)
    print(f"detect full            {t_full:8.1f} us")
    print(f"  pallas resp+nms      {t_kern:8.1f} us")
    print(f"  select_from_masked   {t_sel:8.1f} us")
    print(f"    raw top_k(307k)    {t_topk:8.1f} us")

    # --- matcher stages -----------------------------------------------------
    d1 = jnp.asarray(rng.normal(0, 1, (CAP, DESC_D)).astype(np.float32))
    d2 = jnp.asarray(rng.normal(0, 1, (CAP, DESC_D)).astype(np.float32))
    t_match = measure(jax.jit(lambda a, b: match_descriptors(a, b)), d1, d2)

    def dist_only(a, b):
        n1 = jnp.sum(a * a, -1)
        n2 = jnp.sum(b * b, -1)
        return jnp.maximum(
            n1[:, None] + n2[None, :]
            - 2.0 * jnp.dot(a, b.T, preferred_element_type=jnp.float32),
            0.0,
        )

    t_dist = measure(jax.jit(dist_only), d1, d2)
    dist = jax.jit(dist_only)(d1, d2)
    t_top2 = measure(jax.jit(lambda d: lax.top_k(-d, 2)), dist)
    t_argmin0 = measure(jax.jit(lambda d: jnp.argmin(d, axis=0)), dist)

    def min2(d):
        best = jnp.min(d, axis=1)
        bidx = jnp.argmin(d, axis=1)
        cols = lax.broadcasted_iota(jnp.int32, d.shape, 1)
        second = jnp.min(jnp.where(cols == bidx[:, None], jnp.inf, d), axis=1)
        return best, bidx, second

    t_min2 = measure(jax.jit(min2), dist)
    print(f"match full             {t_match:8.1f} us")
    print(f"  dist matmul          {t_dist:8.1f} us")
    print(f"  top_k(-d, 2)         {t_top2:8.1f} us")
    print(f"  argmin axis0         {t_argmin0:8.1f} us")
    print(f"  min/argmin/second    {t_min2:8.1f} us")


if __name__ == "__main__":
    main()
