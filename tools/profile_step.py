"""Per-stage TPU timing of the VO step's components (dev tool)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from vo_tpu.data import Sequence
from vo_tpu.models.pipeline import _detect, bootstrap, vo_step
from vo_tpu.ops.harris import shi_tomasi_response, select_keypoints
from vo_tpu.ops.image import build_pyramid
from vo_tpu.ops.klt import pyramidal_lk
from vo_tpu.ops.pnp import pnp_ransac
from vo_tpu.utils.config import VOConfig

DATA_ROOT = "/root/reference/tests/test_data"


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:30s} {dt*1e3:8.2f} ms", flush=True)
    return out


def main():
    seq = Sequence("kitti", path=DATA_ROOT, kitti_sequence="05")
    cfg = VOConfig(capacity=1024)
    K = jnp.asarray(seq.K)
    img0 = jnp.asarray(seq.get_frame(0))
    img1 = jnp.asarray(seq.get_frame(2))
    print("device:", jax.devices()[0], flush=True)

    state, _ = bootstrap(img0, img1, K, cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(state)

    img = jnp.asarray(seq.get_frame(3))
    timeit("full vo_step", lambda: vo_step(state, img, K, cfg))

    pyr_f = jax.jit(lambda im: tuple(build_pyramid(im, cfg.klt.pyramid_levels)))
    pyr_new = timeit("build_pyramid", pyr_f, img)

    lk_f = jax.jit(
        lambda a, b, xy: pyramidal_lk(
            list(a), list(b), xy,
            radius=cfg.klt.radius, max_iters=cfg.klt.max_iters, eps=cfg.klt.eps,
            max_err=cfg.klt.max_err, min_eig_threshold=cfg.klt.min_eig_threshold,
        )
    )
    timeit("pyramidal_lk (1024 pts)", lk_f, state.pyramid, pyr_new, state.table.xy)

    resp_f = jax.jit(lambda im: shi_tomasi_response(im, cfg.detector.patch_size))
    resp = timeit("shi_tomasi_response", resp_f, img)

    sel_f = jax.jit(
        lambda r: select_keypoints(
            r, cfg.capacity, nms_radius=cfg.detector.nms_radius,
            border=cfg.detector.border, quality_level=cfg.detector.quality_level,
        )
    )
    timeit("select_keypoints (top-1024)", sel_f, resp)

    tri = state.table.state == 2
    pnp_f = jax.jit(
        lambda k, lm, xy, v: pnp_ransac(
            k, lm, xy, K, valid=v,
            inlier_threshold_px=cfg.pnp.inlier_threshold_px,
            num_hypotheses=cfg.pnp.num_hypotheses,
            refine_iters=cfg.pnp.refine_iters,
        )
    )
    timeit(
        f"pnp_ransac ({cfg.pnp.num_hypotheses} hyp)",
        pnp_f, jax.random.PRNGKey(1), state.table.landmark, state.table.xy, tri,
    )


if __name__ == "__main__":
    main()
