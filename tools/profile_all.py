"""One-process TPU profile: components (sync mode) + rollout fps w/ and w/o BA."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from vo_tpu.data import Sequence
from vo_tpu.models.ba import ba_refine
from vo_tpu.models.pipeline import bootstrap, vo_rollout, vo_step
from vo_tpu.ops.harris import shi_tomasi_response, select_keypoints
from vo_tpu.ops.image import build_pyramid
from vo_tpu.ops.klt import pyramidal_lk
from vo_tpu.ops.pnp import pnp_ransac
from vo_tpu.utils.config import VOConfig

DATA_ROOT = "/root/reference/tests/test_data"


def sync_time(name, fn, *args, n=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    best = np.inf
    for _ in range(n):
        t = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        best = min(best, time.perf_counter() - t)
    print(f"{name:32s} {best*1e3:9.1f} ms", flush=True)


def rollout_fps(state, stack, K, cfg, label):
    _, outs = vo_rollout(state, stack, K, cfg)
    np.asarray(outs.pose[-1])
    t0 = time.perf_counter()
    _, outs = vo_rollout(state, stack, K, cfg)
    np.asarray(outs.pose[-1])
    dt = time.perf_counter() - t0
    n = stack.shape[0]
    print(f"{label:32s} {dt/n*1e3:9.1f} ms/frame  ({n/dt:.1f} fps)", flush=True)


def main():
    seq = Sequence("kitti", path=DATA_ROOT, kitti_sequence="05")
    cfg = VOConfig(capacity=1024)
    cfg_noba = cfg.replace(ba=cfg.ba.__class__(enabled=False))
    K = jnp.asarray(seq.K)
    imgs = [jnp.asarray(seq.get_frame(i)) for i in range(len(seq))]
    print("device:", jax.devices()[0], flush=True)

    state, out = bootstrap(imgs[0], imgs[2], K, cfg, jax.random.PRNGKey(2023))
    np.asarray(out.pose)
    print("sync mode entered", flush=True)
    img = imgs[3]

    noop = jax.jit(lambda x: x + 1.0)
    sync_time("noop launch overhead", noop, jnp.zeros(8))
    sync_time("vo_step (ba on)", lambda s, i: vo_step(s, i, K, cfg), state, img)
    sync_time("vo_step (ba off)", lambda s, i: vo_step(s, i, K, cfg_noba), state, img)

    pyr_f = jax.jit(lambda im: tuple(build_pyramid(im, cfg.klt.pyramid_levels)))
    sync_time("build_pyramid", pyr_f, img)
    pyr_new = pyr_f(img)

    lk_f = jax.jit(
        lambda a, b, xy: pyramidal_lk(
            list(a), list(b), xy,
            radius=cfg.klt.radius, max_iters=cfg.klt.max_iters, eps=cfg.klt.eps,
            max_err=cfg.klt.max_err, min_eig_threshold=cfg.klt.min_eig_threshold,
        )
    )
    sync_time("pyramidal_lk 1024pts", lk_f, state.pyramid, pyr_new, state.table.xy)

    resp_f = jax.jit(lambda im: shi_tomasi_response(im, cfg.detector.patch_size))
    sync_time("shi_tomasi_response", resp_f, img)
    resp = resp_f(img)
    sel_f = jax.jit(
        lambda r: select_keypoints(
            r, cfg.capacity, nms_radius=cfg.detector.nms_radius,
            border=cfg.detector.border, quality_level=cfg.detector.quality_level,
        )
    )
    sync_time("select_keypoints top1024", sel_f, resp)

    tri = state.table.state == 2
    pnp_f = jax.jit(
        lambda k, lm, xy, v: pnp_ransac(
            k, lm, xy, K, valid=v,
            inlier_threshold_px=cfg.pnp.inlier_threshold_px,
            num_hypotheses=cfg.pnp.num_hypotheses,
            refine_iters=cfg.pnp.refine_iters,
        )
    )
    sync_time("pnp_ransac 256hyp", pnp_f, jax.random.PRNGKey(1),
              state.table.landmark, state.table.xy, tri)

    ba_f = jax.jit(lambda w: ba_refine(w, K, iters=cfg.ba.iters))
    sync_time("ba_refine 5 iters", ba_f, state.window)

    order = (list(range(3, 6)) + [4, 3, 2, 1, 2]) * 5
    stack = jnp.stack([imgs[f] for f in order])
    rollout_fps(state, stack, K, cfg_noba, "rollout 40f (ba off)")
    rollout_fps(state, stack, K, cfg, "rollout 40f (ba on)")


if __name__ == "__main__":
    main()
