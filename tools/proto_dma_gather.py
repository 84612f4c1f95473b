"""Prototype: per-keypoint DMA patch gather with arbitrary offsets.

Question: does Mosaic accept HBM->VMEM async copies of tile-aligned SHAPE
(40, 128) at ARBITRARY (y, x) offsets? If yes, a Pallas gather can replace
the vmapped-dynamic_slice XLA gather in LK patch extraction.
"""
import sys
import functools
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RH, RW = 40, 128
BLK = 64
NSEM = 8


def kernel(corners_ref, img_ref, out_ref, sems):
    g = pl.program_id(0)

    def get_dma(k):
        y0 = corners_ref[g * BLK + k, 1]
        x0 = corners_ref[g * BLK + k, 0]
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(y0, RH), pl.ds(x0, RW)],
            out_ref.at[k],
            sems.at[k % NSEM],
        )

    for k in range(min(NSEM, BLK)):
        get_dma(k).start()
    for k in range(BLK):
        if k + NSEM < BLK:
            get_dma(k + NSEM).start()
        get_dma(k).wait()


@functools.partial(jax.jit, static_argnames=())
def gather_pallas(img, corners):
    K = corners.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K // BLK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (BLK, RH, RW), lambda g, c: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, RH, RW), jnp.float32),
    )(corners, img)


def main():
    key = jax.random.PRNGKey(0)
    H, W = 406, 1262
    img = jax.random.normal(key, (H, W), jnp.float32)
    K = 1024
    xs = jax.random.randint(jax.random.PRNGKey(1), (K,), 0, W - RW)
    ys = jax.random.randint(jax.random.PRNGKey(2), (K,), 0, H - RH)
    corners = jnp.stack([xs, ys], -1).astype(jnp.int32)

    out = gather_pallas(img, corners)
    out.block_until_ready()

    # Oracle: vmapped dynamic_slice.
    def one(c):
        return jax.lax.dynamic_slice(img, (c[1], c[0]), (RH, RW))

    want = jax.jit(jax.vmap(one))(corners)
    print("parity:", bool(jnp.array_equal(out, want)))

    # Device-loop timing of both.
    def loop_time(name, fn):
        @jax.jit
        def run(c):
            def body(cc, _):
                o = fn(cc)
                return cc + (o[:, 0, 0] > 1e30).astype(jnp.int32)[:, None], 0.0
            return jax.lax.scan(body, c, None, length=50)[0]

        r = run(corners)
        np.asarray(r[0, 0])
        best = np.inf
        for _ in range(3):
            t = time.perf_counter()
            r = run(corners)
            np.asarray(r[0, 0])
            best = min(best, (time.perf_counter() - t) / 50)
        print(f"{name:36s} {best*1e3:8.3f} ms/iter", flush=True)

    loop_time("pallas DMA gather 1024x(40x128)", gather_pallas)
    loop_time("XLA vmapped dynamic_slice", jax.vmap(one))


if __name__ == "__main__":
    main()
