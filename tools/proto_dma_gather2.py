"""Prototype v2: aligned-offset DMA (y0%8==0, x0%128==0) + dynamic roll
realign, emitting (40,128) patches whose [0:S,0:S] corner is the keypoint's
exact integer corner."""
import sys
import functools
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RH, RW = 48, 256   # DMA region (covers 40+7 rows, 128+127 cols)
OH, OW = 40, 128   # output patch
BLK = 64
NSEM = 8


def kernel(corners_ref, img_ref, out_ref, scratch, sems):
    g = pl.program_id(0)

    def get_dma(k):
        i = g * BLK + k
        y0 = (corners_ref[i, 1] // 8) * 8
        x0 = (corners_ref[i, 0] // 128) * 128
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(y0, RH), pl.ds(x0, RW)],
            scratch.at[k % NSEM],
            sems.at[k % NSEM],
        )

    for k in range(min(NSEM, BLK)):
        get_dma(k).start()
    for k in range(BLK):
        i = g * BLK + k
        get_dma(k).wait()
        dy = corners_ref[i, 1] % 8
        dx = corners_ref[i, 0] % 128
        region = scratch[k % NSEM]
        rolled = pltpu.roll(pltpu.roll(region, RH - dy, 0), RW - dx, 1)
        out_ref[k] = rolled[:OH, :OW]
        if k + NSEM < BLK:
            get_dma(k + NSEM).start()


@jax.jit
def gather_pallas(img, corners):
    K = corners.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K // BLK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (BLK, OH, OW), lambda g, c: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((NSEM, RH, RW), jnp.float32),
            pltpu.SemaphoreType.DMA((NSEM,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, OH, OW), jnp.float32),
    )(corners, img)


def main():
    key = jax.random.PRNGKey(0)
    H, W = 408, 1408  # multiples of 8 / 128 with clamp room
    img = jax.random.normal(key, (H, W), jnp.float32)
    K = 1024
    xs = jax.random.randint(jax.random.PRNGKey(1), (K,), 0, W - RW)
    ys = jax.random.randint(jax.random.PRNGKey(2), (K,), 0, H - RH)
    corners = jnp.stack([xs, ys], -1).astype(jnp.int32)

    out = gather_pallas(img, corners)
    out.block_until_ready()

    def one(c):
        return jax.lax.dynamic_slice(img, (c[1], c[0]), (OH, OW))

    want = jax.jit(jax.vmap(one))(corners)
    print("parity:", bool(jnp.array_equal(out, want)))

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

    loop_time("pallas DMA+roll gather 1024", lambda c: gather_pallas(img, c))
    loop_time("XLA vmapped dynamic_slice", jax.jit(jax.vmap(one)))


if __name__ == "__main__":
    main()
