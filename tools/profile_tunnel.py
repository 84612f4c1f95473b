"""Characterize the axon tunnel: RTT and D2H/H2D bandwidth."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    print("device:", jax.devices()[0], flush=True)
    f = jax.jit(lambda x: x + 1.0)

    # small round trips (sync mode kicks in at first D2H)
    x = jnp.zeros((8,), jnp.float32)
    y = f(x)
    t = time.perf_counter()
    np.asarray(y)
    print(f"first D2H (8 floats): {time.perf_counter()-t:.3f}s", flush=True)
    for i in range(5):
        y = f(y)
        t = time.perf_counter()
        np.asarray(y)
        print(f"rt {i}: {time.perf_counter()-t:.3f}s", flush=True)

    # H2D bandwidth
    for mb in (1, 8):
        a = np.random.rand(mb * 131072 * 2).astype(np.float32)  # mb MB
        t = time.perf_counter()
        d = jnp.asarray(a)
        jax.block_until_ready(d)
        dt = time.perf_counter() - t
        print(f"H2D {mb}MB: {dt:.3f}s ({mb/dt:.2f} MB/s)", flush=True)
        t = time.perf_counter()
        np.asarray(d)
        dt = time.perf_counter() - t
        print(f"D2H {mb}MB: {dt:.3f}s ({mb/dt:.2f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
