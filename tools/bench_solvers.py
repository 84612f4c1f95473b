#!/usr/bin/env python
"""Before/after bench for the round-4 SPD solver swap (VERDICT r3 task #2/#3).

Measures, on the real chip and at the exact deployment shapes, the cost of
one jitted BA Gauss-Newton iteration and one jitted PnP GN refinement with

  (a) the r3 path: `jnp.linalg.solve` — XLA lowers to LU with partial
      pivoting, a long sequential pivot/permute chain; and
  (b) the r4 path: the unrolled/blocked Cholesky solvers in ops/linalg.py
      (spd_solve_blocked for the 6Wx6W Schur camera system,
      spd_solve_small for the 6x6 PnP step),

by monkeypatching the solver symbol inside models/ba.py / ops/pnp.py —
everything else in the traced program is identical. Prints one line per
(path, variant) with the measured ms and the delta.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, *args, n=30):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    import vo_tpu.models.ba as ba_mod
    from vo_tpu.parallel.dist_ba import demo_window

    print(f"device: {jax.devices()[0]}")

    # ---- BA: one GN iteration at deployment shape (W=6, L=1024) ----------
    win = demo_window(1024, num_keyframes=6, seed=3)
    K = jnp.asarray(np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32))

    real_blocked = ba_mod.spd_solve_blocked

    def lu_blocked(S, b):
        W, _, B, _ = S.shape
        dense = S.transpose(0, 2, 1, 3).reshape(W * B, W * B)
        return jnp.linalg.solve(dense, b.reshape(W * B)).reshape(W, B)

    results = {}
    for name, solver in [("lu (r3)", lu_blocked), ("cholesky (r4)", real_blocked)]:
        ba_mod.spd_solve_blocked = solver
        step = jax.jit(lambda w, k: ba_mod._gn_step(w, k, 1e-3, 2.0, None))
        results[name] = _timeit(step, win, K)
        print(f"BA GN iter (W6,L1024)   {name:14s} {results[name]:7.3f} ms")
    ba_mod.spd_solve_blocked = real_blocked
    print(f"BA GN iter delta: {results['lu (r3)'] - results['cholesky (r4)']:+.3f} ms "
          f"({results['lu (r3)'] / results['cholesky (r4)']:.2f}x)")

    # ---- PnP-style: a 10-step scan of ONE 6x6 SPD solve ------------------
    # (refine_pose_gn solves a single 6x6 per GN iteration — unlike BA,
    # nothing is batched, so the unrolled Cholesky's scalar dependency chain
    # competes with one LU's. This measures exactly that contrast; the
    # production choice in ops/pnp.py follows the result.)
    from vo_tpu.ops.linalg import spd_solve_small

    rng = np.random.default_rng(0)
    J = jnp.asarray(rng.normal(size=(64, 6)).astype(np.float32))
    H0 = J.T @ J + 1e-2 * jnp.eye(6)
    g0 = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))

    def scan_of(solver):
        def run(H, g):
            def step(carry, _):
                d = solver(H + carry * 1e-6, g)
                return carry + d.sum() * 0.0 + 1.0, d
            return jax.lax.scan(step, 0.0, None, length=10)
        return jax.jit(run)

    lu = scan_of(lambda H, g: jnp.linalg.solve(H, g[..., None])[..., 0])
    ch = scan_of(lambda H, g: spd_solve_small(H, g, 6))
    results = {"lu (r3)": _timeit(lu, H0, g0), "cholesky": _timeit(ch, H0, g0)}
    for name, ms in results.items():
        print(f"6x6 SPD solve x10 scan  {name:14s} {ms:7.3f} ms")
    print(f"6x6 delta: {results['lu (r3)'] - results['cholesky']:+.3f} ms "
          f"({results['lu (r3)'] / results['cholesky']:.2f}x) -> pnp keeps LU "
          f"when this is < 1x")


if __name__ == "__main__":
    main()
