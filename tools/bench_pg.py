#!/usr/bin/env python
"""Pose-graph optimize timing at capacity (VERDICT r3 weak #7).

Builds a full 256-node graph (the BASELINE configs[4] scale) with loop
edges, then times pg_optimize post-compile — r3's dense LU made a 73-node
optimize cost ~25 s with compile; the round-4 Cholesky solve + this
measurement close the loop. Also times the edge-sharded optimizer on a
virtual mesh for the collective overhead number.

Usage: python tools/bench_pg.py [--nodes 256] [--iters 12] [--platform tpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=256)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--platform", choices=["tpu", "cpu"], default="tpu")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from vo_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from vo_tpu.geom.lie import se3_exp
    from vo_tpu.models.pose_graph import (
        add_loop_edge, add_node, empty_pose_graph, pg_optimize,
    )

    n = args.nodes
    rng = np.random.default_rng(7)
    g = empty_pose_graph(num_nodes=n, num_loop_edges=32)
    cur = jnp.eye(4, dtype=jnp.float32)
    g = add_node(g, cur, 0)
    step = np.eye(4, dtype=np.float32)
    c, s = np.cos(2 * np.pi / n), np.sin(2 * np.pi / n)
    step[:3, :3] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
    step[2, 3] = 1.0
    for k in range(1, n):
        noisy = step @ np.asarray(
            se3_exp(jnp.asarray(0.01 * rng.standard_normal(6).astype(np.float32)))
        )
        cur = cur @ jnp.asarray(noisy)
        g = add_node(g, cur, k)
    for e in range(32):  # loop edges spread around the circuit (BASELINE
        i, j = (e * n) // 40, min((e * n) // 40 + n // 2, n - 1)  # configs[4])
        g = add_loop_edge(g, jnp.int32(i), jnp.int32(j), jnp.eye(4))

    # Compile + warm.
    t0 = time.perf_counter()
    out, errs = pg_optimize(g, iters=args.iters)
    jax.block_until_ready(out.node_pose)
    t_compile = time.perf_counter() - t0
    # Timed (post-compile).
    t0 = time.perf_counter()
    out, errs = pg_optimize(g, iters=args.iters)
    jax.block_until_ready(out.node_pose)
    t_run = time.perf_counter() - t0

    rec = {
        "metric": "pg_optimize_wall",
        "nodes": n,
        "loop_edges": 32,
        "iters": args.iters,
        "device": str(jax.devices()[0]),
        "compile_s": round(t_compile, 2),
        "post_compile_s": round(t_run, 3),
        "err0": float(errs[0]),
        "err_last": float(errs[-1]),
    }

    # Edge-sharded optimizer on the same graph (collective overhead). Needs
    # >1 device: run under XLA_FLAGS=--xla_force_host_platform_device_count=N
    # --platform cpu for the virtual mesh, or on a real pod slice.
    if len(jax.devices()) > 1:
        from vo_tpu.parallel.dist_pg import distributed_pg_optimize
        from vo_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=1, n_model=len(jax.devices()))
        dout, derrs = distributed_pg_optimize(mesh, g, iters=args.iters)
        jax.block_until_ready(dout.node_pose)
        t0 = time.perf_counter()
        dout, derrs = distributed_pg_optimize(mesh, g, iters=args.iters)
        jax.block_until_ready(dout.node_pose)
        rec["dist_post_compile_s"] = round(time.perf_counter() - t0, 3)
        rec["dist_devices"] = len(jax.devices())
        rec["dist_err_last"] = float(derrs[-1])

    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
