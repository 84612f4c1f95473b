"""Multi-host (multi-process) VO scaling over DCN.

The reference is one python thread in one process (ref README.md:49). The
TPU deployment shape for scale-out is N hosts, each driving its local chips,
joined by `jax.distributed` into ONE global SPMD program: the mesh "data"
axis spans every chip on every host, host-local lane batches are promoted to
global arrays, and XLA inserts the (here: trivial, lanes are independent)
collectives over ICI/DCN.

This module is both the library (`initialize`, `global_data_mesh`,
`local_to_global`) and a runnable worker (`python -m
vo_tpu.parallel.multihost --coordinator ... --process-id i ...`). Without
TPU pods in this sandbox, the harness is validated the standard way: N
local processes, each given a slice of virtual CPU devices
(`--xla_force_host_platform_device_count`), joined through a real
`jax.distributed` coordinator with Gloo cross-process collectives — the
same code path a pod would run, minus the ICI.

Launch via `run_multiseq.py --multihost N` (spawns the workers and prints
the weak-scaling table) or run workers by hand across real hosts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def initialize(coordinator: str, num_processes: int, process_id: int) -> None:
    """Join the jax.distributed cluster. Must run before any jax compute.

    On a real pod slice, jax infers everything from the TPU environment and
    plain `jax.distributed.initialize()` suffices; here the coordinator is
    explicit so CPU processes on one machine can form a cluster.
    """
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_data_mesh():
    """("data",) mesh over every device of every process."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), ("data",))


def local_to_global(tree, mesh, batch_axis: int = 0):
    """Promote a pytree of host-local, batch-leading arrays to global
    jax.Arrays sharded over the mesh "data" axis. Each process contributes
    its local lanes; the global batch is the concatenation over processes.
    """
    import jax
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    specs = jax.tree_util.tree_map(lambda _: P("data"), tree)
    return multihost_utils.host_local_array_to_global_array(tree, mesh, specs)


# ---------------------------------------------------------------------------
# Worker entry: lockstep multi-sequence VO over the global mesh
# ---------------------------------------------------------------------------


def _parse(argv):
    p = argparse.ArgumentParser(description="multi-host VO worker")
    p.add_argument("--coordinator", default="127.0.0.1:9731")
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--lanes-per-device", type=int, default=1)
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--capacity", type=int, default=128)
    p.add_argument("--crop", default="128x256",
                   help="HxW crop of each frame (keeps CPU compile fast)")
    p.add_argument("--data-root", default="/root/reference/tests/test_data")
    p.add_argument("--dataset", default="kitti")
    p.add_argument("--repeats", type=int, default=2,
                   help="timed rollout repeats (first is warmup)")
    p.add_argument("--dist-ba", action="store_true",
                   help="instead of the rollout, run the landmark-sharded "
                        "distributed BA with the mesh 'model' axis spanning "
                        "PROCESSES and verify it matches the single-device "
                        "solver (SURVEY §5 sequence-parallel analog)")
    p.add_argument("--ba-landmarks-per-device", type=int, default=64)
    p.add_argument("--seqpar-ba", action="store_true",
                   help="instead of the rollout, run the KEYFRAME-sharded "
                        "composed-window BA (the window GROWS with "
                        "processes: W_eff = 4 per process) over the "
                        "cross-process mesh and verify parity with the "
                        "single-device solver on the same composed window "
                        "(SURVEY §5 north star; parallel/window_blocks.py)")
    return p.parse_args(argv)


def _dist_ba_main(args) -> int:
    """Cross-process distributed BA parity: the BA window's landmark rows are
    sharded over a mesh whose "model" axis spans every process; the camera-
    side normal equations ride psum over the cross-process (DCN/Gloo)
    backend. Every process builds the identical window deterministically
    (dist_ba.demo_window) and independently computes the single-device
    reference — the distributed result must match it to f32 tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vo_tpu.models.ba import ba_refine
    from vo_tpu.parallel.dist_ba import (
        _window_specs,
        demo_window,
        distributed_ba_refine,
    )

    pid = args.process_id
    n_global = len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()), ("model",))
    K = jnp.asarray(
        np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    )
    L = args.ba_landmarks_per_device * n_global
    win = demo_window(L, num_keyframes=4, seed=11)

    def to_global(x, spec):
        sh = NamedSharding(mesh, spec)
        host = np.asarray(x)
        return jax.make_array_from_callback(host.shape, sh, lambda i: host[i])

    gwin = jax.tree_util.tree_map(to_global, win, _window_specs())
    out, errs = distributed_ba_refine(mesh, gwin, K, iters=4)
    ref, ref_errs = ba_refine(win, K, iters=4)

    ok_errs = np.allclose(np.asarray(errs), np.asarray(ref_errs),
                          rtol=1e-4, atol=1e-4)
    ok_pose = np.allclose(np.asarray(out.kf_pose), np.asarray(ref.kf_pose),
                          rtol=1e-3, atol=2e-3)
    ok_lm = True
    ref_lm = np.asarray(ref.landmark)
    for s in out.landmark.addressable_shards:
        ok_lm &= bool(np.allclose(np.asarray(s.data), ref_lm[s.index],
                                  rtol=1e-2, atol=5e-3))
    # BA must actually have optimized something, not compared two no-ops.
    improved = float(ref_errs[-1]) < 0.7 * float(ref_errs[0])
    ok = bool(ok_errs and ok_pose and ok_lm and improved)
    if pid == 0:
        print(json.dumps({
            "metric": "multihost_dist_ba",
            "num_processes": args.num_processes,
            "devices_global": n_global,
            "landmarks": L,
            "err_first": round(float(ref_errs[0]), 4),
            "err_last": round(float(ref_errs[-1]), 4),
            "match_errs": ok_errs, "match_pose": ok_pose,
            "match_landmarks": ok_lm, "improved": improved,
        }), flush=True)
    return 0 if ok else 1


def _seqpar_ba_main(args) -> int:
    """Cross-process sequence-parallel BA: the composed window's KEYFRAME
    blocks span every process (W_eff = 4 * n_processes at the per-process
    memory of a 4-keyframe window), landmark normal equations psum over the
    cross-process backend and the Schur fill-in rides all_gather. Every
    process deterministically builds the identical composed window and its
    own single-device reference; the sharded result must match to f32
    (VERDICT r4 task #4b — this is the capability 'the window grows with
    hosts' exercised over a REAL jax.distributed cluster, not the
    in-process virtual mesh)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vo_tpu.models.ba import ba_refine
    from vo_tpu.parallel.dist_ba import demo_window
    from vo_tpu.parallel.window_blocks import (
        seqpar_ba_refine,
        window_block_specs,
    )

    pid = args.process_id
    n_global = len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()), ("model",))
    K = jnp.asarray(
        np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    )
    W_eff = 4 * n_global  # the window GROWS with the cluster
    win = demo_window(args.ba_landmarks_per_device, num_keyframes=W_eff, seed=7)

    def to_global(x, spec):
        sh = NamedSharding(mesh, spec)
        host = np.asarray(x)
        return jax.make_array_from_callback(host.shape, sh, lambda i: host[i])

    gwin = jax.tree_util.tree_map(to_global, win, window_block_specs())
    out, errs = seqpar_ba_refine(mesh, gwin, K, iters=4)
    ref, ref_errs = ba_refine(win, K, iters=4)

    # Mid-trace errors compare loosely (Huber amplification of f32
    # reassociation, see __graft_entry__ seqpar stage); poses strictly.
    ok_errs = np.allclose(np.asarray(errs), np.asarray(ref_errs),
                          rtol=5e-2, atol=1e-4)
    pose_local = np.concatenate(
        [np.asarray(s.data) for s in out.kf_pose.addressable_shards]
    )
    idx = np.concatenate(
        [np.arange(s.index[0].start or 0, s.index[0].stop)
         for s in out.kf_pose.addressable_shards]
    )
    ok_pose = np.allclose(pose_local, np.asarray(ref.kf_pose)[idx],
                          rtol=1e-3, atol=2e-3)
    improved = float(ref_errs[-1]) < 0.7 * float(ref_errs[0])
    ok = bool(ok_errs and ok_pose and improved)
    if pid == 0:
        print(json.dumps({
            "metric": "multihost_seqpar_ba",
            "num_processes": args.num_processes,
            "devices_global": n_global,
            "window_effective": W_eff,
            "err_first": round(float(ref_errs[0]), 4),
            "err_last": round(float(ref_errs[-1]), 4),
            "match_errs": ok_errs, "match_pose": ok_pose,
            "improved": improved,
        }), flush=True)
    return 0 if ok else 1


def worker_main(argv=None) -> int:
    args = _parse(argv)
    # Env must be pinned before jax initializes; the launcher normally sets
    # these, this is for by-hand runs.
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax

    jax.config.update("jax_platforms", "cpu")
    initialize(args.coordinator, args.num_processes, args.process_id)

    if args.dist_ba:
        return _dist_ba_main(args)
    if args.seqpar_ba:
        return _seqpar_ba_main(args)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vo_tpu.data import Sequence
    from vo_tpu.models.pipeline import bootstrap
    from vo_tpu.parallel.multiseq import make_sharded_rollout
    from vo_tpu.utils.config import VOConfig

    pid = args.process_id
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    lanes_local = n_local * args.lanes_per_device
    lanes_global = n_global * args.lanes_per_device
    mesh = global_data_mesh()

    # --- sanity collective: proves DCN-style cross-process reduction ---
    @jax.jit
    def _gsum(x):
        return jnp.sum(x)

    ones = local_to_global(np.full((lanes_local,), 1.0, np.float32), mesh)
    gsum = float(_gsum(ones))
    assert gsum == float(lanes_global), (gsum, lanes_global)

    # --- local lanes: bootstrap + frame plan on the host, tiny shapes ---
    h, w = (int(v) for v in args.crop.split("x"))
    seq = Sequence(args.dataset, path=args.data_root)
    imgs = [np.asarray(seq.get_frame(i))[:h, :w] for i in range(len(seq))]
    K = np.asarray(seq.K, np.float32)
    cfg = VOConfig(capacity=args.capacity)

    st0, _ = bootstrap(
        jnp.asarray(imgs[0]), jnp.asarray(imgs[2]), jnp.asarray(K), cfg,
        jax.random.PRNGKey(2023 + pid),
    )
    states = jax.tree_util.tree_map(
        lambda x: np.broadcast_to(np.asarray(x)[None], (lanes_local,) + x.shape),
        st0,
    )
    # Independent RNG lanes (deterministic per global lane index).
    keys = jax.random.split(jax.random.PRNGKey(7), lanes_global)
    lane_lo = pid * lanes_local
    states = states._replace(
        rng=np.asarray(keys[lane_lo:lane_lo + lanes_local])
    )

    order = list(range(3, len(imgs))) + list(range(len(imgs) - 2, 0, -1)) + [1, 2]
    plan = (order * (args.steps // len(order) + 1))[: args.steps]
    local_stack = np.stack(
        [np.stack([imgs[f]] * lanes_local) for f in plan]
    )  # (N, B_local, H, W)
    Ks = np.broadcast_to(K, (lanes_local, 3, 3))

    # --- promote host-local lanes to ONE global SPMD program ---
    g_states = local_to_global(states, mesh)
    from jax.experimental import multihost_utils

    g_stack = multihost_utils.host_local_array_to_global_array(
        local_stack, mesh, P(None, "data")
    )
    g_Ks = local_to_global(Ks, mesh)

    rollout = make_sharded_rollout(mesh, cfg)
    dt_best = None
    for r in range(max(2, args.repeats)):
        t0 = time.perf_counter()
        out_state, outs = rollout(g_states, g_stack, g_Ks)
        jax.block_until_ready(outs.pose)
        dt = time.perf_counter() - t0
        if r > 0:
            dt_best = dt if dt_best is None else min(dt_best, dt)

    # Every process sees the globally-consistent result on its addressable
    # shards; verify local lanes produced finite poses.
    local_pose = np.concatenate(
        [np.asarray(s.data) for s in outs.pose.addressable_shards], axis=1
    )
    finite = bool(np.isfinite(local_pose).all())

    result = {
        "metric": "multihost_vo",
        "num_processes": args.num_processes,
        "devices_global": n_global,
        "lanes_global": lanes_global,
        "steps": args.steps,
        "agg_fps": round(args.steps * lanes_global / dt_best, 3),
        "gsum_ok": True,
        "finite": finite,
        "process_id": pid,
    }
    # One report line per run: process 0 speaks for the cluster (all
    # processes executed the same SPMD program and the same barriers).
    if pid == 0:
        print(json.dumps(result), flush=True)
    return 0 if finite else 1


if __name__ == "__main__":
    sys.exit(worker_main())
