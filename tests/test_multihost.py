"""Multi-host (multi-process) harness tests.

Spawns a REAL `jax.distributed` cluster: N local CPU processes joined
through a coordinator, Gloo cross-process collectives, the batch sharded
over the global mesh "data" axis via shard_map — the same SPMD program a
TPU pod runs, minus the ICI (SURVEY §2 parallelism table: "Distributed
comm backend"). The workers are `python -m vo_tpu.parallel.multihost`.

These run as subprocesses so this process's jax (pinned to the in-process
8-device virtual mesh by conftest) is not disturbed.
"""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn_cluster(nproc: int, extra=()):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    port = _free_port()
    cmd = [
        sys.executable, "-m", "vo_tpu.parallel.multihost",
        "--coordinator", f"127.0.0.1:{port}",
        "--num-processes", str(nproc),
        "--steps", "4", "--capacity", "128", "--repeats", "2",
        *extra,
    ]
    procs = [
        subprocess.Popen(
            cmd + ["--process-id", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(nproc)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    return procs, outs


def test_two_process_cluster_runs_vo_lockstep():
    """2 processes x 1 device x 1 lane: the global program must see 2
    devices, the cross-process sum must succeed (worker asserts it), and
    both processes' lanes must produce finite poses."""
    procs, outs = _spawn_cluster(2)
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{so}\n{se}"
    report = json.loads(
        [ln for ln in outs[0][0].splitlines() if ln.startswith("{")][-1]
    )
    assert report["devices_global"] == 2
    assert report["lanes_global"] == 2
    assert report["gsum_ok"] and report["finite"]
    assert report["agg_fps"] > 0


def test_cross_process_distributed_ba_matches_single_device():
    """Distributed BA with the mesh "model" axis spanning PROCESSES: landmark
    rows sharded per process, camera normal equations psum-reduced over the
    cross-process backend — must match the single-device solver to f32
    (VERDICT r2 item 3 / SURVEY §5 sequence-parallel analog)."""
    procs, outs = _spawn_cluster(2, extra=("--dist-ba",))
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"dist-BA worker failed:\n{so}\n{se}"
    report = json.loads(
        [ln for ln in outs[0][0].splitlines() if ln.startswith("{")][-1]
    )
    assert report["devices_global"] == 2
    assert report["match_errs"] and report["match_pose"]
    assert report["match_landmarks"] and report["improved"]


@pytest.mark.slow
def test_two_process_weak_scaling_efficiency():
    """Weak scaling 1 -> 2 processes with equal per-process core budgets.

    On this sandbox (2 cores) each process gets 1 pinned core. The sharded
    rollout contains no collectives, so efficiency should be near-perfect;
    gate at >= 0.8 (the BASELINE.md target) with margin for CI noise."""
    r = subprocess.run(
        [sys.executable, "run_multiseq.py", "--multihost", "1,2",
         "--devices-per-proc", "1", "--mh-steps", "16", "--mh-repeats", "4"],
        capture_output=True, text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    table = json.loads(
        [ln for ln in r.stdout.splitlines()
         if ln.startswith('{"metric": "multihost_weak_scaling"')][-1]
    )
    effs = {row["processes"]: row["weak_scaling_eff"] for row in table["rows"]}
    assert effs[2] >= 0.8, table


def test_cross_process_seqpar_composed_window_ba():
    """Sequence-parallel composed-window BA over a REAL cluster: keyframe
    blocks span PROCESSES (W_eff = 4 x 2 at per-process W=4 obs memory),
    landmark reductions psum and Schur fill-in all_gathers over the
    cross-process backend — parity vs the single-device solver on the same
    composed window (VERDICT r4 task #4b: 'the window grows with hosts'
    demonstrated cross-process, not just on the in-process virtual mesh)."""
    procs, outs = _spawn_cluster(2, extra=("--seqpar-ba",))
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"seqpar-BA worker failed:\n{so}\n{se}"
    report = json.loads(
        [ln for ln in outs[0][0].splitlines() if ln.startswith("{")][-1]
    )
    assert report["devices_global"] == 2
    assert report["window_effective"] == 8
    assert report["match_errs"] and report["match_pose"]
    assert report["improved"]
