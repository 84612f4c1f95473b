"""Mesh-sharded pose-graph optimization (VERDICT r3 task #7).

The single-device optimizer (models/pose_graph.py pg_optimize) assembles the
(7N, 7N) Sim(3) normal system with scatter-adds over ALL constraints and
solves it densely. At BASELINE configs[4] scale ("pose-graph keyframe
culling" over the full KITTI 00-10 suite) the constraint set — not the
solve — dominates: every edge costs a Sim(3) log, two 7x7 Jacobians, and
four 7x7 block outer products. Those are embarrassingly parallel over edges.

Design (same shape as parallel/dist_gn.py, the camera-Hessian reduction):

  * the edge set (chain + loop constraints, models/pose_graph.py
    build_edges) is padded to a multiple of the mesh axis and sharded;
  * every device scatter-assembles the normal system for ITS edges only
    (scatter_edge_terms — pure MXU/VPU work, no communication);
  * one `psum` over the mesh axis reduces H, g, row_deg, and the error
    accumulators — the only collective per GN iteration;
  * damping/gauge regularization and the blocked-Cholesky solve run
    replicated (the solve is O(N^3) but N<=256 keeps it trivial next to
    edge assembly at scale).

The reference has no pose graph at all (its report names one as future
work, Report.pdf 3.1.1); nothing here translates reference code.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from vo_tpu.geom.lie import sim3_exp
from vo_tpu.models.pose_graph import (
    PoseGraph,
    _edge_terms,
    build_edges,
    regularize_and_solve,
    scatter_edge_terms,
)


def distributed_pg_optimize(
    mesh: Mesh,
    graph: PoseGraph,
    iters: int = 10,
    damping: float = 1e-4,
    optimize_scale: bool = True,
    axis: str = "model",
) -> tuple[PoseGraph, jnp.ndarray]:
    """pg_optimize with edge-term assembly sharded over `axis`.

    Semantics identical to models.pose_graph.pg_optimize (same accept gate,
    same gauge); the edge set is padded with invalid edges so every shard
    gets an equal count — invalid edges contribute exact zeros to H/g.
    """
    n_shards = mesh.shape[axis]
    N = graph.capacity
    a_idx, b_idx, z, w, valid = build_edges(graph)
    E = a_idx.shape[0]
    pad = (-E) % n_shards
    if pad:
        a_idx = jnp.concatenate([a_idx, jnp.zeros((pad,), a_idx.dtype)])
        b_idx = jnp.concatenate([b_idx, jnp.zeros((pad,), b_idx.dtype)])
        z = jnp.concatenate(
            [z, jnp.broadcast_to(jnp.eye(4, dtype=z.dtype), (pad, 4, 4))]
        )
        w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), valid.dtype)])

    gauge_idx = jnp.argmax(graph.node_valid)
    scale_gauge = jnp.zeros((N,)) if optimize_scale else jnp.ones((N,))
    node_valid = graph.node_valid

    spec_edges = P(axis)
    spec_rep = P()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec_rep, spec_edges, spec_edges, spec_edges, spec_edges,
                  spec_edges, spec_rep, spec_rep, spec_rep),
        out_specs=(spec_rep, spec_rep),
    )
    def run(poses0, a_s, b_s, z_s, w_s, v_s, gauge, sgauge, nvalid):
        def body(poses, _):
            H, g, row_deg, err_num, err_den = scatter_edge_terms(
                poses, a_s, b_s, z_s, w_s, v_s, N
            )
            H = jax.lax.psum(H, axis)
            g = jax.lax.psum(g, axis)
            row_deg = jax.lax.psum(row_deg, axis)
            err = jax.lax.psum(err_num, axis) / jnp.maximum(
                jax.lax.psum(err_den, axis), 1
            )
            delta = regularize_and_solve(
                H, g, row_deg, N, gauge, damping, sgauge
            )
            delta = jnp.where(nvalid[:, None], delta, 0.0)
            poses = jax.vmap(lambda S, d: S @ sim3_exp(d))(poses, delta)
            return poses, err

        poses1, errs = jax.lax.scan(body, poses0, None, length=iters)

        # Final (accept-gate) error on the updated poses.
        r, _, _ = jax.vmap(_edge_terms)(poses1[a_s], poses1[b_s], z_s)
        e_num = jax.lax.psum(jnp.sum((r * r).sum(-1) * w_s * v_s), axis)
        e_den = jax.lax.psum(v_s.sum(), axis)
        errs = jnp.concatenate([errs, (e_num / jnp.maximum(e_den, 1))[None]])
        return poses1, errs

    poses0 = graph.node_pose.reshape(-1, 4, 4)
    poses1, errs_ext = jax.jit(run)(
        poses0, a_idx, b_idx, z, w, valid, gauge_idx, scale_gauge, node_valid
    )
    errs, err1 = errs_ext[:-1], errs_ext[-1]
    accept = jnp.isfinite(err1) & (err1 <= errs[0] * 1.02)
    poses = jnp.where(accept, poses1.reshape(-1, 16), graph.node_pose)
    return graph._replace(node_pose=poses), errs
