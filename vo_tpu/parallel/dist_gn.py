"""Distributed Gauss-Newton: observation-sharded pose refinement.

The first rung of distributed bundle adjustment (SURVEY §5/§7 stage 7):
observations (landmark, pixel) pairs are sharded over the mesh "model"
axis; every shard accumulates its local 6x6 camera-block normal equations
(J^T W J, J^T W r) — pure MXU work — and one `psum` over ICI reduces them
before the tiny 6x6 solve, which is replicated. This is exactly the
camera-block Hessian reduction the full Schur-complement BA performs per
iteration, isolated so it can be tested on a virtual mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from vo_tpu.geom.lie import se3_exp
from vo_tpu.geom.points import skew
from vo_tpu.ops.linalg import spd_solve_small


def _normal_equations(T, X_w, uv, w, K):
    """Local J^T W J (6x6) and J^T W r (6,) for reprojection residuals under
    a left se(3) perturbation of T_cw. Mirrors ops.pnp.refine_pose_gn."""
    fx, fy = K[0, 0], K[1, 1]
    Y = (T[:3, :3] @ X_w[..., None])[..., 0] + T[:3, 3]
    z = Y[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    inv_z = 1.0 / z_safe
    uv_hat = jnp.stack(
        [fx * Y[..., 0] * inv_z + K[0, 2], fy * Y[..., 1] * inv_z + K[1, 2]], axis=-1
    )
    r = uv_hat - uv
    w = w * (z > 1e-6)
    J_pi = jnp.stack(
        [
            jnp.stack([fx * inv_z, jnp.zeros_like(z), -fx * Y[..., 0] * inv_z**2], -1),
            jnp.stack([jnp.zeros_like(z), fy * inv_z, -fy * Y[..., 1] * inv_z**2], -1),
        ],
        axis=-2,
    )
    J_xi = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), Y.shape[:-1] + (3, 3)), -skew(Y)],
        axis=-1,
    )
    J = J_pi @ J_xi
    Jw = J * w[..., None, None]
    H = jnp.einsum("nij,nik->jk", Jw, J)
    g = jnp.einsum("nij,ni->j", Jw, r)
    return H, g


def distributed_refine_pose(
    mesh: Mesh,
    T_cw: jnp.ndarray,
    X_w: jnp.ndarray,  # (N, 3) — N divisible by mesh "model" size
    uv: jnp.ndarray,  # (N, 2)
    weights: jnp.ndarray,  # (N,)
    K: jnp.ndarray,
    iters: int = 5,
    damping: float = 1e-4,
) -> jnp.ndarray:
    """Pose GN with observations sharded over the "model" axis and the 6x6
    normal equations psum-reduced over ICI."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P("model"), P("model"), P("model"), P()),
        out_specs=P(),
    )
    def run(T0, X_shard, uv_shard, w_shard, K_):
        def step(T, _):
            H_loc, g_loc = _normal_equations(T, X_shard, uv_shard, w_shard, K_)
            H = jax.lax.psum(H_loc, "model") + damping * jnp.eye(6, dtype=T.dtype)
            g = jax.lax.psum(g_loc, "model")
            delta = spd_solve_small(H, -g, 6)  # SPD: unrolled Cholesky
            delta = jnp.where(jnp.isfinite(delta).all(), delta, jnp.zeros_like(delta))
            return se3_exp(delta) @ T, None

        T, _ = jax.lax.scan(step, T0, None, length=iters)
        return T

    return run(T_cw, X_w, uv, weights, K)
