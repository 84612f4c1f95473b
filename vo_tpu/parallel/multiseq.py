"""Data-parallel multi-sequence VO.

The TPU-native form of throughput scaling for an inherently sequential
problem (frame t+1 needs pose t — SURVEY §7 "hard parts"): run B
independent sequences in lockstep, one jitted step over a batched VOState,
sharded over the mesh "data" axis. Latency per sequence is unchanged;
aggregate frames/s scales with chips. This is the multi-sequence eval mode
BASELINE.json names ("Full KITTI 00-10 suite").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vo_tpu.models.pipeline import VOState, vo_step
from vo_tpu.utils.config import VOConfig


def replicate_state(state: VOState, batch: int) -> VOState:
    """Tile a single-sequence VOState into a batched one (leading axis B)."""
    tiled = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape), state
    )
    # Independent RNG streams per sequence.
    keys = jax.random.split(state.rng, batch)
    return tiled._replace(rng=keys)


@partial(jax.jit, static_argnames=("cfg",))
def batched_vo_step(states: VOState, images: jnp.ndarray, K: jnp.ndarray, cfg: VOConfig):
    """vmapped per-frame step: states/images/K carry a leading batch axis.

    The Pallas kernels stay live under the vmap: their `custom_vmap` rules
    (pallas_kernels.corner_response_nms_auto / extract_patches_aligned_auto)
    dispatch to batched (B, ...) grid variants, so multi-sequence mode runs
    the same fused front-end as single-sequence mode."""
    return jax.vmap(lambda s, i, k: vo_step(s, i, k, cfg))(states, images, K)


def shard_batched_state(states: VOState, mesh: Mesh) -> VOState:
    """Place a batched VOState so the batch axis lives on the mesh "data"
    axis (XLA then runs each sequence's step on its own devices)."""
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, states)


@partial(jax.jit, static_argnames=("cfg",))
def batched_vo_rollout(states: VOState, images: jnp.ndarray, Ks: jnp.ndarray, cfg: VOConfig):
    """Scan `batched_vo_step` over a stacked (N, B, H, W) frame block.

    The whole multi-sequence loop runs as one device program: N sequential
    frames of B independent sequences in lockstep (B sharded over the mesh
    "data" axis when the states/images are placed with
    `shard_batched_state` / `data_sharding`). Returns the final batched
    state and per-frame stacked StepOutputs with shape (N, B, ...)."""

    def body(st, img):
        return batched_vo_step(st, img, Ks, cfg)

    return jax.lax.scan(body, states, images)


def make_sharded_rollout(mesh: Mesh, cfg: VOConfig):
    """Rollout with the batch EXPLICITLY shard_mapped over the mesh "data"
    axis — the deployment shape for multi-chip / multi-host lockstep lanes.

    Why not plain jit + GSPMD propagation (`batched_vo_rollout`)? Lanes are
    fully independent, but two ops inside `vo_step` break propagation and
    make XLA insert per-frame collectives (measured on the 2-process CPU
    cluster, see run_multiseq.py --multihost):

      * the LK early-exit `lax.while_loop`: an SPMD loop condition must be
        uniform across participants, so XLA all-reduces it — one cross-host
        rendezvous per LK iteration per frame;
      * `top_k` (detection NMS, descriptor matching): the TopK custom-call
        is not partition-aware, so XLA all-gathers full per-lane response
        maps every frame.

    Under `shard_map` each device traces vo_step on its LOCAL lanes only:
    loop conditions are local, top_k is local, and the program contains
    zero collectives by construction. This is the difference between ~77 %
    and ~100 % weak-scaling efficiency at 2 hosts.
    """
    from jax.experimental.shard_map import shard_map

    def local(states, images, Ks):
        def body(st, img):
            return jax.vmap(lambda s, i, k: vo_step(s, i, k, cfg))(st, img, Ks)

        return jax.lax.scan(body, states, images)

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P("data"), P(None, "data"), P("data")),
            out_specs=(P("data"), P(None, "data")),
            check_rep=False,
        )
    )
