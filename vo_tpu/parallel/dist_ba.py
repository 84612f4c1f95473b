"""Distributed sliding-window bundle adjustment over a device mesh.

The TPU-native analog of the reference's (absent) sequence parallelism
(SURVEY.md §5): landmark rows of the BA window are sharded across the
"model" mesh axis; every shard computes the residuals/Jacobians of its own
landmarks, the camera-side normal equations (U, b_c, the Schur complement
S and the reduced gradient) are summed with `psum` over ICI, each shard
solves the identical tiny (6W x 6W) reduced camera system, and landmark
back-substitution stays shard-local. Communication per GN iteration is
O(W^2) camera blocks — independent of the landmark count.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vo_tpu.models.ba import BAWindow, ba_refine


def _window_specs() -> BAWindow:
    """PartitionSpecs per BAWindow field: landmark rows sharded on "model",
    keyframe state replicated."""
    return BAWindow(
        kf_pose=P(),
        kf_valid=P(),
        obs_uv=P("model"),
        obs_mask=P("model"),
        landmark=P("model"),
        lm_uid=P("model"),
        lm_valid=P("model"),
    )


def shard_window(window: BAWindow, mesh: Mesh) -> BAWindow:
    """Place a window on the mesh with landmark rows sharded over "model"."""
    return jax.tree.map(
        lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec)),
        window,
        _window_specs(),
    )


def distributed_ba_refine(
    mesh: Mesh,
    window: BAWindow,
    K: jnp.ndarray,
    iters: int = 5,
    damping: float = 1e-3,
    huber_px: float = 2.0,
) -> tuple[BAWindow, jnp.ndarray]:
    """ba_refine with landmarks sharded over the mesh "model" axis.

    Numerically identical to the single-device ba_refine (the psum is the
    same sum, reassociated); returns (refined window, error trace)."""
    specs = _window_specs()

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(specs, P()),
        out_specs=(specs, P()),
    )
    def run(win, K_):
        return ba_refine(
            win, K_, iters=iters, damping=damping, huber_px=huber_px,
            reduce_fn=lambda x: jax.lax.psum(x, "model"),
        )

    return run(window, K)
