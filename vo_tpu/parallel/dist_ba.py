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

import numpy as np

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


def demo_window(
    num_landmarks: int,
    num_keyframes: int = 4,
    K: np.ndarray | None = None,
    seed: int = 11,
    pix_noise: float = 0.3,
    perturb_pose: float = 0.02,
    perturb_pt: float = 0.1,
) -> BAWindow:
    """Deterministic synthetic BA window (pure numpy, so every process of a
    jax.distributed cluster builds the SAME window without communication):
    forward-translating keyframes observing a planted landmark cloud, with
    noisy observations and perturbed initial geometry — GN has real work to
    do and ground truth is known. Used by the multi-host dist-BA parity
    check (parallel/multihost.py --dist-ba) and tests."""
    if K is None:
        K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    rng = np.random.default_rng(seed)
    L, W = num_landmarks, num_keyframes
    X = np.stack(
        [rng.uniform(-8, 8, L), rng.uniform(-4, 4, L), rng.uniform(12, 40, L)],
        axis=-1,
    ).astype(np.float32)
    poses, uvs = [], []
    for i in range(W):
        T = np.eye(4, dtype=np.float32)
        T[2, 3] = 0.6 * i  # forward along +z
        poses.append(T)
        xc = X - T[:3, 3]  # identity rotation
        uv_h = (K @ xc.T).T
        uv = uv_h[:, :2] / uv_h[:, 2:]
        uvs.append(uv + rng.normal(0, pix_noise, uv.shape))
    kf_pose = np.stack([p.reshape(16) for p in poses]).astype(np.float32)
    # Perturb every non-gauge keyframe translation + all landmark estimates.
    kf_pose[1:, 3::4][:, :3] += rng.normal(0, perturb_pose, (W - 1, 3))
    return BAWindow(
        kf_pose=jnp.asarray(kf_pose),
        kf_valid=jnp.ones((W,), bool),
        obs_uv=jnp.asarray(np.stack(uvs, axis=1).astype(np.float32)),
        obs_mask=jnp.ones((L, W), bool),
        landmark=jnp.asarray(
            (X + rng.normal(0, perturb_pt, X.shape)).astype(np.float32)
        ),
        lm_uid=jnp.arange(L, dtype=jnp.int32),
        lm_valid=jnp.ones((L,), bool),
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
