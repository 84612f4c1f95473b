"""Host-facing pose-graph back-end: ties the long-term keyframe DB
(models/keyframe_db.py) and the SE(3) pose graph (models/pose_graph.py) to
the live VO front-end.

The reference has no back-end at all (its State holds two frames,
state.py:9-13; Report.pdf 3.1.1 proposes one as future work). Design here:
the front-end runs device-resident (vo_rollout lax.scan); the back-end
consumes a sparse keyframe stream on the host — one jitted call bundle every
`every` frames, off the per-frame critical path — and produces a globally
consistent trajectory at the end (or whenever `optimize()` is called):

    driver chunk loop ──> on_keyframe(image, pose, table, frame)
                              ├─ make_entry        (jit: patches + gdesc)
                              ├─ cull if full      (jit: graph+db compaction)
                              ├─ add_node / add_entry
                              ├─ query_loop        (jit: MXU gdesc matmul)
                              └─ verify_loop       (jit: match + P3P RANSAC)
    end of run        ──> optimize() -> corrected trajectory

Loop-closure feedback into the live map is deliberately NOT done (classic
VO/SLAM split: the front-end stays drift-local, the back-end owns global
consistency); EVAL.md measures what the post-hoc correction buys.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from vo_tpu.models.keyframe_db import (
    KeyframeDB,
    add_entry,
    cull_entry,
    empty_db,
    make_entry,
    query_loop_topk,
    verify_loop,
)
from vo_tpu.models.pose_graph import (
    PoseGraph,
    add_loop_edge,
    add_node,
    chain_span_scores,
    correct_trajectory,
    cull_node,
    empty_pose_graph,
    pg_optimize,
)


@dataclasses.dataclass(frozen=True)
class BackendConfig:
    nodes: int = 256  # pose-graph / DB capacity
    loop_edges: int = 32
    obs_per_entry: int = 256
    patch_radius: int = 8  # 17x17 patches: repetitive-texture discrimination
    grid: int = 16
    min_frame_gap: int = 100  # place recognition: ignore recent frames
    min_similarity: float = 0.85
    # Candidates verified per keyframe — ONE vmapped launch covers all of
    # them (retrieval is cheap and geometric verification is the real
    # filter, so trying several raises recall at ~no wall-clock cost).
    topk: int = 4
    # Verification gate. Measured separation on the LOOP_SPEC circuit:
    # genuine revisits score 11-38 P3P inliers, the best FALSE candidate
    # (self-similar straight-road views, correctly rejected by geometry)
    # scores 10 — 18 keeps a margin while accepting the drifted revisits
    # that 25 turned away (they carry most of the tail anchoring).
    min_inliers: int = 18
    ratio: float = 0.8
    inlier_threshold_px: float = 2.0
    search_radius_px: float = 120.0  # verification spatial gate (same-lane)
    pg_iters: int = 12
    pg_damping: float = 1e-4
    seq_weight: float = 1.0


class PoseGraphBackend:
    """Stateful host wrapper; all compute inside is jitted + fixed-shape."""

    def __init__(self, K: jnp.ndarray, cfg: BackendConfig = BackendConfig()):
        self.cfg = cfg
        self.K = K
        self.graph: PoseGraph = empty_pose_graph(
            cfg.nodes, cfg.loop_edges, cfg.seq_weight
        )
        self.db: KeyframeDB = empty_db(
            cfg.nodes, cfg.obs_per_entry, cfg.patch_radius, cfg.grid
        )
        self.key = jax.random.PRNGKey(7)
        self.loops: list[dict] = []  # accepted loop constraints (telemetry)
        self.rejected: list[dict] = []  # candidates that failed verification
        self.n_culled = 0
        self._jit_make_entry = jax.jit(
            make_entry,
            static_argnames=("obs_per_entry", "patch_radius", "grid"),
        )
        self._jit_query = jax.jit(
            query_loop_topk,
            static_argnames=("k", "min_frame_gap", "min_similarity"),
        )
        # All top-k candidates verify in ONE vmapped launch (match matmul +
        # P3P-RANSAC per candidate, batched over the candidate axis).
        def _verify_batch(keys, db, idxs, entry, K, *, ratio,
                          inlier_threshold_px, min_inliers,
                          search_radius_px):
            return jax.vmap(
                lambda k_, i_: verify_loop(
                    k_, db, i_, entry, K, ratio=ratio,
                    inlier_threshold_px=inlier_threshold_px,
                    min_inliers=min_inliers,
                    search_radius_px=search_radius_px,
                )
            )(keys, idxs)

        self._jit_verify = jax.jit(
            _verify_batch,
            static_argnames=(
                "ratio", "inlier_threshold_px", "min_inliers",
                "search_radius_px",
            ),
        )
        self._jit_cull_node = jax.jit(cull_node)
        self._jit_cull_entry = jax.jit(cull_entry)
        self._jit_scores = jax.jit(chain_span_scores)
        self._jit_add_node = jax.jit(add_node)
        self._jit_add_entry = jax.jit(add_entry)
        self._jit_add_loop = jax.jit(add_loop_edge)

    def on_keyframe(self, image, pose, table, frame: int) -> dict | None:
        """Register a pose-graph keyframe. Returns loop info if one was
        accepted (dict), else None."""
        c = self.cfg
        entry = self._jit_make_entry(
            jnp.asarray(image), table.xy, table.landmark, table.score,
            table.state >= 2, jnp.asarray(pose), jnp.asarray(frame, jnp.int32),
            obs_per_entry=c.obs_per_entry, patch_radius=c.patch_radius,
            grid=c.grid,
        )
        # Cull to make room BEFORE the add so node id == n_nodes is stable.
        if int(self.graph.n_nodes) >= self.cfg.nodes:
            scores = self._jit_scores(self.graph)
            victim = jnp.argmin(scores)
            if np.isfinite(float(scores[victim])):
                self.graph = self._jit_cull_node(self.graph, victim)
                self.db = self._jit_cull_entry(self.db, victim)
                self.n_culled += 1
        node_id = int(self.graph.n_nodes)
        self.graph = self._jit_add_node(
            self.graph, jnp.asarray(pose), jnp.asarray(frame, jnp.int32)
        )
        # Place recognition against everything stored so far: top-k
        # candidates, all geometrically verified in one vmapped launch.
        cand = self._jit_query(
            self.db, entry, k=c.topk, min_frame_gap=c.min_frame_gap,
            min_similarity=c.min_similarity,
        )
        info = None
        found = np.asarray(cand.found)
        if found.any():
            self.key, sub = jax.random.split(self.key)
            keys = jax.random.split(sub, c.topk)
            res = self._jit_verify(
                keys, self.db, cand.idx, entry, self.K,
                ratio=c.ratio, inlier_threshold_px=c.inlier_threshold_px,
                min_inliers=c.min_inliers,
                search_radius_px=c.search_radius_px,
            )
            ok = np.asarray(res.ok) & found
            inl = np.asarray(res.num_inliers)
            if ok.any():
                best = int(np.argmax(np.where(ok, inl, -1)))
                self.graph = self._jit_add_loop(
                    self.graph, cand.idx[best], jnp.int32(node_id),
                    res.rel[best],
                )
                info = dict(
                    frame=frame, node=node_id,
                    matched_node=int(cand.idx[best]),
                    matched_frame=int(self.db.frame[cand.idx[best]]),
                    similarity=float(cand.similarity[best]),
                    inliers=int(inl[best]),
                )
                self.loops.append(info)
            else:
                # Telemetry: the best-similarity candidate that failed.
                self.rejected.append(dict(
                    frame=frame,
                    matched_frame=int(self.db.frame[cand.idx[0]]),
                    similarity=float(cand.similarity[0]),
                    inliers=int(inl[0]),
                ))
        self.db = self._jit_add_entry(self.db, entry)
        return info

    def optimize(self) -> PoseGraph:
        """Run graph GN; node poses update in place. Returns the graph."""
        before = self.graph.node_pose
        self.graph, errs = pg_optimize(
            self.graph, iters=self.cfg.pg_iters, damping=self.cfg.pg_damping
        )
        self._pre_opt_pose = before
        self._errs = np.asarray(errs)
        return self.graph

    def correct(self, traj: np.ndarray, frame_ids: np.ndarray) -> np.ndarray:
        """Re-anchor a full per-frame trajectory to the optimized keyframes.
        Call after optimize()."""
        assert hasattr(self, "_pre_opt_pose"), "call optimize() first"
        out = correct_trajectory(
            jnp.asarray(traj), jnp.asarray(frame_ids, jnp.int32),
            self.graph.node_frame, self._pre_opt_pose,
            self.graph.node_pose, self.graph.node_valid,
        )
        return np.asarray(out)

    @property
    def n_nodes(self) -> int:
        return int(self.graph.n_nodes)

    @property
    def n_loops(self) -> int:
        return len(self.loops)
