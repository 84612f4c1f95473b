"""Fixed-budget, fully-batched RANSAC.

Capability parity with the reference's generic engine
(src/vo/algorithms/ransac.py:16-129) with the TPU-idiomatic shape: instead of
a data-dependent sequential loop with adaptive termination
(ransac.py:90-121), ALL hypotheses are sampled up front, solved with one
vmap, scored with one batched error reduction, and the winner picked by
argmax — same math, static shapes, no host round-trips. The adaptive
iteration-count formula k = log(1-conf)/log(1-(1-eps)^s) (ransac.py:58-67)
survives as a static budget helper.

Sampling is without replacement per hypothesis, restricted to valid slots,
via Gumbel-top-k — the standard trick for batched masked sampling on
accelerators.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


def num_iterations(
    confidence: float, outlier_ratio: float, sample_size: int, max_iterations: int = 4096
) -> int:
    """Static hypothesis budget from the classic RANSAC formula.

    Ref parity: ransac.py:58-67 — k = log(1-conf) / log(1-(1-eps)^s), used
    here as a compile-time budget instead of an adaptive stop.
    """
    inlier_ratio = 1.0 - outlier_ratio
    p_good = inlier_ratio**sample_size
    if p_good <= 1e-12:
        return max_iterations
    k = math.log(max(1.0 - confidence, 1e-12)) / math.log(max(1.0 - p_good, 1e-12))
    return int(min(max(math.ceil(k), 1), max_iterations))


class RansacResult(NamedTuple):
    model: Any  # best model pytree
    inliers: jnp.ndarray  # (N,) bool inlier mask of the best model
    num_inliers: jnp.ndarray  # () int32
    errors: jnp.ndarray  # (N,) residuals of the best model


def _tree_take(tree, idx):
    return jax.tree_util.tree_map(lambda x: jnp.take(x, idx, axis=0), tree)


def sample_indices(
    key: jax.Array, num_hypotheses: int, num_points: int, sample_size: int,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(H, s) indices, each row distinct and drawn only from valid slots.

    Gumbel-top-k: add iid Gumbel noise to log-validity and take the top s —
    equivalent to uniform sampling without replacement over valid entries.
    """
    logits = (
        jnp.zeros((num_points,), jnp.float32)
        if valid is None
        else jnp.where(valid, 0.0, -jnp.inf)
    )
    g = jax.random.gumbel(key, (num_hypotheses, num_points), jnp.float32)
    _, idx = jax.lax.top_k(logits[None, :] + g, sample_size)
    return idx


def ransac(
    key: jax.Array,
    data: Any,
    num_points: int,
    sample_size: int,
    num_hypotheses: int,
    model_fn: Callable[[Any], tuple[Any, jnp.ndarray]],
    error_fn: Callable[[Any, Any], jnp.ndarray],
    inlier_threshold: float,
    valid: jnp.ndarray | None = None,
    chunk_size: int = 1024,
) -> RansacResult:
    """Run fixed-budget RANSAC.

    Args:
      key: PRNG key.
      data: pytree whose leaves have leading axis N (the population;
            ref parity: `population` arg of ransac.py:69).
      num_points: N (static).
      sample_size: points per minimal sample (ref: `s_points`).
      num_hypotheses: static hypothesis budget (use `num_iterations`).
      model_fn: minimal sample pytree (leaves (s, ...)) ->
            (model pytree, ok bool). `ok=False` marks degenerate samples —
            they simply score zero instead of the reference's
            continue-without-counting hazard (ransac.py:99-101).
      error_fn: (model, data) -> (N,) residuals.
      inlier_threshold: residual threshold (inclusive semantics match
            ransac.py:109: error < threshold).
      valid: optional (N,) bool — slots eligible as samples/inliers (the
            fixed-capacity replacement for the reference's dynamic arrays).
      chunk_size: hypotheses solved/scored per vmapped block. Budgets above
            this run as a `lax.scan` of blocks carrying the running best —
            the (H, N) error matrix never materializes, so reference-scale
            budgets (outlier_ratio=0.9 -> ~1e4 hypotheses,
            ref p3p.py:14-49 + ransac.py:58-67) fit in memory.

    Returns: RansacResult for the argmax-inlier hypothesis.
    """
    valid_f = None if valid is None else valid

    def _score_block(idx_block):
        """(C, s) sample indices -> (models, scores (C,))."""
        c = idx_block.shape[0]
        samples = _tree_take(data, idx_block.reshape(-1))
        samples = jax.tree_util.tree_map(
            lambda x: x.reshape((c, sample_size) + x.shape[1:]), samples
        )
        models, ok = jax.vmap(model_fn)(samples)
        errors = jax.vmap(error_fn, in_axes=(0, None))(models, data)  # (C, N)
        inlier_mask = errors < inlier_threshold
        if valid_f is not None:
            inlier_mask = inlier_mask & valid_f[None, :]
        scores = jnp.sum(inlier_mask, axis=1) * ok.astype(jnp.int32)
        return models, scores, errors, inlier_mask

    if num_hypotheses <= chunk_size:
        idx = sample_indices(key, num_hypotheses, num_points, sample_size, valid)
        models, scores, errors, inlier_mask = _score_block(idx)
        best = jnp.argmax(scores)
        return RansacResult(
            model=_tree_take(models, best),
            inliers=inlier_mask[best],
            num_inliers=scores[best],
            errors=errors[best],
        )

    n_chunks = -(-num_hypotheses // chunk_size)
    idx = sample_indices(
        key, n_chunks * chunk_size, num_points, sample_size, valid
    ).reshape(n_chunks, chunk_size, sample_size)

    def body(carry, idx_block):
        best_score, best_model = carry
        models, scores, _, _ = _score_block(idx_block)
        b = jnp.argmax(scores)
        blk_score = scores[b]
        blk_model = _tree_take(models, b)
        take_new = blk_score > best_score
        model = jax.tree_util.tree_map(
            lambda new, old: jnp.where(take_new, new, old), blk_model, best_model
        )
        return (jnp.maximum(best_score, blk_score), model), None

    m0, _ = model_fn(_tree_take(data, idx[0, 0]))  # structure only
    init_model = jax.tree_util.tree_map(jnp.zeros_like, m0)
    (best_score, best_model), _ = jax.lax.scan(
        body, (jnp.int32(-1), init_model), idx
    )
    errors = error_fn(best_model, data)
    inliers = errors < inlier_threshold
    if valid_f is not None:
        inliers = inliers & valid_f
    return RansacResult(
        model=best_model,
        inliers=inliers,
        num_inliers=inliers.sum(),
        errors=errors,
    )
