"""Small dense linear-algebra kernels shaped for TPU.

XLA lowers `jnp.linalg.solve` to LU with partial pivoting — a long
sequential pivot/permute loop that costs ~0.3 ms for a single 36x36 system
on v5e (measured in-scan; tools/ablate_step_cost.py). The VO back-end solves
exactly such systems every keyframe (the 6Wx6W Schur camera system,
models/ba.py) and every loop closure (the 7Nx7N pose-graph system), and they
are all SPD by construction (J^T J + damping + gauge), so pivoting buys
nothing. This module provides:

  * `chol_small` / `tri_solve_*` — FULLY UNROLLED Cholesky and triangular
    solves for a static tiny n (6/7/12): pure straight-line scalar/vector
    code, no control flow, ~1000x cheaper than the LU path at n=6;
  * `spd_solve_blocked` — block-Cholesky over an already-blocked (W, W, B, B)
    SPD system: W unrolled block steps whose inner ops are small matmuls.

Wired into production (round 4): `spd_solve_blocked` solves the reduced
camera system in models/ba.py (replacing the 36x36 LU), `spd_solve_small`
solves the 6x6 GN steps in ops/pnp.py refine_pose_gn and
parallel/dist_gn.py; the (7N,7N) pose-graph system (too large to unroll)
uses XLA's blocked Cholesky instead (models/pose_graph.py).

The reference has no analog (scipy/OpenCV solve on CPU hides all of this);
the design is TPU-first per SURVEY.md §7 "fixed-iteration GN ... jitted".
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp

# TPU f32 matmuls default to bf16 passes (8 mantissa bits). A Cholesky
# Schur update `D - L L^T` against the 1e8 gauge block cancels ~8 decimal
# digits — at bf16 the pivot comes out wildly wrong (observed: non-finite
# poses from frame 42 of the headline run). Full-f32 multiplies are
# mandatory here; these blocks are 6x6/7x7 so the cost is nil.
_mm = partial(jnp.matmul, precision="highest")


def chol_small(A: jnp.ndarray, n: int, eps: float = 1e-20) -> jnp.ndarray:
    """Cholesky factor L (lower) of a static-size SPD matrix, fully unrolled.

    A: (..., n, n). Returns (..., n, n) with zeros above the diagonal.
    `eps` floors the pivot so an exactly-singular block yields large-but-
    finite entries instead of NaN (callers gate on isfinite afterwards).
    """
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, eps))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    zero = jnp.zeros_like(A[..., 0, 0])
    rows = [
        jnp.stack([L[i][j] if j <= i else zero for j in range(n)], axis=-1)
        for i in range(n)
    ]
    return jnp.stack(rows, axis=-2)


def tri_solve_lower(L: jnp.ndarray, B: jnp.ndarray, n: int) -> jnp.ndarray:
    """Solve L X = B with L (..., n, n) lower-triangular, B (..., n, m).

    Unrolled forward substitution; rows of X are (..., m) vectors so the
    inner ops stay vectorized over the trailing dimension.
    """
    X = [None] * n
    for i in range(n):
        s = B[..., i, :]
        for k in range(i):
            s = s - L[..., i, k, None] * X[k]
        X[i] = s / L[..., i, i, None]
    return jnp.stack(X, axis=-2)


def tri_solve_lower_t(L: jnp.ndarray, B: jnp.ndarray, n: int) -> jnp.ndarray:
    """Solve L^T X = B (back substitution against the same lower factor)."""
    X = [None] * n
    for i in reversed(range(n)):
        s = B[..., i, :]
        for k in range(i + 1, n):
            s = s - L[..., k, i, None] * X[k]
        X[i] = s / L[..., i, i, None]
    return jnp.stack(X, axis=-2)


def spd_solve_small(A: jnp.ndarray, b: jnp.ndarray, n: int) -> jnp.ndarray:
    """SPD solve A x = b for static tiny n via unrolled Cholesky.

    A: (..., n, n), b: (..., n). Returns (..., n).
    """
    L = chol_small(A, n)
    y = tri_solve_lower(L, b[..., None], n)
    return tri_solve_lower_t(L, y, n)[..., 0]


def spd_solve_blocked(S: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve the SPD block system sum_j S[i,j] x_j = b_i by block-Cholesky.

    S: (W, W, B, B) with S[i, j] = S[j, i]^T (only the lower block triangle
    is read); b: (W, B). W and B are static (python ints). Returns (W, B).

    Cost: W unrolled block-column steps of B-unrolled Cholesky + small
    (B, B) matmuls — ~6x fewer sequential dependencies than the LU lowering
    of the equivalent (W*B, W*B) dense solve, and no pivot gathers.
    """
    W, B = S.shape[0], S.shape[2]
    L = [[None] * W for _ in range(W)]  # lower block triangle; L[j][j] chol
    for j in range(W):
        D = S[j, j]
        for k in range(j):
            D = D - _mm(L[j][k], L[j][k].T)
        Ljj = chol_small(D, B)
        L[j][j] = Ljj
        for i in range(j + 1, W):
            M = S[i, j]
            for k in range(j):
                M = M - _mm(L[i][k], L[j][k].T)
            # X = M Ljj^{-T}  <=>  Ljj X^T = M^T
            L[i][j] = tri_solve_lower(Ljj, M.T, B).T
    # Forward: L y = b (block rows).
    y = [None] * W
    for i in range(W):
        s = b[i]
        for k in range(i):
            s = s - _mm(L[i][k], y[k])
        y[i] = tri_solve_lower(L[i][i], s[:, None], B)[:, 0]
    # Backward: L^T x = y.
    x = [None] * W
    for i in reversed(range(W)):
        s = y[i]
        for k in range(i + 1, W):
            s = s - _mm(L[k][i].T, x[k])
        x[i] = tri_solve_lower_t(L[i][i], s[:, None], B)[:, 0]
    return jnp.stack(x)
