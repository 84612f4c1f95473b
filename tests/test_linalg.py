"""Oracle tests for the unrolled/blocked SPD solvers (ops/linalg.py).

Oracle = numpy's LAPACK solve on the same f64-promoted systems; the TPU
kernels run f32, so tolerances are f32-scale (SURVEY.md §7 "f32 geometry").
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vo_tpu.ops.linalg import (
    chol_small,
    spd_solve_blocked,
    spd_solve_small,
    tri_solve_lower,
    tri_solve_lower_t,
)


def _spd(rng, n, batch=()):
    M = rng.normal(size=batch + (n, n)).astype(np.float32)
    return M @ np.swapaxes(M, -1, -2) + n * np.eye(n, dtype=np.float32)


@pytest.mark.parametrize("n", [3, 6, 7])
def test_chol_small_matches_numpy(n):
    rng = np.random.default_rng(2023)
    A = _spd(rng, n, batch=(5,))
    L = np.asarray(chol_small(jnp.asarray(A), n))
    L_np = np.linalg.cholesky(A.astype(np.float64))
    np.testing.assert_allclose(L, L_np, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("n", [6, 7])
def test_tri_solves(n):
    rng = np.random.default_rng(7)
    A = _spd(rng, n)
    L = np.linalg.cholesky(A.astype(np.float64)).astype(np.float32)
    B = rng.normal(size=(n, 4)).astype(np.float32)
    X = np.asarray(tri_solve_lower(jnp.asarray(L), jnp.asarray(B), n))
    np.testing.assert_allclose(L @ X, B, atol=1e-4)
    Xt = np.asarray(tri_solve_lower_t(jnp.asarray(L), jnp.asarray(B), n))
    np.testing.assert_allclose(L.T @ Xt, B, atol=1e-4)


@pytest.mark.parametrize("n", [6, 7, 12])
def test_spd_solve_small(n):
    rng = np.random.default_rng(11)
    A = _spd(rng, n, batch=(8,))
    b = rng.normal(size=(8, n)).astype(np.float32)
    x = np.asarray(spd_solve_small(jnp.asarray(A), jnp.asarray(b), n))
    # NumPy 2.x solve treats a 2-D b as a matrix stack; add/strip a trailing
    # column axis so the oracle solves stacked vectors.
    x_np = np.linalg.solve(A.astype(np.float64), b.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(x, x_np, rtol=3e-3, atol=3e-3)


@pytest.mark.parametrize("w,b", [(6, 6), (4, 7), (2, 3)])
def test_spd_solve_blocked_matches_dense(w, b):
    rng = np.random.default_rng(42)
    n = w * b
    A = _spd(rng, n)
    rhs = rng.normal(size=(n,)).astype(np.float32)
    # Block layout (W, W, B, B): S[i, j] = A[i*b:(i+1)*b, j*b:(j+1)*b]
    S = A.reshape(w, b, w, b).transpose(0, 2, 1, 3)
    x = np.asarray(
        spd_solve_blocked(jnp.asarray(S), jnp.asarray(rhs.reshape(w, b)))
    ).reshape(n)
    x_np = np.linalg.solve(A.astype(np.float64), rhs.astype(np.float64))
    np.testing.assert_allclose(x, x_np, rtol=3e-3, atol=3e-3)


def test_spd_solve_blocked_with_gauge_scale():
    """The BA system adds a 1e8 gauge diagonal to one block — the factorization
    must stay finite and the ungauged blocks must still solve accurately."""
    rng = np.random.default_rng(3)
    w, b = 6, 6
    A = _spd(rng, w * b)
    A[:b, :b] += 1e8 * np.eye(b, dtype=np.float32)
    rhs = rng.normal(size=(w * b,)).astype(np.float32)
    S = A.reshape(w, b, w, b).transpose(0, 2, 1, 3)
    x = np.asarray(
        spd_solve_blocked(jnp.asarray(S), jnp.asarray(rhs.reshape(w, b)))
    ).reshape(w * b)
    x_np = np.linalg.solve(A.astype(np.float64), rhs.astype(np.float64))
    assert np.isfinite(x).all()
    np.testing.assert_allclose(x[b:], x_np[b:], rtol=5e-3, atol=5e-3)


def test_spd_solve_blocked_jits():
    rng = np.random.default_rng(5)
    A = _spd(rng, 36)
    S = jnp.asarray(A.reshape(6, 6, 6, 6).transpose(0, 2, 1, 3))
    rhs = jnp.asarray(rng.normal(size=(6, 6)).astype(np.float32))
    f = jax.jit(spd_solve_blocked)
    np.testing.assert_allclose(
        np.asarray(f(S, rhs)), np.asarray(spd_solve_blocked(S, rhs)),
        rtol=1e-5, atol=1e-5,
    )

# The TPU-only bf16-cancellation regression for spd_solve_blocked (the r4
# frame-42 divergence) lives in tools/check_pallas_tpu.py — the pytest
# harness pins the suite to the CPU mesh, so on-device checks run through
# that subprocess tool (tests/test_pallas_tpu.py).
