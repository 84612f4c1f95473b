"""Closed-form SO(3)/SE(3) exponential and logarithm maps.

Replaces the reference's scipy expm/logm calls (helpers.py:86-128,
twist_to_H_matrix / H_matrix_to_twist) with Rodrigues-style closed forms that
jit, vmap, and differentiate on TPU in f32. Taylor fallbacks keep everything
finite and smooth through the theta -> 0 limit (important both for numerics
and for autodiff through Gauss-Newton pose refinement).

Twist convention: xi = (v, w) with translation part first, so
se3_exp(xi) = [[exp(skew(w)), V(w) @ v], [0, 1]].
"""

from __future__ import annotations

import jax.numpy as jnp

from vo_tpu.geom.points import skew, unskew

# Below this angle the Taylor series of the rotation coefficients is used.
_SMALL = 1e-5


def _sinc_coeffs(theta_sq: jnp.ndarray):
    """A = sin(t)/t, B = (1-cos(t))/t^2, C = (1 - A)/t^2, smooth at 0."""
    theta = jnp.sqrt(jnp.maximum(theta_sq, 0.0))
    small = theta_sq < _SMALL**2
    # Guard so the "large" branch never sees 0 (grad-safety under where).
    safe_sq = jnp.where(small, 1.0, theta_sq)
    safe_t = jnp.sqrt(safe_sq)
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(safe_t) / safe_t)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(safe_t)) / safe_sq)
    c = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (1.0 - a) / safe_sq)
    return a, b, c


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, _ = _sinc_coeffs(theta_sq)
    K = skew(w)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * KK


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation -> (..., 3) axis-angle, robust near 0 and pi.

    Near theta=pi the antisymmetric part vanishes; there the axis is
    recovered from the symmetric part S = (R + I), whose columns are
    proportional to the axis (S = 2 aa^T at exactly pi).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip(0.5 * (trace - 1.0), -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    axis_vec = unskew(R)  # = sin(theta) * axis

    sin_t = jnp.sin(theta)
    near_pi = cos_t < -1.0 + 1e-4
    small = theta < _SMALL

    # Generic branch: w = theta / (2 sin(theta)) * unskew(R - R^T) * 2.
    safe_sin = jnp.where(small | near_pi, 1.0, sin_t)
    w_generic = axis_vec * (theta / safe_sin)[..., None]

    # Small-angle branch: w ~ unskew(R) * (1 + theta^2/6).
    w_small = axis_vec * (1.0 + theta * theta / 6.0)[..., None]

    # Near-pi branch: axis from the dominant column of R + I.
    S = R + jnp.eye(3, dtype=R.dtype)
    col_norms = jnp.linalg.norm(S, axis=-2)
    k = jnp.argmax(col_norms, axis=-1)
    axis = jnp.take_along_axis(S, k[..., None, None], axis=-1)[..., 0]
    axis = axis / jnp.maximum(
        jnp.linalg.norm(axis, axis=-1, keepdims=True), jnp.finfo(R.dtype).tiny
    )
    # Fix the sign so it agrees with the antisymmetric part when nonzero.
    sign = jnp.where(jnp.sum(axis * axis_vec, axis=-1) < 0.0, -1.0, 1.0)
    w_pi = axis * (sign * theta)[..., None]

    w = jnp.where(near_pi[..., None], w_pi, w_generic)
    return jnp.where(small[..., None], w_small, w)


def _left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian V(w): translation mixer of the SE(3) exp."""
    theta_sq = jnp.sum(w * w, axis=-1)
    _, b, c = _sinc_coeffs(theta_sq)
    K = skew(w)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + b[..., None, None] * K + c[..., None, None] * KK


def _left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of the SO(3) left Jacobian."""
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 0.0))
    small = theta < _SMALL
    safe_sq = jnp.where(small, 1.0, theta_sq)
    safe_t = jnp.sqrt(safe_sq)
    half = 0.5 * safe_t
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / safe_sq,
    )
    K = skew(w)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye - 0.5 * K + cot_term[..., None, None] * KK


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) twist (v, w) -> (..., 4, 4) homogeneous transform.

    Ref parity: helpers.py:86-103 (twist_to_H_matrix), in closed form.
    """
    v, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    t = (_left_jacobian(w) @ v[..., None])[..., 0]
    batch = xi.shape[:-1]
    H = jnp.zeros(batch + (4, 4), xi.dtype)
    H = H.at[..., :3, :3].set(R)
    H = H.at[..., :3, 3].set(t)
    H = H.at[..., 3, 3].set(1.0)
    return H


def se3_log(H: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) transform -> (..., 6) twist (v, w).

    Ref parity: helpers.py:105-128 (H_matrix_to_twist), in closed form.
    """
    w = so3_log(H[..., :3, :3])
    v = (_left_jacobian_inv(w) @ H[..., :3, 3:4])[..., 0]
    return jnp.concatenate([v, w], axis=-1)


# ---------------------------------------------------------------------------
# Sim(3): similarity transforms (sR, t) — monocular loop closure needs the
# scale DoF (scale drift cannot be expressed in SE(3); Strasdat et al.,
# "Scale Drift-Aware Large Scale Monocular SLAM", RSS 2010 — the technique
# ORB-SLAM uses for mono loop closure). Twist order: (v, w, lam).
# ---------------------------------------------------------------------------


def _sim3_W(w: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Translation mixer of the Sim(3) exp: W = int_0^1 e^{lam*tau} R(tau*w) dtau.

    Closed form via the scalar integrals (s = e^lam, theta = |w|):
      C  = int e^{lam t}            = (s - 1)/lam
      A' = int e^{lam t} sin(th t)  = (s(lam sin th - th cos th) + th)/(lam^2+th^2)
      B' = int e^{lam t} cos(th t)  = (s(lam cos th + th sin th) - lam)/(lam^2+th^2)
      W  = C I + (A'/th) [w]x + ((C - B')/th^2) [w]x^2
    with series fallbacks where lam and/or theta vanish (at lam=0 this
    reduces exactly to the SE(3) left Jacobian)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.where(theta_sq < 1e-12, 1.0, theta_sq))
    s = jnp.exp(lam)
    lam_small = jnp.abs(lam) < 1e-4
    th_small = theta_sq < 1e-8
    lam_safe = jnp.where(lam_small, 1.0, lam)
    denom = lam * lam + theta_sq

    C = jnp.where(lam_small, 1.0 + lam / 2.0 + lam * lam / 6.0,
                  (s - 1.0) / lam_safe)
    # alpha = A'/theta ; beta = (C - B')/theta^2
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    denom_safe = jnp.where(th_small & lam_small, 1.0, denom)
    Ap = (s * (lam * sin_t - theta * cos_t) + theta) / denom_safe
    Bp = (s * (lam * cos_t + theta * sin_t) - lam) / denom_safe
    # Small-theta series (lam general): alpha -> D, beta -> E/2 with
    # D = int t e^{lam t} = (s(lam-1)+1)/lam^2, E = int t^2 e^{lam t}.
    D = jnp.where(lam_small, 0.5 + lam / 3.0,
                  (s * (lam_safe - 1.0) + 1.0) / (lam_safe * lam_safe))
    E = jnp.where(
        lam_small, 1.0 / 3.0 + lam / 4.0,
        (s * (lam_safe * lam_safe - 2.0 * lam_safe + 2.0) - 2.0)
        / (lam_safe ** 3),
    )
    alpha = jnp.where(th_small, D, Ap / theta)
    beta = jnp.where(th_small, 0.5 * E, (C - Bp) / jnp.where(th_small, 1.0, theta_sq))

    K = skew(w)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return (C[..., None, None] * eye + alpha[..., None, None] * K
            + beta[..., None, None] * KK)


def sim3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) twist (v, w, lam) -> (..., 4, 4) similarity [[e^lam R, Wv],[0,1]]."""
    v, w, lam = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3_exp(w)
    t = (_sim3_W(w, lam) @ v[..., None])[..., 0]
    batch = xi.shape[:-1]
    H = jnp.zeros(batch + (4, 4), xi.dtype)
    H = H.at[..., :3, :3].set(jnp.exp(lam)[..., None, None] * R)
    H = H.at[..., :3, 3].set(t)
    H = H.at[..., 3, 3].set(1.0)
    return H


def sim3_log(S: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) similarity -> (..., 7) twist (v, w, lam)."""
    sR = S[..., :3, :3]
    # det(sR) = s^3
    det = jnp.linalg.det(sR)
    s = jnp.cbrt(jnp.maximum(det, 1e-30))
    lam = jnp.log(s)
    R = sR / s[..., None, None]
    w = so3_log(R)
    W = _sim3_W(w, lam)
    v = jnp.linalg.solve(W, S[..., :3, 3:4])[..., 0]
    return jnp.concatenate([v, w, lam[..., None]], axis=-1)


def sim3_inverse(S: jnp.ndarray) -> jnp.ndarray:
    """[[sR, t],[0,1]]^-1 = [[s^-1 R^T, -s^-1 R^T t],[0,1]]."""
    sR = S[..., :3, :3]
    det = jnp.linalg.det(sR)
    s = jnp.cbrt(jnp.maximum(det, 1e-30))
    Rt = jnp.swapaxes(sR, -1, -2) / (s * s)[..., None, None]
    out = jnp.zeros_like(S)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3:4].set(-Rt @ S[..., :3, 3:4])
    out = out.at[..., 3, 3].set(1.0)
    return out


def pose_inverse(H: jnp.ndarray) -> jnp.ndarray:
    """Fast inverse of a rigid transform: [[R,t],[0,1]]^-1 = [[R^T,-R^T t],[0,1]]."""
    R = H[..., :3, :3]
    t = H[..., :3, 3:4]
    Rt = jnp.swapaxes(R, -1, -2)
    out = jnp.zeros_like(H)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3:4].set(-Rt @ t)
    out = out.at[..., 3, 3].set(1.0)
    return out
