"""SO(3)/SE(3) Lie-group operations, batched and jit-safe.

Poses are (R (3,3), t (3,)) tuples; tangent vectors are (6,) [rho, phi]
(translation part first). All branches use jnp.where with Taylor guards so
gradients flow through the small-angle limit — the geometry stack (RANSAC,
BA, pose graph) differentiates through these maps.

No reference analogue (the reference stops at descriptor export); this is
the north-star SfM extension (BASELINE.json configs 4-5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jax.Array) -> jax.Array:
    """(…, 3) -> (…, 3, 3) skew-symmetric matrices."""
    x, y, z = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zeros, -z, y], -1),
        jnp.stack([z, zeros, -x], -1),
        jnp.stack([-y, x, zeros], -1),
    ], -2)


def vee(m: jax.Array) -> jax.Array:
    """Inverse of hat: (…, 3, 3) -> (…, 3)."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], -1)


def so3_exp(phi: jax.Array) -> jax.Array:
    """Rodrigues: (…, 3) -> (…, 3, 3) rotation matrices.

    Uses the "safe theta" double-where pattern so forward/reverse
    derivatives at phi = 0 are finite (a bare jnp.linalg.norm has a NaN
    tangent at the origin that leaks through a single where).
    """
    th_sq = jnp.sum(phi * phi, axis=-1)[..., None, None]
    small = th_sq < _EPS
    th_sq_safe = jnp.where(small, 1.0, th_sq)
    th = jnp.sqrt(th_sq_safe)
    k = hat(phi)
    k2 = jnp.matmul(k, k)
    a = jnp.where(small, 1.0 - th_sq / 6.0, jnp.sin(th) / th)
    b = jnp.where(small, 0.5 - th_sq / 24.0, (1.0 - jnp.cos(th)) / th_sq_safe)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), k.shape)
    return eye + a * k + b * k2


def so3_log(r: jax.Array) -> jax.Array:
    """(…, 3, 3) -> (…, 3) rotation vectors (angle in [0, pi]).

    Differentiable at the identity: uses atan2 over the safe-guarded
    antisymmetric part instead of arccos (whose derivative blows up at
    theta = 0 — the common case of an exactly-satisfied pose-graph edge).
    """
    tr = jnp.trace(r, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)[..., None]
    w = vee(r - jnp.swapaxes(r, -1, -2)) * 0.5      # sin(theta) * axis
    sin_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    small0 = (sin_sq < _EPS) & (cos > 0.0)          # theta ~ 0
    sin_safe = jnp.sqrt(jnp.where(small0, 1.0, sin_sq))
    theta = jnp.arctan2(sin_safe, cos)
    # theta/sin: Taylor 1 + theta^2/6 near zero (theta^2 ~ sin^2 there)
    scale = jnp.where(small0, 1.0 + sin_sq / 6.0, theta / sin_safe)
    out_main = w * scale

    # near pi the antisymmetric part degenerates; symmetric construction
    near_pi = cos < -0.999
    rr = (r + jnp.swapaxes(r, -1, -2)) * 0.5
    diag = jnp.diagonal(rr, axis1=-2, axis2=-1)
    axis_sq = jnp.clip((diag - cos) / (1.0 - cos + _EPS), 0.0, None)
    axis = jnp.sqrt(axis_sq)
    sign = jnp.where(w >= 0, 1.0, -1.0)
    w_pi = axis * sign * theta
    return jnp.where(near_pi, w_pi, out_main)


def _so3_left_jacobian(phi: jax.Array) -> jax.Array:
    th_sq = jnp.sum(phi * phi, axis=-1)[..., None, None]
    small = th_sq < _EPS
    th_sq_safe = jnp.where(small, 1.0, th_sq)
    th = jnp.sqrt(th_sq_safe)
    k = hat(phi)
    k2 = jnp.matmul(k, k)
    b = jnp.where(small, 0.5 - th_sq / 24.0, (1.0 - jnp.cos(th)) / th_sq_safe)
    c = jnp.where(small, 1.0 / 6.0 - th_sq / 120.0,
                  (th - jnp.sin(th)) / (th_sq_safe * th))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), k.shape)
    return eye + b * k + c * k2


def se3_exp(xi: jax.Array):
    """(…, 6) [rho, phi] -> (R, t)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    r = so3_exp(phi)
    j = _so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", j, rho)
    return r, t


def se3_log(r: jax.Array, t: jax.Array) -> jax.Array:
    """(R, t) -> (…, 6) [rho, phi]."""
    phi = so3_log(r)
    j = _so3_left_jacobian(phi)
    rho = jnp.linalg.solve(j, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], -1)


def se3_compose(r1, t1, r2, t2):
    """(R1,t1) ∘ (R2,t2): x -> R1(R2 x + t2) + t1."""
    return jnp.matmul(r1, r2), jnp.einsum("...ij,...j->...i", r1, t2) + t1


def se3_inverse(r, t):
    rt = jnp.swapaxes(r, -1, -2)
    return rt, -jnp.einsum("...ij,...j->...i", rt, t)


def se3_apply(r, t, x):
    """Apply pose to points: (…, 3, 3), (…, 3), (…, N, 3) -> (…, N, 3)."""
    return jnp.einsum("...ij,...nj->...ni", r, x) + t[..., None, :]


# -- Sim(3): similarity transforms for monocular scale-drift correction ----

def sim3_compose(r1, t1, s1, r2, t2, s2):
    """(R1,t1,s1) ∘ (R2,t2,s2): x -> s1 R1 (s2 R2 x + t2) + t1."""
    s1 = jnp.asarray(s1)
    r = jnp.matmul(r1, r2)
    t = s1[..., None] * jnp.einsum("...ij,...j->...i", r1, t2) + t1
    return r, t, s1 * s2


def sim3_inverse(r, t, s):
    """Inverse of x -> s R x + t."""
    rt = jnp.swapaxes(r, -1, -2)
    s_inv = 1.0 / jnp.asarray(s)
    return rt, -s_inv[..., None] * jnp.einsum("...ij,...j->...i", rt, t), \
        s_inv


def sim3_exp(xi: jax.Array):
    """(…, 7) [rho, phi, sigma] -> (R, t, s) small-increment retraction.

    Uses the SE(3) exponential for (R, t) and s = exp(sigma) — a valid
    local parameterisation for Gauss-Newton increments (the exact Sim(3)
    exp differs only at second order in ||xi||)."""
    r, t = se3_exp(xi[..., :6])
    return r, t, jnp.exp(xi[..., 6])
