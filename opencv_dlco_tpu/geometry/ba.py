"""Two-view bundle adjustment with Schur-complement reduction.

The structure matters more than the size: the point-block Hessian Hpp is
block-diagonal (3x3 per landmark), so each Gauss-Newton step reduces to

    S  = Hcc - sum_n Hcp_n Hpp_n^-1 Hcp_n^T        (6x6 reduced camera system)
    dc = solve(S, bc - sum_n Hcp_n Hpp_n^-1 bp_n)
    dp_n = Hpp_n^-1 (bp_n - Hcp_n^T dc)

— all batched einsums over landmarks. This same reduction is the kernel of
the multi-view distributed BA (landmark blocks shard over the dp axis and
the reduced system psums; BASELINE.json config 5); two-view is its minimal
instance. Jacobian blocks come from vmapped forward-mode autodiff of the
per-point residual. Levenberg-Marquardt damping runs branchlessly inside a
lax.scan.

Camera 1 is gauge-fixed to the identity; inputs are normalized coordinates.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .se3 import se3_exp

_HIGHEST = jax.lax.Precision.HIGHEST


def _point_residual(xi, x3d, r0, t0, obs1, obs2):
    """Residual (4,) of one landmark under a left-multiplicative pose update."""
    dr, dt = se3_exp(xi)
    r2 = dr @ r0
    t2 = dr @ t0 + dt
    p1 = x3d[:2] / x3d[2]
    q = r2 @ x3d + t2
    p2 = q[:2] / q[2]
    return jnp.concatenate([obs1 - p1, obs2 - p2])


def reprojection_residuals(r, t, points, obs1, obs2):
    """(N, 4) residuals for metrics (no pose increment)."""
    zero = jnp.zeros(6, points.dtype)
    return jax.vmap(
        lambda x, o1, o2: _point_residual(zero, x, r, t, o1, o2)
    )(points, obs1, obs2)


class BAResult(NamedTuple):
    r: jax.Array
    t: jax.Array
    points: jax.Array
    cost_history: jax.Array


def huber_weights(res: jax.Array, delta: float) -> jax.Array:
    """IRLS weights of the Huber loss: (N, R) residuals -> (N,) weights.

    w = 1 inside |r| <= delta, delta/|r| outside. Note Huber's linear branch
    keeps a constant-magnitude gradient, so gross outliers retain bounded
    but non-vanishing pull — prefer cauchy_weights for BA.
    """
    norm = jnp.sqrt(jnp.sum(res * res, axis=-1) + 1e-12)
    return jnp.minimum(1.0, delta / norm)


def cauchy_weights(res: jax.Array, scale: float) -> jax.Array:
    """IRLS weights of the Cauchy (Lorentzian) loss: redescending — gross
    outliers get weight ~ (scale/|r|)^2 -> ~0 influence, eliminating the
    pose bias Huber leaves behind."""
    sq = jnp.sum(res * res, axis=-1)
    return 1.0 / (1.0 + sq / (scale * scale))


@functools.partial(jax.jit, static_argnames=("n_iters", "robust_delta"))
def two_view_ba(r0, t0, points0, obs1, obs2, weights=None, *,
                n_iters: int = 12, init_lambda: float = 1e-3,
                robust_delta: float = 0.0) -> BAResult:
    """Jointly refine (R, t) and landmarks; returns the LM trajectory.

    weights: (N,) per-landmark weights (0 masks outliers out of the normal
    equations with static shapes). robust_delta > 0 additionally applies
    Cauchy IRLS reweighting per iteration (normalized-coordinate scale).
    """
    n = points0.shape[0]
    if weights is None:
        weights = jnp.ones((n,), points0.dtype)
    w4 = jnp.repeat(weights[:, None], 4, axis=1)  # (N, 4)

    def linearize(r, t, points):
        zero = jnp.zeros(6, points.dtype)
        res = jax.vmap(
            lambda x, o1, o2: _point_residual(zero, x, r, t, o1, o2)
        )(points, obs1, obs2)                                    # (N, 4)
        if robust_delta > 0.0:
            rw = cauchy_weights(res, robust_delta)
            w4_eff = w4 * rw[:, None]
        else:
            w4_eff = w4
        jc = jax.vmap(
            lambda x, o1, o2: jax.jacfwd(_point_residual, 0)(
                zero, x, r, t, o1, o2)
        )(points, obs1, obs2)                                    # (N, 4, 6)
        jp = jax.vmap(
            lambda x, o1, o2: jax.jacfwd(_point_residual, 1)(
                zero, x, r, t, o1, o2)
        )(points, obs1, obs2)                                    # (N, 4, 3)
        res_w = res * w4_eff
        jc_w = jc * w4_eff[..., None]
        jp_w = jp * w4_eff[..., None]
        hcc = jnp.einsum("nri,nrj->ij", jc_w, jc, precision=_HIGHEST)
        hpp = jnp.einsum("nri,nrj->nij", jp_w, jp, precision=_HIGHEST)
        hcp = jnp.einsum("nri,nrj->nij", jc_w, jp, precision=_HIGHEST)
        bc = -jnp.einsum("nri,nr->i", jc_w, res, precision=_HIGHEST)
        bp = -jnp.einsum("nri,nr->ni", jp_w, res, precision=_HIGHEST)
        cost = jnp.sum(res_w * res)
        return cost, hcc, hpp, hcp, bc, bp

    def solve_schur(hcc, hpp, hcp, bc, bp, lam):
        hpp_d = hpp + lam * jnp.eye(3) * jnp.maximum(
            jnp.einsum("nii->n", hpp)[:, None, None] / 3.0, 1e-8)
        hpp_inv = jnp.linalg.inv(hpp_d + 1e-10 * jnp.eye(3))
        hcc_d = hcc + lam * jnp.diag(jnp.maximum(jnp.diag(hcc), 1e-8))
        s = hcc_d - jnp.einsum("nij,njk,nlk->il", hcp, hpp_inv, hcp,
                               precision=_HIGHEST)
        rhs = bc - jnp.einsum("nij,njk,nk->i", hcp, hpp_inv, bp,
                              precision=_HIGHEST)
        dc = jnp.linalg.solve(s + 1e-10 * jnp.eye(6), rhs)
        dp = jnp.einsum(
            "nij,nj->ni", hpp_inv,
            bp - jnp.einsum("nkj,k->nj", hcp, dc, precision=_HIGHEST),
            precision=_HIGHEST)
        return dc, dp

    def cost_at(r, t, points):
        res = reprojection_residuals(r, t, points, obs1, obs2)
        if robust_delta > 0.0:
            rw = cauchy_weights(res, robust_delta)
            return jnp.sum(res * res * w4 * rw[:, None])
        return jnp.sum(res * res * w4)

    def step(carry, _):
        r, t, points, lam = carry
        cost, hcc, hpp, hcp, bc, bp = linearize(r, t, points)
        dc, dp = solve_schur(hcc, hpp, hcp, bc, bp, lam)
        dr_, dt_ = se3_exp(dc)
        r_new = dr_ @ r
        t_new = dr_ @ t + dt_
        p_new = points + dp
        new_cost = cost_at(r_new, t_new, p_new)
        accept = new_cost < cost
        r = jnp.where(accept, r_new, r)
        t = jnp.where(accept, t_new, t)
        points = jnp.where(accept, p_new, points)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-9, 1e6)
        return (r, t, points, lam), jnp.where(accept, new_cost, cost)

    cost0 = cost_at(r0, t0, points0)
    (r, t, points, _), costs = jax.lax.scan(
        step, (r0, t0, points0, jnp.asarray(init_lambda)), None,
        length=n_iters)
    return BAResult(r=r, t=t, points=points,
                    cost_history=jnp.concatenate([cost0[None], costs]))
