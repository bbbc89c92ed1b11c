"""Pose-graph optimisation over SE(3) relative-pose constraints.

Gauss-Newton on the product manifold of M poses: each edge (i, j, Z_ij)
contributes the residual

    r_e = log( Z_ij^-1 ∘ (T_i^-1 ∘ T_j) )            (6,)

with Jacobian blocks from vmapped forward-mode autodiff of left-
multiplicative increments on T_i and T_j. Edge blocks scatter-add into a
dense (6M, 6M) normal system (fine up to a few hundred keyframes; the
distributed keyframe-partitioned variant shards edges and psums the
reduced system — BASELINE.json config 5). Node 0 is gauge-fixed by a
strong prior. All jit-static shapes; iterations are a lax.scan with
branchless LM damping.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .se3 import se3_compose, se3_exp, se3_inverse, se3_log

_HIGHEST = jax.lax.Precision.HIGHEST


def _huber(chi2, delta2):
    """Edge-level Huber kernel on chi² = w·‖r‖²: (IRLS weight, rho cost).

    Quadratic inside chi² ≤ δ², linear outside — one mis-scaled loop edge
    among hundreds then contributes O(δ·‖r‖) instead of O(‖r‖²) and cannot
    poison the normal equations (the slam_long failure mode: a handful of
    scale-poisoned loop closures dragging the whole trajectory)."""
    safe = jnp.maximum(chi2, 1e-30)
    w = jnp.minimum(1.0, jnp.sqrt(delta2 / safe))
    rho = jnp.where(chi2 <= delta2, chi2,
                    2.0 * jnp.sqrt(delta2 * safe) - delta2)
    return w, rho


def _dcs(chi2, delta2):
    """Dynamic Covariance Scaling (Agarwal et al. ICRA'13): closed-form
    switchable constraints. s = min(1, 2δ²/(δ²+chi²)); weight s², cost
    s²·chi² + gauge terms folded into the constant (monotone in chi²)."""
    s = jnp.minimum(1.0, 2.0 * delta2 / (delta2 + jnp.maximum(chi2, 0.0)))
    return s * s, s * s * chi2 + delta2 * (1.0 - s) ** 2


_ROBUST = {"huber": _huber, "dcs": _dcs}


def _resolve_delta2(chi2_0, weights, robust_delta):
    """δ² for the robust kernel: the caller's fixed value when > 0, else
    4× the median initial chi² over real (weight > 0) edges — computed ONCE
    at the initial state so the cost function is fixed across LM iterations
    (accept/reject stays a comparison of the same objective)."""
    med = jnp.nanmedian(jnp.where(weights > 0, chi2_0, jnp.nan))
    med = jnp.where(jnp.isnan(med), 0.0, med)
    return jnp.maximum(
        jnp.where(robust_delta > 0, robust_delta ** 2, 4.0 * med), 1e-12)


_GNC_BASE = 4.0


def _gnc_scale(k, gnc_iters):
    """Graduated non-convexity schedule: δ²_k = δ² · 4^max(gnc_iters−k, 0).

    A TRUE long-loop closure has the LARGEST initial residual of the whole
    graph (it carries the accumulated drift it exists to correct), so a
    fixed robust kernel downweights exactly the edges worth keeping. GNC
    starts effectively quadratic (huge δ — every edge pulls), then anneals
    ÷4 per iteration to the nominal width: by the time the kernel bites,
    drift-consistent edges have small residuals and only genuinely wrong
    measurements (scale-poisoned loop votes) remain outside δ (Yang et al.,
    "Graduated Non-Convexity for Robust Spatial Perception", RA-L'20).
    Within one LM step both cost evaluations use the same δ²_k, so the
    accept test stays a comparison of one objective."""
    return _GNC_BASE ** jnp.maximum(gnc_iters - k, 0).astype(jnp.float32)


def _edge_residual(xi_i, xi_j, r_i, t_i, r_j, t_j, r_z, t_z):
    """Residual of one edge under increments xi on both endpoint poses."""
    dri, dti = se3_exp(xi_i)
    drj, dtj = se3_exp(xi_j)
    ri, ti = se3_compose(dri, dti, r_i, t_i)
    rj, tj = se3_compose(drj, dtj, r_j, t_j)
    r_rel, t_rel = se3_compose(*se3_inverse(ri, ti), rj, tj)
    r_err, t_err = se3_compose(*se3_inverse(r_z, t_z), r_rel, t_rel)
    return se3_log(r_err, t_err)


class PoseGraphResult(NamedTuple):
    r: jax.Array            # (M, 3, 3)
    t: jax.Array            # (M, 3)
    cost_history: jax.Array


@functools.partial(jax.jit, static_argnames=("n_iters", "robust",
                                              "gnc_iters"))
def optimize_pose_graph(r0, t0, edges_i, edges_j, r_z, t_z,
                        weights=None, *, n_iters: int = 15,
                        init_lambda: float = 1e-4,
                        gauge_weight: float = 1e6,
                        robust: str = "none",
                        robust_delta: float = 0.0,
                        gnc_iters: int = 0) -> PoseGraphResult:
    """Optimise M poses given E relative constraints.

    Args:
      r0, t0: (M, 3, 3), (M, 3) initial poses (world_T_node convention
        consistent with the measurements).
      edges_i, edges_j: (E,) int32 endpoint indices.
      r_z, t_z: (E, 3, 3), (E, 3) measured i_T_j relative poses.
      weights: (E,) edge weights.
      robust: "none" | "huber" | "dcs" — edge-level robust kernel, IRLS
        weights recomputed at every linearization (loop-closure outlier
        rejection; the reference has no graph analogue).
      robust_delta: kernel width; ≤ 0 picks it from the median initial
        edge chi² (see _resolve_delta2).
      gnc_iters: iterations of graduated non-convexity annealing before
        the kernel reaches its nominal width (see _gnc_scale).
    """
    m = r0.shape[0]
    e = edges_i.shape[0]
    if weights is None:
        weights = jnp.ones((e,), t0.dtype)
    zero = jnp.zeros(6, t0.dtype)

    def residuals(r, t):
        ri, ti = r[edges_i], t[edges_i]
        rj, tj = r[edges_j], t[edges_j]
        return jax.vmap(
            lambda a, b, c, d, f, g: _edge_residual(zero, zero, a, b, c, d, f, g)
        )(ri, ti, rj, tj, r_z, t_z)                          # (E, 6)

    if robust != "none":
        rho_fn = _ROBUST[robust]
        res0 = residuals(r0, t0)
        delta2 = _resolve_delta2(
            weights * jnp.sum(res0 * res0, axis=1), weights, robust_delta)

    def linearize(r, t, d2_k):
        ri, ti = r[edges_i], t[edges_i]
        rj, tj = r[edges_j], t[edges_j]
        res = residuals(r, t)
        ja = jax.vmap(
            lambda a, b, c, d, f, g: jax.jacfwd(_edge_residual, 0)(
                zero, zero, a, b, c, d, f, g)
        )(ri, ti, rj, tj, r_z, t_z)                          # (E, 6, 6)
        jb = jax.vmap(
            lambda a, b, c, d, f, g: jax.jacfwd(_edge_residual, 1)(
                zero, zero, a, b, c, d, f, g)
        )(ri, ti, rj, tj, r_z, t_z)
        chi2 = weights * jnp.sum(res * res, axis=1)
        if robust == "none":
            return res, ja, jb, jnp.sum(chi2), weights
        rw, rho = rho_fn(chi2, d2_k)
        return res, ja, jb, jnp.sum(rho), weights * rw

    def build_normal(res, ja, jb, weights):
        w = weights[:, None, None]
        haa = w * jnp.einsum("eri,erj->eij", ja, ja, precision=_HIGHEST)
        hbb = w * jnp.einsum("eri,erj->eij", jb, jb, precision=_HIGHEST)
        hab = w * jnp.einsum("eri,erj->eij", ja, jb, precision=_HIGHEST)
        ba = -jnp.einsum("e,eri,er->ei", weights, ja, res)
        bb = -jnp.einsum("e,eri,er->ei", weights, jb, res)
        h = jnp.zeros((m, m, 6, 6), res.dtype)
        h = h.at[edges_i, edges_i].add(haa)
        h = h.at[edges_j, edges_j].add(hbb)
        h = h.at[edges_i, edges_j].add(hab)
        h = h.at[edges_j, edges_i].add(jnp.swapaxes(hab, -1, -2))
        b = jnp.zeros((m, 6), res.dtype)
        b = b.at[edges_i].add(ba)
        b = b.at[edges_j].add(bb)
        # gauge prior on node 0
        h = h.at[0, 0].add(gauge_weight * jnp.eye(6))
        return h, b

    def step(carry, k):
        r, t, lam = carry
        d2_k = (delta2 * _gnc_scale(k, gnc_iters)) if robust != "none" \
            else None
        res, ja, jb, cost, w_eff = linearize(r, t, d2_k)
        h, b = build_normal(res, ja, jb, w_eff)
        hd = h.transpose(0, 2, 1, 3).reshape(6 * m, 6 * m)
        hd = hd + lam * jnp.diag(jnp.maximum(jnp.diag(hd), 1e-8))
        dx = jnp.linalg.solve(hd + 1e-9 * jnp.eye(6 * m),
                              b.reshape(-1)).reshape(m, 6)
        dr, dt = se3_exp(dx)
        r_new, t_new = se3_compose(dr, dt, r, t)
        _, _, _, new_cost, _ = linearize(r_new, t_new, d2_k)
        accept = new_cost < cost
        r = jnp.where(accept, r_new, r)
        t = jnp.where(accept, t_new, t)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
        return (r, t, lam), jnp.where(accept, new_cost, cost)

    _, _, _, cost0, _ = linearize(r0, t0, delta2 if robust != "none"
                                  else None)
    (r, t, _), costs = jax.lax.scan(
        step, (r0, t0, jnp.asarray(init_lambda)), jnp.arange(n_iters))
    return PoseGraphResult(r=r, t=t,
                           cost_history=jnp.concatenate([cost0[None], costs]))


# -- Sim(3) pose graph: monocular scale-drift-aware loop closure -----------

from .se3 import sim3_compose, sim3_exp, sim3_inverse  # noqa: E402


def _sim3_edge_residual(xi_i, xi_j, r_i, t_i, s_i, r_j, t_j, s_j,
                        r_z, t_z, s_z, sw):
    """(7,) residual of one edge under Sim(3) increments on both poses.

    Edge measurements are full Sim(3) relative poses: odometry edges carry
    s_z = 1, while loop-closure edges carry the MEASURED relative scale
    between the two endpoints' local map scales (the ratio of the two
    endpoint depth-vote scales, ORB-SLAM's Sim(3) closure transform) —
    under monocular drift that ratio IS the drift signal the per-node
    scale states must absorb (Strasdat et al., "Scale drift-aware large
    scale monocular SLAM"). ``sw`` weights the log-scale component: it is
    kept soft relative to the translation/rotation terms so the odometry
    scale chain can float."""
    dri, dti, dsi = sim3_exp(xi_i)
    drj, dtj, dsj = sim3_exp(xi_j)
    ri, ti, si = sim3_compose(dri, dti, dsi, r_i, t_i, s_i)
    rj, tj, sj = sim3_compose(drj, dtj, dsj, r_j, t_j, s_j)
    r_rel, t_rel, s_rel = sim3_compose(*sim3_inverse(ri, ti, si),
                                       rj, tj, sj)
    r_err, t_err, s_err = sim3_compose(
        *sim3_inverse(r_z, t_z, s_z), r_rel, t_rel, s_rel)
    return jnp.concatenate([t_err, se3_log(r_err, jnp.zeros_like(t_err))[3:],
                            sw * jnp.log(s_err)[None]])


class Sim3PoseGraphResult(NamedTuple):
    r: jax.Array            # (M, 3, 3)
    t: jax.Array            # (M, 3)
    s: jax.Array            # (M,) per-node scale corrections
    cost_history: jax.Array


@functools.partial(jax.jit,
                   static_argnames=("n_iters", "scale_weight", "robust",
                                    "gnc_iters"))
def optimize_pose_graph_sim3(r0, t0, edges_i, edges_j, r_z, t_z,
                             weights=None, s_z=None, *, n_iters: int = 20,
                             init_lambda: float = 1e-4,
                             gauge_weight: float = 1e6,
                             scale_weight: float = 0.1,
                             robust: str = "none",
                             robust_delta: float = 0.0,
                             gnc_iters: int = 0
                             ) -> Sim3PoseGraphResult:
    """Optimise M poses + per-node scales given E Sim(3) edge measurements.

    Same contract as optimize_pose_graph but over Sim(3): node 0 is gauge-
    fixed in all 7 dof (its unit scale anchors the global scale). The
    returned (r, t) already have the scale corrections folded into the
    trajectory; ``s`` is reported for diagnostics/map rescaling.
    ``s_z``: (E,) per-edge relative-scale measurements (None -> all 1, the
    SE(3)-measurement case). ``robust``/``robust_delta``: see
    optimize_pose_graph."""
    m = r0.shape[0]
    e = edges_i.shape[0]
    if weights is None:
        weights = jnp.ones((e,), t0.dtype)
    if s_z is None:
        s_z = jnp.ones((e,), t0.dtype)
    s0 = jnp.ones((m,), t0.dtype)
    zero = jnp.zeros(7, t0.dtype)
    sw = jnp.asarray(scale_weight, t0.dtype)

    def residuals(r, t, s):
        args = (r[edges_i], t[edges_i], s[edges_i],
                r[edges_j], t[edges_j], s[edges_j], r_z, t_z, s_z)
        return jax.vmap(
            lambda *a: _sim3_edge_residual(zero, zero, *a, sw))(*args)

    if robust != "none":
        rho_fn = _ROBUST[robust]
        res0 = residuals(r0, t0, s0)
        delta2 = _resolve_delta2(
            weights * jnp.sum(res0 * res0, axis=1), weights, robust_delta)

    def linearize(r, t, s, d2_k):
        ri, ti, si = r[edges_i], t[edges_i], s[edges_i]
        rj, tj, sj = r[edges_j], t[edges_j], s[edges_j]
        args = (ri, ti, si, rj, tj, sj, r_z, t_z, s_z)
        res = residuals(r, t, s)
        ja = jax.vmap(
            lambda *a: jax.jacfwd(_sim3_edge_residual, 0)(zero, zero, *a, sw)
        )(*args)                                          # (E, 7, 7)
        jb = jax.vmap(
            lambda *a: jax.jacfwd(_sim3_edge_residual, 1)(zero, zero, *a, sw)
        )(*args)
        chi2 = weights * jnp.sum(res * res, axis=1)
        if robust == "none":
            return res, ja, jb, jnp.sum(chi2), weights
        rw, rho = rho_fn(chi2, d2_k)
        return res, ja, jb, jnp.sum(rho), weights * rw

    def build_normal(res, ja, jb, weights):
        w = weights[:, None, None]
        haa = w * jnp.einsum("eri,erj->eij", ja, ja, precision=_HIGHEST)
        hbb = w * jnp.einsum("eri,erj->eij", jb, jb, precision=_HIGHEST)
        hab = w * jnp.einsum("eri,erj->eij", ja, jb, precision=_HIGHEST)
        ba = -jnp.einsum("e,eri,er->ei", weights, ja, res)
        bb = -jnp.einsum("e,eri,er->ei", weights, jb, res)
        h = jnp.zeros((m, m, 7, 7), res.dtype)
        h = h.at[edges_i, edges_i].add(haa)
        h = h.at[edges_j, edges_j].add(hbb)
        h = h.at[edges_i, edges_j].add(hab)
        h = h.at[edges_j, edges_i].add(jnp.swapaxes(hab, -1, -2))
        b = jnp.zeros((m, 7), res.dtype)
        b = b.at[edges_i].add(ba)
        b = b.at[edges_j].add(bb)
        h = h.at[0, 0].add(gauge_weight * jnp.eye(7))
        return h, b

    def apply_dx(r, t, s, dx):
        dr, dt, ds = sim3_exp(dx)
        r_new, t_new, s_new = sim3_compose(dr, dt, ds, r, t, s)
        return r_new, t_new, s_new

    def step(carry, k):
        r, t, s, lam = carry
        d2_k = (delta2 * _gnc_scale(k, gnc_iters)) if robust != "none" \
            else None
        res, ja, jb, cost, w_eff = linearize(r, t, s, d2_k)
        h, b = build_normal(res, ja, jb, w_eff)
        hd = h.transpose(0, 2, 1, 3).reshape(7 * m, 7 * m)
        hd = hd + lam * jnp.diag(jnp.maximum(jnp.diag(hd), 1e-8))
        dx = jnp.linalg.solve(hd + 1e-9 * jnp.eye(7 * m),
                              b.reshape(-1)).reshape(m, 7)
        r_new, t_new, s_new = apply_dx(r, t, s, dx)
        _, _, _, new_cost, _ = linearize(r_new, t_new, s_new, d2_k)
        accept = new_cost < cost
        r = jnp.where(accept, r_new, r)
        t = jnp.where(accept, t_new, t)
        s = jnp.where(accept, s_new, s)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
        return (r, t, s, lam), jnp.where(accept, new_cost, cost)

    _, _, _, cost0, _ = linearize(r0, t0, s0, delta2 if robust != "none"
                                  else None)
    (r, t, s, _), costs = jax.lax.scan(
        step, (r0, t0, s0, jnp.asarray(init_lambda)), jnp.arange(n_iters))
    return Sim3PoseGraphResult(
        r=r, t=t, s=s,
        cost_history=jnp.concatenate([cost0[None], costs]))


# -- distributed pose graph: edges partitioned over the dp mesh axis --------

def _graph_optimize_sharded(mesh, dof, state0, edges_i, edges_j, z_arrays,
                            z_pads, weights, edge_blocks, apply_dx, n_iters,
                            init_lambda, gauge_weight,
                            robust="none", robust_delta=0.0, gnc_iters=0):
    """Shared engine of the sharded SE(3)/Sim(3) pose-graph solvers.

    The keyframe-partitioned distributed solve of BASELINE.json config 5:
    edges (odometry + loop closures) are sharded over the ``dp`` mesh axis;
    every device linearizes only its edge shard (residual + two Jacobian
    blocks via forward-mode autodiff) and scatter-adds the blocks into the
    global (M, M, dof, dof) normal system, which is then ``psum``-reduced —
    ONE collective per Levenberg-Marquardt iteration, riding ICI within a
    slice and DCN across hosts. The (dof·M)² dense solve and the pose update
    are replicated (M = keyframes, a few hundred; the solve is microseconds
    next to the linearization). Identical math to the single-device solvers
    up to psum reduction order.

    ``state0``: tuple of per-node arrays, e.g. (r, t) or (r, t, s);
    ``z_arrays``: tuple of per-edge measurement arrays, e.g. (r_z, t_z)
    or (r_z, t_z, s_z), with ``z_pads`` giving the identity element each
    is padded with (so padded edges have exactly-zero residuals);
    ``edge_blocks(state_i..., state_j..., *z) -> (res, ja, jb)``;
    ``apply_dx(state, dx) -> state``.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import data_axis

    m = state0[0].shape[0]
    n_dp = mesh.shape[data_axis]
    e = edges_i.shape[0]
    e_pad = -(-e // n_dp) * n_dp
    pad = e_pad - e
    # padded edges: self-loop on node 0 with an identity measurement and
    # weight 0 — residual exactly 0, contributes nothing to H, b, or cost
    edges_i = jnp.concatenate([edges_i, jnp.zeros(pad, edges_i.dtype)])
    edges_j = jnp.concatenate([edges_j, jnp.zeros(pad, edges_j.dtype)])
    z_arrays = tuple(
        jnp.concatenate(
            [z, jnp.broadcast_to(jnp.asarray(zp, z.dtype),
                                 (pad,) + z.shape[1:])])
        for z, zp in zip(z_arrays, z_pads))
    weights = jnp.concatenate([weights, jnp.zeros(pad, weights.dtype)])

    n_state = len(state0)
    n_z = len(z_arrays)
    state_specs = (P(),) * n_state
    z_specs = (P(data_axis),) * n_z

    if robust != "none":
        rho_fn = _ROBUST[robust]

        def chi2_shard(ei_l, ej_l, w_l, *rest):
            z_l, state = rest[:n_z], rest[n_z:]
            gi = tuple(a[ei_l] for a in state)
            gj = tuple(a[ej_l] for a in state)
            res, _, _ = jax.vmap(edge_blocks)(*gi, *gj, *z_l)
            return w_l * jnp.sum(res * res, axis=1)

        chi2_0 = shard_map(
            chi2_shard, mesh=mesh,
            in_specs=(P(data_axis),) * 3 + z_specs + state_specs,
            out_specs=P(data_axis), check_vma=False,
        )(edges_i, edges_j, weights, *z_arrays, *state0)
        delta2 = _resolve_delta2(chi2_0, weights, robust_delta)
    else:
        delta2 = jnp.asarray(0.0, weights.dtype)  # unused, keeps signature

    def lin_shard(delta2_s, ei_l, ej_l, w_l, *rest):
        z_l, state = rest[:n_z], rest[n_z:]
        gi = tuple(a[ei_l] for a in state)
        gj = tuple(a[ej_l] for a in state)
        res, ja, jb = jax.vmap(edge_blocks)(*gi, *gj, *z_l)
        chi2 = w_l * jnp.sum(res * res, axis=1)
        if robust == "none":
            cost = jax.lax.psum(jnp.sum(chi2), data_axis)
        else:
            rw, rho = rho_fn(chi2, delta2_s)
            # padded edges have w_l = 0 -> chi2 = 0 -> rho = 0: they stay
            # invisible to both the cost and (via w_l * rw) the normal eqs
            w_l = w_l * rw
            cost = jax.lax.psum(jnp.sum(rho), data_axis)
        w3 = w_l[:, None, None]
        haa = w3 * jnp.einsum("eri,erj->eij", ja, ja, precision=_HIGHEST)
        hbb = w3 * jnp.einsum("eri,erj->eij", jb, jb, precision=_HIGHEST)
        hab = w3 * jnp.einsum("eri,erj->eij", ja, jb, precision=_HIGHEST)
        ba = -jnp.einsum("e,eri,er->ei", w_l, ja, res)
        bb = -jnp.einsum("e,eri,er->ei", w_l, jb, res)
        h = jnp.zeros((m, m, dof, dof), res.dtype)
        h = h.at[ei_l, ei_l].add(haa)
        h = h.at[ej_l, ej_l].add(hbb)
        h = h.at[ei_l, ej_l].add(hab)
        h = h.at[ej_l, ei_l].add(jnp.swapaxes(hab, -1, -2))
        b = jnp.zeros((m, dof), res.dtype)
        b = b.at[ei_l].add(ba)
        b = b.at[ej_l].add(bb)
        return jax.lax.psum(h, data_axis), jax.lax.psum(b, data_axis), cost

    lin_sharded = shard_map(
        lin_shard, mesh=mesh,
        in_specs=(P(), P(data_axis), P(data_axis), P(data_axis))
        + z_specs + state_specs,
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    def linearize(d2_k, *state):
        return lin_sharded(d2_k, edges_i, edges_j, weights, *z_arrays,
                           *state)

    def step(carry, k):
        state, lam = carry
        d2_k = delta2 * _gnc_scale(k, gnc_iters)
        h, b, cost = linearize(d2_k, *state)
        h = h.at[0, 0].add(gauge_weight * jnp.eye(dof))
        hd = h.transpose(0, 2, 1, 3).reshape(dof * m, dof * m)
        hd = hd + lam * jnp.diag(jnp.maximum(jnp.diag(hd), 1e-8))
        dx = jnp.linalg.solve(hd + 1e-9 * jnp.eye(dof * m),
                              b.reshape(-1)).reshape(m, dof)
        state_new = apply_dx(state, dx)
        _, _, new_cost = linearize(d2_k, *state_new)
        accept = new_cost < cost
        state = tuple(jnp.where(accept, a_new, a)
                      for a_new, a in zip(state_new, state))
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
        return (state, lam), jnp.where(accept, new_cost, cost)

    _, _, cost0 = linearize(delta2, *state0)
    (state, _), costs = jax.lax.scan(
        step, (state0, jnp.asarray(init_lambda)), jnp.arange(n_iters))
    return state, jnp.concatenate([cost0[None], costs])


@functools.partial(jax.jit, static_argnames=("mesh", "n_iters", "robust",
                                              "gnc_iters"))
def optimize_pose_graph_sharded(mesh, r0, t0, edges_i, edges_j, r_z, t_z,
                                weights=None, *, n_iters: int = 15,
                                init_lambda: float = 1e-4,
                                gauge_weight: float = 1e6,
                                robust: str = "none",
                                robust_delta: float = 0.0,
                                gnc_iters: int = 0
                                ) -> PoseGraphResult:
    """optimize_pose_graph with edges sharded over the mesh's dp axis."""
    if weights is None:
        weights = jnp.ones((edges_i.shape[0],), t0.dtype)
    zero = jnp.zeros(6, t0.dtype)

    def edge_blocks(r_i, t_i, r_j, t_j, rz, tz):
        args = (r_i, t_i, r_j, t_j, rz, tz)
        res = _edge_residual(zero, zero, *args)
        ja = jax.jacfwd(_edge_residual, 0)(zero, zero, *args)
        jb = jax.jacfwd(_edge_residual, 1)(zero, zero, *args)
        return res, ja, jb

    def apply_dx(state, dx):
        r, t = state
        dr, dt = se3_exp(dx)
        return se3_compose(dr, dt, r, t)

    (r, t), costs = _graph_optimize_sharded(
        mesh, 6, (r0, t0), edges_i, edges_j, (r_z, t_z),
        (jnp.eye(3, dtype=r_z.dtype), jnp.zeros(3, t_z.dtype)), weights,
        edge_blocks, apply_dx, n_iters, init_lambda, gauge_weight,
        robust, robust_delta, gnc_iters)
    return PoseGraphResult(r=r, t=t, cost_history=costs)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "n_iters", "scale_weight",
                                    "robust", "gnc_iters"))
def optimize_pose_graph_sim3_sharded(mesh, r0, t0, edges_i, edges_j, r_z,
                                     t_z, weights=None, s_z=None, *,
                                     n_iters: int = 20,
                                     init_lambda: float = 1e-4,
                                     gauge_weight: float = 1e6,
                                     scale_weight: float = 0.1,
                                     robust: str = "none",
                                     robust_delta: float = 0.0,
                                     gnc_iters: int = 0
                                     ) -> Sim3PoseGraphResult:
    """optimize_pose_graph_sim3 with edges sharded over the dp axis."""
    if weights is None:
        weights = jnp.ones((edges_i.shape[0],), t0.dtype)
    if s_z is None:
        s_z = jnp.ones((edges_i.shape[0],), t0.dtype)
    s0 = jnp.ones((r0.shape[0],), t0.dtype)
    zero = jnp.zeros(7, t0.dtype)
    sw = jnp.asarray(scale_weight, t0.dtype)

    def edge_blocks(r_i, t_i, s_i, r_j, t_j, s_j, rz, tz, sz):
        args = (r_i, t_i, s_i, r_j, t_j, s_j, rz, tz, sz, sw)
        res = _sim3_edge_residual(zero, zero, *args)
        ja = jax.jacfwd(_sim3_edge_residual, 0)(zero, zero, *args)
        jb = jax.jacfwd(_sim3_edge_residual, 1)(zero, zero, *args)
        return res, ja, jb

    def apply_dx(state, dx):
        r, t, s = state
        dr, dt, ds = sim3_exp(dx)
        return sim3_compose(dr, dt, ds, r, t, s)

    (r, t, s), costs = _graph_optimize_sharded(
        mesh, 7, (r0, t0, s0), edges_i, edges_j, (r_z, t_z, s_z),
        (jnp.eye(3, dtype=r_z.dtype), jnp.zeros(3, t_z.dtype),
         jnp.ones((), t0.dtype)), weights,
        edge_blocks, apply_dx, n_iters, init_lambda, gauge_weight,
        robust, robust_delta, gnc_iters)
    return Sim3PoseGraphResult(r=r, t=t, s=s, cost_history=costs)
