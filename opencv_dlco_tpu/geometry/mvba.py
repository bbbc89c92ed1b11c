"""Multi-view bundle adjustment with (distributed) Schur-complement reduction.

The scaling story of the SLAM back-end (BASELINE.json config 5): M keyframe
poses, N landmarks, K observations. Per Gauss-Newton step:

  1. per-observation residuals + Jacobian blocks (vmapped autodiff):
         J_c (2, 6) wrt the observing camera, J_p (2, 3) wrt the landmark;
  2. scatter-assembled block Hessians
         Hcc (M, 6, 6) block-diagonal, Hpp (N, 3, 3) block-diagonal,
         per-observation coupling blocks Hcp (K, 6, 3);
  3. landmark elimination: with obs grouped per landmark (static-width
     table, padded), the reduced camera system is
         S = Hcc - sum_p W_p Hpp_p^-1 W_p^T
     accumulated landmark-by-landmark as (L, L) camera-pair outer products;
  4. dense solve of S (6M x 6M — M is keyframe count, order 10^2),
     landmark back-substitution.

Distribution: landmarks (and their observations) shard over the ``dp`` mesh
axis; each device reduces its landmarks' contribution to (S, rhs), one
psum produces the replicated reduced system, every device solves it (6M is
tiny), and back-substitution stays local to each landmark shard. One
collective per iteration — this is the Schur-over-collectives design
SURVEY.md §7 phase 5 calls the part with no reference analogue.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .se3 import se3_exp

_HIGHEST = jax.lax.Precision.HIGHEST


def _obs_residual(xi, x3d, r0, t0, uv):
    """(2,) reprojection residual of one observation, left pose increment."""
    dr, dt = se3_exp(xi)
    r = dr @ r0
    t = dr @ t0 + dt
    q = r @ x3d + t
    return uv - q[:2] / q[2]


def build_landmark_table(pt_idx: np.ndarray, n_landmarks: int,
                         max_obs: Optional[int] = None):
    """Group observation indices by landmark into a padded (N, L) table.

    Returns (table (N, L) int32 with -1 padding, L). Host-side prep — the
    table is the static-shape schedule the kernel consumes.
    """
    lists = [[] for _ in range(n_landmarks)]
    for k, p in enumerate(np.asarray(pt_idx)):
        lists[p].append(k)
    width = max(len(l) for l in lists) if lists else 1
    if max_obs is not None:
        width = min(width, max_obs)
    table = np.full((n_landmarks, width), -1, np.int32)
    for p, l in enumerate(lists):
        take = l[:width]
        table[p, :len(take)] = take
    return table, width


class MVBAResult(NamedTuple):
    r: jax.Array           # (M, 3, 3)
    t: jax.Array           # (M, 3)
    points: jax.Array      # (N, 3)
    cost_history: jax.Array


def _linearize(r, t, points, cam_idx, uv, w, pt_idx):
    zero = jnp.zeros(6, points.dtype)
    rc, tc = r[cam_idx], t[cam_idx]
    xp = points[pt_idx]
    res = jax.vmap(
        lambda x, a, b, o: _obs_residual(zero, x, a, b, o)
    )(xp, rc, tc, uv)                                           # (K, 2)
    jc = jax.vmap(
        lambda x, a, b, o: jax.jacfwd(_obs_residual, 0)(zero, x, a, b, o)
    )(xp, rc, tc, uv)                                           # (K, 2, 6)
    jp = jax.vmap(
        lambda x, a, b, o: jax.jacfwd(_obs_residual, 1)(zero, x, a, b, o)
    )(xp, rc, tc, uv)                                           # (K, 2, 3)
    cost = jnp.sum(w[:, None] * res * res)
    return res, jc, jp, cost


def _schur_terms(res, jc, jp, w, cam_idx, pt_idx, table, m, lam):
    """Assemble the *undamped* reduced system pieces.

    Returns (S (M,M,6,6), rhs (M,6), hpp_inv (N,3,3), bp (N,3),
    hcp_blocks); landmark blocks are damped here (shard-local), camera
    damping and the gauge prior are the caller's job (after any psum)."""
    k = res.shape[0]
    wk = w[:, None, None]
    hcc_blocks = wk * jnp.einsum("kri,krj->kij", jc, jc, precision=_HIGHEST)
    hpp_blocks = wk * jnp.einsum("kri,krj->kij", jp, jp, precision=_HIGHEST)
    hcp_blocks = wk * jnp.einsum("kri,krj->kij", jc, jp, precision=_HIGHEST)
    bc_obs = -jnp.einsum("k,kri,kr->ki", w, jc, res)
    bp_obs = -jnp.einsum("k,kri,kr->ki", w, jp, res)

    n = table.shape[0]
    hpp = jnp.zeros((n, 3, 3), res.dtype).at[pt_idx].add(hpp_blocks)
    bp = jnp.zeros((n, 3), res.dtype).at[pt_idx].add(bp_obs)
    hcc = jnp.zeros((m, 6, 6), res.dtype).at[cam_idx].add(hcc_blocks)
    bc = jnp.zeros((m, 6), res.dtype).at[cam_idx].add(bc_obs)

    # damp landmark blocks then invert (3x3, batched)
    hpp_d = hpp + lam * jnp.eye(3) * jnp.maximum(
        jnp.einsum("nii->n", hpp)[:, None, None] / 3.0, 1e-8)
    hpp_inv = jnp.linalg.inv(hpp_d + 1e-10 * jnp.eye(3))

    # per-landmark elimination: gather that landmark's obs blocks (padded)
    valid = table >= 0                                     # (N, L)
    tbl = jnp.maximum(table, 0)
    w_blk = hcp_blocks[tbl] * valid[..., None, None]       # (N, L, 6, 3)
    cams = cam_idx[tbl]                                    # (N, L)
    # Schur pair terms: (N, L, L, 6, 6)
    tmp = jnp.einsum("nlij,njk->nlik", w_blk, hpp_inv, precision=_HIGHEST)
    pair = jnp.einsum("nlik,nmjk->nlmij", tmp, w_blk, precision=_HIGHEST)
    # rhs correction per obs: (N, L, 6)
    rhs_corr = jnp.einsum("nlik,nk->nli", tmp, bp)

    s = jnp.zeros((m, m, 6, 6), res.dtype)
    ci = jnp.broadcast_to(cams[:, :, None], pair.shape[:3])
    cj = jnp.broadcast_to(cams[:, None, :], pair.shape[:3])
    vv = valid[:, :, None] & valid[:, None, :]
    s = s.at[ci, cj].add(jnp.where(vv[..., None, None], pair, 0.0))
    s = jnp.zeros((m, m, 6, 6), res.dtype).at[jnp.arange(m),
                                              jnp.arange(m)].add(hcc) - s
    rhs = bc.at[cams].add(-jnp.where(valid[..., None], rhs_corr, 0.0))
    return s, rhs, hpp_inv, bp, hcp_blocks


def _solve_and_backsub(s, rhs, hpp_inv, bp, hcp_blocks, pt_idx, cam_idx, m):
    sd = s.transpose(0, 2, 1, 3).reshape(6 * m, 6 * m)
    dc = jnp.linalg.solve(sd + 1e-9 * jnp.eye(6 * m),
                          rhs.reshape(-1)).reshape(m, 6)
    # back-substitute: dp_n = Hpp_n^-1 (bp_n - sum_obs Hcp_k^T dc_cam(k))
    corr = jnp.einsum("kij,ki->kj", hcp_blocks, dc[cam_idx])  # (K, 3)
    n = bp.shape[0]
    bp_corr = bp - jnp.zeros_like(bp).at[pt_idx].add(corr)
    dp = jnp.einsum("nij,nj->ni", hpp_inv, bp_corr)
    return dc, dp


def shard_ba_problem(points0, cam_idx, pt_idx, uv, weights, n_shards: int):
    """Partition a BA problem by landmark into n_shards equal pieces.

    Observations follow their landmark (each obs belongs to exactly one);
    both landmarks and observations are padded per shard (padding obs get
    weight 0 and point at local landmark 0 / camera 0). Returns a dict of
    stacked per-shard arrays plus the permutation needed to un-shuffle the
    optimised landmarks.
    """
    points0 = np.asarray(points0)
    cam_idx = np.asarray(cam_idx)
    pt_idx = np.asarray(pt_idx)
    uv = np.asarray(uv)
    weights = np.asarray(weights)
    n = points0.shape[0]

    order = np.argsort(pt_idx, kind="stable")
    # landmarks partitioned contiguously
    n_pad = (-n) % n_shards
    n_per = (n + n_pad) // n_shards
    # count observations per landmark to split obs along shard boundaries
    counts = np.bincount(pt_idx, minlength=n)
    shard_of_landmark = np.minimum(np.arange(n + n_pad) // n_per,
                                   n_shards - 1)
    obs_shard = shard_of_landmark[pt_idx]
    k_per = max(int(np.max(np.bincount(obs_shard, minlength=n_shards))), 1)

    pts_sh = np.zeros((n_shards, n_per, 3), points0.dtype)
    cam_sh = np.zeros((n_shards, k_per), np.int32)
    loc_pt_sh = np.zeros((n_shards, k_per), np.int32)
    uv_sh = np.zeros((n_shards, k_per, 2), uv.dtype)
    w_sh = np.zeros((n_shards, k_per), weights.dtype)
    tables = []
    width = 0
    for s in range(n_shards):
        lms = np.arange(s * n_per, min((s + 1) * n_per, n))
        pts_sh[s, :len(lms)] = points0[lms]
        sel = np.flatnonzero(obs_shard == s)
        cam_sh[s, :len(sel)] = cam_idx[sel]
        loc_pt_sh[s, :len(sel)] = pt_idx[sel] - s * n_per
        uv_sh[s, :len(sel)] = uv[sel]
        w_sh[s, :len(sel)] = weights[sel]
        tbl, wd = build_landmark_table(loc_pt_sh[s, :len(sel)], n_per)
        tables.append(tbl)
        width = max(width, wd)
    table_sh = np.full((n_shards, n_per, width), -1, np.int32)
    for s, tbl in enumerate(tables):
        table_sh[s, :, :tbl.shape[1]] = tbl
    return dict(points=pts_sh, cam_idx=cam_sh, pt_idx=loc_pt_sh, uv=uv_sh,
                weights=w_sh, table=table_sh, n_landmarks=n, n_per=n_per)


@functools.partial(jax.jit, static_argnames=("mesh", "n_iters"))
def multi_view_ba_sharded(mesh, r0, t0, sharded, *, n_iters: int = 10,
                          init_lambda: float = 1e-3,
                          gauge_weight: float = 1e6) -> MVBAResult:
    """Landmark-sharded multi-view BA over the ``dp`` mesh axis.

    ``sharded`` is shard_ba_problem's output device_put with the leading
    shard axis mapped to dp. Each device reduces its landmarks into the
    (S, rhs) camera system; one psum replicates it; the 6M solve runs
    everywhere; back-substitution stays shard-local. Returns points still
    in shard layout (D, n_per, 3).
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    m = r0.shape[0]

    def chunk(r0_l, t0_l, pts0_l, cam_l, pt_l, uv_l, w_l, tbl_l):
        # refs arrive with a leading shard axis of size 1 inside shard_map
        pts0_l = pts0_l[0]
        cam_l, pt_l, uv_l, w_l, tbl_l = (
            cam_l[0], pt_l[0], uv_l[0], w_l[0], tbl_l[0])

        def cost_of(r, t, pts_l):
            zero = jnp.zeros(6, pts_l.dtype)
            res = jax.vmap(
                lambda x, a, b, o: _obs_residual(zero, x, a, b, o)
            )(pts_l[pt_l], r[cam_l], t[cam_l], uv_l)
            c = jnp.sum(w_l[:, None] * res * res)
            return jax.lax.psum(c, "dp")

        def step(carry, _):
            r, t, pts_l, lam = carry
            res, jc, jp, _ = _linearize(r, t, pts_l, cam_l, uv_l, w_l, pt_l)
            s, rhs, hpp_inv, bp, hcp_b = _schur_terms(
                res, jc, jp, w_l, cam_l, pt_l, tbl_l, m, lam)
            s = jax.lax.psum(s, "dp")
            rhs = jax.lax.psum(rhs, "dp")
            s = s.at[0, 0].add(gauge_weight * jnp.eye(6))
            s = s.at[jnp.arange(m), jnp.arange(m)].add(
                lam * jnp.eye(6) * jnp.maximum(
                    jnp.einsum("mmii->m", s)[:, None, None] / 6.0, 1e-8))
            dc, dp = _solve_and_backsub(s, rhs, hpp_inv, bp, hcp_b, pt_l,
                                        cam_l, m)
            dr, dt = se3_exp(dc)
            r_new = jnp.matmul(dr, r)
            t_new = jnp.einsum("mij,mj->mi", dr, t) + dt
            p_new = pts_l + dp
            cost = cost_of(r, t, pts_l)
            new_cost = cost_of(r_new, t_new, p_new)
            accept = new_cost < cost
            r = jnp.where(accept, r_new, r)
            t = jnp.where(accept, t_new, t)
            pts_l = jnp.where(accept, p_new, pts_l)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0),
                           1e-9, 1e6)
            return (r, t, pts_l, lam), jnp.where(accept, new_cost, cost)

        cost0 = cost_of(r0_l, t0_l, pts0_l)
        (r, t, pts_l, _), costs = jax.lax.scan(
            step, (r0_l, t0_l, pts0_l, jnp.asarray(init_lambda)), None,
            length=n_iters)
        return r, t, pts_l[None], jnp.concatenate([cost0[None], costs])

    r, t, pts, costs = shard_map(
        chunk, mesh=mesh,
        in_specs=(P(), P(), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"),
                  P("dp")),
        out_specs=(P(), P(), P("dp"), P()),
        check_vma=False,
    )(r0, t0, sharded["points"], sharded["cam_idx"], sharded["pt_idx"],
      sharded["uv"], sharded["weights"], sharded["table"])
    return MVBAResult(r=r, t=t, points=pts, cost_history=costs)


@functools.partial(jax.jit, static_argnames=("n_iters",))
def multi_view_ba(r0, t0, points0, cam_idx, pt_idx, uv, table,
                  weights=None, *, n_iters: int = 10,
                  init_lambda: float = 1e-3,
                  gauge_weight: float = 1e6) -> MVBAResult:
    """Single-device multi-view BA (see module docstring).

    table: (N, L) padded per-landmark observation index table from
    build_landmark_table.
    """
    m = r0.shape[0]
    k = uv.shape[0]
    if weights is None:
        weights = jnp.ones((k,), uv.dtype)

    def cost_of(r, t, points):
        zero = jnp.zeros(6, points.dtype)
        res = jax.vmap(
            lambda x, a, b, o: _obs_residual(zero, x, a, b, o)
        )(points[pt_idx], r[cam_idx], t[cam_idx], uv)
        return jnp.sum(weights[:, None] * res * res)

    def step(carry, _):
        r, t, points, lam = carry
        res, jc, jp, cost = _linearize(r, t, points, cam_idx, uv, weights,
                                       pt_idx)
        s, rhs, hpp_inv, bp, hcp_b = _schur_terms(
            res, jc, jp, weights, cam_idx, pt_idx, table, m, lam)
        s = s.at[0, 0].add(gauge_weight * jnp.eye(6))
        s = s.at[jnp.arange(m), jnp.arange(m)].add(
            lam * jnp.eye(6) * jnp.maximum(
                jnp.einsum("mmii->m", s)[:, None, None] / 6.0, 1e-8))
        dc, dp = _solve_and_backsub(s, rhs, hpp_inv, bp, hcp_b, pt_idx,
                                    cam_idx, m)
        dr, dt = se3_exp(dc)
        r_new = jnp.matmul(dr, r)
        t_new = jnp.einsum("mij,mj->mi", dr, t) + dt
        p_new = points + dp
        new_cost = cost_of(r_new, t_new, p_new)
        accept = new_cost < cost
        r = jnp.where(accept, r_new, r)
        t = jnp.where(accept, t_new, t)
        points = jnp.where(accept, p_new, points)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
        return (r, t, points, lam), jnp.where(accept, new_cost, cost)

    cost0 = cost_of(r0, t0, points0)
    (r, t, points, _), costs = jax.lax.scan(
        step, (r0, t0, points0, jnp.asarray(init_lambda)), None,
        length=n_iters)
    return MVBAResult(r=r, t=t, points=points,
                      cost_history=jnp.concatenate([cost0[None], costs]))
