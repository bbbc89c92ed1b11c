"""Multi-view BA: convergence, Schur correctness, distributed equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opencv_dlco_tpu.geometry import (
    build_landmark_table,
    multi_view_ba,
    multi_view_ba_sharded,
    shard_ba_problem,
    so3_exp,
)
from opencv_dlco_tpu.parallel.mesh import make_mesh


def _mv_problem(rng, m=6, n=200, noise=5e-4, obs_frac=0.8):
    """Cameras on an arc looking at a 3D blob field; partial visibility."""
    pts = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                    rng.uniform(6, 12, n)], 1)
    rs, ts = [], []
    for i in range(m):
        phi = np.array([0.0, 0.04 * i, 0.0])
        r = np.asarray(so3_exp(jnp.asarray(phi)))
        t = np.array([-0.4 * i, 0.02 * i, 0.0])
        rs.append(r)
        ts.append(t)
    rs, ts = np.stack(rs), np.stack(ts)

    cam_idx, pt_idx, uv = [], [], []
    for c in range(m):
        vis = rng.random(n) < obs_frac
        q = pts @ rs[c].T + ts[c]
        proj = q[:, :2] / q[:, 2:3]
        for p in np.flatnonzero(vis):
            cam_idx.append(c)
            pt_idx.append(p)
            uv.append(proj[p] + rng.normal(0, noise, 2))
    cam_idx = np.asarray(cam_idx, np.int32)
    pt_idx = np.asarray(pt_idx, np.int32)
    uv = np.asarray(uv, np.float32)
    return pts, rs, ts, cam_idx, pt_idx, uv


def _perturb(rng, rs, ts, pts, rot=0.01, trans=0.03, pt=0.05):
    m = rs.shape[0]
    rs_p = np.stack([
        np.asarray(so3_exp(jnp.asarray(rng.normal(size=3) * rot))) @ rs[i]
        for i in range(m)])
    ts_p = ts + rng.normal(0, trans, ts.shape)
    # keep the gauge camera exact
    rs_p[0], ts_p[0] = rs[0], ts[0]
    pts_p = pts + rng.normal(0, pt, pts.shape)
    return rs_p, ts_p, pts_p


def test_landmark_table(rng):
    pt_idx = np.array([0, 1, 0, 2, 1, 0], np.int32)
    tbl, width = build_landmark_table(pt_idx, 4)
    assert width == 3
    assert set(tbl[0]) == {0, 2, 5}
    assert set(tbl[1][:2]) == {1, 4}
    assert tbl[3][0] == -1


def test_multi_view_ba_converges():
    rng = np.random.default_rng(11)
    pts, rs, ts, cam_idx, pt_idx, uv = _mv_problem(rng)
    rs0, ts0, pts0 = _perturb(rng, rs, ts, pts)
    table, _ = build_landmark_table(pt_idx, pts.shape[0])
    res = multi_view_ba(
        jnp.asarray(rs0.astype(np.float32)), jnp.asarray(ts0.astype(np.float32)),
        jnp.asarray(pts0.astype(np.float32)),
        jnp.asarray(cam_idx), jnp.asarray(pt_idx), jnp.asarray(uv),
        jnp.asarray(table), n_iters=12)
    costs = np.asarray(res.cost_history)
    assert costs[-1] < costs[0] * 0.01, f"{costs[0]:.2e} -> {costs[-1]:.2e}"
    # pose errors (gauge camera is fixed, others recover)
    for i in range(1, rs.shape[0]):
        dr = np.asarray(res.r[i]) @ rs[i].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dr) - 1) / 2, -1, 1)))
        assert ang < 0.3, f"cam {i}: rot err {ang:.2f} deg"
        assert np.linalg.norm(np.asarray(res.t[i]) - ts[i]) < 0.02


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_multi_view_ba_sharded_matches_single():
    rng = np.random.default_rng(13)
    pts, rs, ts, cam_idx, pt_idx, uv = _mv_problem(rng, n=160)
    rs0, ts0, pts0 = _perturb(rng, rs, ts, pts)
    w = np.ones(len(cam_idx), np.float32)

    table, _ = build_landmark_table(pt_idx, pts.shape[0])
    single = multi_view_ba(
        jnp.asarray(rs0.astype(np.float32)), jnp.asarray(ts0.astype(np.float32)),
        jnp.asarray(pts0.astype(np.float32)),
        jnp.asarray(cam_idx), jnp.asarray(pt_idx), jnp.asarray(uv),
        jnp.asarray(table), n_iters=8)

    mesh = make_mesh(dp=8, mp=1)
    sh = shard_ba_problem(pts0.astype(np.float32), cam_idx, pt_idx, uv, w, 8)
    from jax.sharding import NamedSharding, PartitionSpec as P

    dp_sh = {k: jax.device_put(jnp.asarray(v),
                               NamedSharding(mesh, P("dp")))
             for k, v in sh.items() if isinstance(v, np.ndarray)}
    out = multi_view_ba_sharded(
        mesh, jnp.asarray(rs0.astype(np.float32)),
        jnp.asarray(ts0.astype(np.float32)), dp_sh, n_iters=8)

    costs_s = np.asarray(out.cost_history)
    costs_1 = np.asarray(single.cost_history)
    # identical problem, identical deterministic LM trajectory
    np.testing.assert_allclose(costs_s, costs_1, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.r), np.asarray(single.r),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.t), np.asarray(single.t),
                               atol=1e-4)
    # landmark shards un-concatenate to the single-device solution
    pts_sharded = np.asarray(out.points).reshape(-1, 3)[:pts.shape[0]]
    np.testing.assert_allclose(pts_sharded, np.asarray(single.points),
                               atol=1e-3)
