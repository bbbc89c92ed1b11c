"""Geometry stack: SE(3) maps, RANSAC essential, triangulation, BA, pose graph."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opencv_dlco_tpu.geometry import (
    optimize_pose_graph,
    ransac_essential,
    recover_pose,
    reprojection_residuals,
    sampson_distance,
    se3_compose,
    se3_exp,
    se3_inverse,
    se3_log,
    so3_exp,
    so3_log,
    triangulate_points,
    two_view_ba,
)


def _random_pose(rng, max_angle=0.5, max_t=1.0):
    phi = rng.normal(size=3)
    phi = phi / np.linalg.norm(phi) * rng.uniform(0.05, max_angle)
    r = np.asarray(so3_exp(jnp.asarray(phi)))
    t = rng.uniform(-max_t, max_t, 3)
    return r, t


def _two_view_scene(rng, n=200, noise=0.0, outlier_frac=0.0):
    """Random scene in front of two cameras; returns normalized observations."""
    pts = np.stack([
        rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(4, 10, n)
    ], 1)
    r, t = _random_pose(rng, max_angle=0.3, max_t=0.5)
    p1 = pts[:, :2] / pts[:, 2:3]
    q = pts @ r.T + t
    p2 = q[:, :2] / q[:, 2:3]
    if noise:
        p1 = p1 + rng.normal(0, noise, p1.shape)
        p2 = p2 + rng.normal(0, noise, p2.shape)
    n_out = int(n * outlier_frac)
    if n_out:
        p2[:n_out] = rng.uniform(-0.5, 0.5, (n_out, 2))
    return pts, r, t, p1.astype(np.float32), p2.astype(np.float32)


# -- SE(3) ----------------------------------------------------------------

def test_so3_exp_log_roundtrip(rng):
    for _ in range(10):
        phi = rng.normal(size=3)
        phi = phi / np.linalg.norm(phi) * rng.uniform(0.01, 3.1)
        r = so3_exp(jnp.asarray(phi))
        rr = np.asarray(r)
        assert np.allclose(rr @ rr.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(rr) - 1) < 1e-5
        back = np.asarray(so3_log(r))
        np.testing.assert_allclose(back, phi, rtol=1e-3, atol=1e-4)


def test_se3_exp_log_compose_inverse(rng):
    xi = jnp.asarray(rng.normal(size=6) * 0.5)
    r, t = se3_exp(xi)
    back = np.asarray(se3_log(r, t))
    np.testing.assert_allclose(back, np.asarray(xi), rtol=1e-4, atol=1e-5)
    ri, ti = se3_inverse(r, t)
    rc, tc = se3_compose(r, t, ri, ti)
    np.testing.assert_allclose(np.asarray(rc), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-5)


# -- epipolar -------------------------------------------------------------

def test_ransac_essential_clean(rng):
    pts, r, t, p1, p2 = _two_view_scene(rng, n=200, noise=0.0)
    e, mask, n_inl = ransac_essential(
        jnp.asarray(p1), jnp.asarray(p2), jax.random.PRNGKey(0),
        n_hypotheses=128, thresh=1e-6)
    assert int(n_inl) > 190
    d = np.asarray(sampson_distance(e, jnp.asarray(p1), jnp.asarray(p2)))
    assert np.median(d) < 1e-8


def test_ransac_essential_outliers_and_pose(rng):
    pts, r, t, p1, p2 = _two_view_scene(rng, n=300, noise=1e-4,
                                        outlier_frac=0.3)
    e, mask, n_inl = ransac_essential(
        jnp.asarray(p1), jnp.asarray(p2), jax.random.PRNGKey(1),
        n_hypotheses=1024, thresh=1e-5)
    mask_np = np.asarray(mask)
    # outliers were planted at the front
    assert mask_np[90:].mean() > 0.95
    assert mask_np[:90].mean() < 0.2

    r_est, t_est, pts3d, n_good = recover_pose(
        e, jnp.asarray(p1), jnp.asarray(p2), mask)
    # rotation error
    dr = np.asarray(r_est) @ r.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dr) - 1) / 2, -1, 1)))
    assert ang < 1.0, f"rotation error {ang:.2f} deg"
    # translation direction (scale is unobservable)
    t_est_np = np.asarray(t_est)
    cos = abs(t_est_np @ t / (np.linalg.norm(t_est_np) * np.linalg.norm(t)))
    assert cos > 0.99


def test_ransac_essential_valid_prefix():
    """n_valid contract (the batched-SLAM static-shape path): junk padding
    rows beyond n_valid must neither be sampled nor counted as inliers.

    Dedicated rng: the shared session fixture's stream position must not
    shift for tests that run after this one."""
    rng = np.random.default_rng(41)
    pts, r, t, p1, p2 = _two_view_scene(rng, n=150, noise=1e-5)
    pad = rng.uniform(-5, 5, size=(50, 2))
    p1p = np.concatenate([p1, pad]).astype(np.float32)
    p2p = np.concatenate([p2, pad[::-1]]).astype(np.float32)
    e, mask, n_inl = ransac_essential(
        jnp.asarray(p1p), jnp.asarray(p2p), jax.random.PRNGKey(3),
        n_hypotheses=256, thresh=1e-5, n_valid=jnp.int32(150))
    mask_np = np.asarray(mask)
    assert not mask_np[150:].any(), "padding rows marked as inliers"
    assert int(n_inl) > 140
    d = np.asarray(sampson_distance(e, jnp.asarray(p1p[:150]),
                                    jnp.asarray(p2p[:150])))
    assert np.median(d) < 1e-7


def test_triangulation_exact(rng):
    pts, r, t, p1, p2 = _two_view_scene(rng, n=100)
    out = np.asarray(triangulate_points(jnp.asarray(r.astype(np.float32)),
                                        jnp.asarray(t.astype(np.float32)),
                                        jnp.asarray(p1), jnp.asarray(p2)))
    np.testing.assert_allclose(out, pts, rtol=2e-3, atol=2e-3)


# -- bundle adjustment ----------------------------------------------------

def test_two_view_ba_reduces_error(rng):
    pts, r, t, p1, p2 = _two_view_scene(rng, n=150, noise=5e-4)
    # perturb pose + points as the initial guess
    r0 = np.asarray(so3_exp(jnp.asarray(rng.normal(size=3) * 0.01))) @ r
    t0 = t + rng.normal(0, 0.02, 3)
    pts0 = pts + rng.normal(0, 0.05, pts.shape)
    init_res = np.asarray(reprojection_residuals(
        jnp.asarray(r0.astype(np.float32)), jnp.asarray(t0.astype(np.float32)),
        jnp.asarray(pts0.astype(np.float32)), jnp.asarray(p1), jnp.asarray(p2)))
    cost0 = float((init_res ** 2).sum())
    res = two_view_ba(jnp.asarray(r0.astype(np.float32)),
                      jnp.asarray(t0.astype(np.float32)),
                      jnp.asarray(pts0.astype(np.float32)),
                      jnp.asarray(p1), jnp.asarray(p2), n_iters=15)
    costs = np.asarray(res.cost_history)
    assert costs[-1] < cost0 * 0.05, f"costs {cost0:.2e}->{costs[-1]:.2e}"
    final = np.asarray(reprojection_residuals(res.r, res.t, res.points,
                                              jnp.asarray(p1), jnp.asarray(p2)))
    rms = np.sqrt((final ** 2).mean())
    assert rms < 2e-3, f"rms reprojection {rms:.2e}"
    dr = np.asarray(res.r) @ r.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dr) - 1) / 2, -1, 1)))
    assert ang < 0.5


def test_two_view_ba_with_outlier_weights(rng):
    pts, r, t, p1, p2 = _two_view_scene(rng, n=100, noise=1e-4)
    p2_bad = p2.copy()
    p2_bad[:10] += 0.3  # gross outliers
    w = np.ones(100, np.float32)
    w[:10] = 0.0
    res = two_view_ba(jnp.asarray(r.astype(np.float32)),
                      jnp.asarray(t.astype(np.float32)),
                      jnp.asarray(pts.astype(np.float32)),
                      jnp.asarray(p1), jnp.asarray(p2_bad),
                      weights=jnp.asarray(w), n_iters=8)
    final = np.asarray(reprojection_residuals(
        res.r, res.t, res.points, jnp.asarray(p1), jnp.asarray(p2_bad)))
    rms_in = np.sqrt((final[10:] ** 2).mean())
    assert rms_in < 1e-3


# -- pose graph -----------------------------------------------------------

def test_pose_graph_closes_loop():
    """Chain of noisy odometry + one loop closure: optimisation must pull
    the drifted chain back (classic pose-graph sanity). Local seed: the
    drift ratio depends on the noise draw, so the shared session rng would
    make this order-dependent."""
    rng = np.random.default_rng(7)
    m = 20
    # ground-truth circular trajectory
    rs, ts = [np.eye(3)], [np.zeros(3)]
    step_xi = np.array([0.5, 0.0, 0.0, 0.0, 0.0, 2 * np.pi / m])
    for i in range(1, m):
        dr, dt = se3_exp(jnp.asarray(step_xi))
        r, t = se3_compose(jnp.asarray(rs[-1]), jnp.asarray(ts[-1]), dr, dt)
        rs.append(np.asarray(r)); ts.append(np.asarray(t))
    rs_gt, ts_gt = np.stack(rs), np.stack(ts)

    # odometry edges with noise -> drifted initialisation
    ei, ej, rz, tz = [], [], [], []
    rs0, ts0 = [rs_gt[0]], [ts_gt[0]]
    for i in range(m - 1):
        r_rel, t_rel = se3_compose(
            *se3_inverse(jnp.asarray(rs_gt[i]), jnp.asarray(ts_gt[i])),
            jnp.asarray(rs_gt[i + 1]), jnp.asarray(ts_gt[i + 1]))
        noise = se3_exp(jnp.asarray(rng.normal(size=6) * 0.01))
        r_n, t_n = se3_compose(r_rel, t_rel, *noise)
        ei.append(i); ej.append(i + 1)
        rz.append(np.asarray(r_n)); tz.append(np.asarray(t_n))
        r0, t0 = se3_compose(jnp.asarray(rs0[-1]), jnp.asarray(ts0[-1]),
                             r_n, t_n)
        rs0.append(np.asarray(r0)); ts0.append(np.asarray(t0))
    # loop closure: exact relative pose last -> first
    r_rel, t_rel = se3_compose(
        *se3_inverse(jnp.asarray(rs_gt[m - 1]), jnp.asarray(ts_gt[m - 1])),
        jnp.asarray(rs_gt[0]), jnp.asarray(ts_gt[0]))
    ei.append(m - 1); ej.append(0)
    rz.append(np.asarray(r_rel)); tz.append(np.asarray(t_rel))

    rs0, ts0 = np.stack(rs0), np.stack(ts0)
    drift0 = np.linalg.norm(ts0 - ts_gt, axis=1).mean()

    out = optimize_pose_graph(
        jnp.asarray(rs0.astype(np.float32)), jnp.asarray(ts0.astype(np.float32)),
        jnp.asarray(ei, dtype=jnp.int32), jnp.asarray(ej, dtype=jnp.int32),
        jnp.asarray(np.stack(rz).astype(np.float32)),
        jnp.asarray(np.stack(tz).astype(np.float32)),
        n_iters=20)
    costs = np.asarray(out.cost_history)
    assert costs[-1] < costs[0] * 0.1
    drift1 = np.linalg.norm(np.asarray(out.t) - ts_gt, axis=1).mean()
    assert drift1 < drift0 * 0.5, f"ATE {drift0:.3f} -> {drift1:.3f}"


def test_two_view_ba_robust_downweights_outliers(rng):
    """Cauchy IRLS must recover the pose without explicit outlier masks
    (Huber's linear branch leaves a pose bias; the redescending kernel
    eliminates outlier influence)."""
    pts, r, t, p1, p2 = _two_view_scene(rng, n=120, noise=1e-4)
    p2_bad = p2.copy()
    p2_bad[:12] += 0.2  # unmasked gross outliers
    res = two_view_ba(jnp.asarray(r.astype(np.float32)),
                      jnp.asarray(t.astype(np.float32)),
                      jnp.asarray(pts.astype(np.float32)),
                      jnp.asarray(p1), jnp.asarray(p2_bad),
                      n_iters=20, robust_delta=0.005)
    final = np.asarray(reprojection_residuals(
        res.r, res.t, res.points, jnp.asarray(p1), jnp.asarray(p2_bad)))
    rms_in = np.sqrt((final[12:] ** 2).mean())
    assert rms_in < 5e-4, f"inlier rms {rms_in:.2e}"
    dr = np.asarray(res.r) @ r.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dr) - 1) / 2, -1, 1)))
    assert ang < 0.5


def test_sim3_pose_graph_absorbs_scale_drift(rng):
    """Monocular odometry with multiplicative scale drift + one exact loop
    edge: the SE(3) graph structurally cannot repair the drift, the Sim(3)
    graph must (Strasdat-style scale-drift-aware PGO)."""
    import jax
    import jax.numpy as jnp

    from opencv_dlco_tpu.geometry.posegraph import (
        optimize_pose_graph,
        optimize_pose_graph_sim3,
    )
    from opencv_dlco_tpu.geometry.se3 import (
        se3_compose,
        se3_inverse,
        so3_exp,
    )
    from opencv_dlco_tpu.pipeline.slam import ate_rmse

    m = 24
    # ground-truth poses on a circle (world_T_k)
    rs, ts = [], []
    for k in range(m):
        th = 2 * np.pi * k / m
        rs.append(np.asarray(so3_exp(jnp.asarray([0.0, 0.1 * np.sin(th),
                                                  0.0]))))
        ts.append(np.array([np.cos(th) - 1.0, np.sin(th), 0.05 * np.sin(th)]))
    rs, ts = np.stack(rs), np.stack(ts)

    # odometry edges with multiplicative scale drift on the translations
    ei, ej, rz, tz = [], [], [], []
    drift = 1.0
    drifted_r, drifted_t = [rs[0]], [ts[0]]
    for k in range(m - 1):
        r_rel, t_rel = se3_compose(
            *se3_inverse(jnp.asarray(rs[k]), jnp.asarray(ts[k])),
            jnp.asarray(rs[k + 1]), jnp.asarray(ts[k + 1]))
        drift *= 1.06
        ei.append(k)
        ej.append(k + 1)
        rz.append(np.asarray(r_rel))
        tz.append(np.asarray(t_rel) * drift)
        # drifted initial trajectory = chained drifted edges
        r_w, t_w = se3_compose(jnp.asarray(drifted_r[-1]),
                               jnp.asarray(drifted_t[-1]),
                               jnp.asarray(rz[-1]), jnp.asarray(tz[-1]))
        drifted_r.append(np.asarray(r_w))
        drifted_t.append(np.asarray(t_w))
    # exact loop edges: several closures make the scale field observable
    # along the chain (one closure constrains only the aggregate scale)
    for (a, b) in [(0, m - 1), (0, 12), (6, 18), (3, 21)]:
        r_loop, t_loop = se3_compose(
            *se3_inverse(jnp.asarray(rs[a]), jnp.asarray(ts[a])),
            jnp.asarray(rs[b]), jnp.asarray(ts[b]))
        ei.append(a)
        ej.append(b)
        rz.append(np.asarray(r_loop))
        tz.append(np.asarray(t_loop))

    args = (jnp.asarray(np.stack(drifted_r), jnp.float32),
            jnp.asarray(np.stack(drifted_t), jnp.float32),
            jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
            jnp.asarray(np.stack(rz), jnp.float32),
            jnp.asarray(np.stack(tz), jnp.float32))
    centers = ts  # gt positions

    ate_init = ate_rmse(np.stack(drifted_t), centers, with_scale=True)
    out_se3 = optimize_pose_graph(*args, n_iters=25)
    ate_se3 = ate_rmse(np.asarray(out_se3.t), centers, with_scale=True)
    out_sim3 = optimize_pose_graph_sim3(*args, n_iters=25)
    ate_sim3 = ate_rmse(np.asarray(out_sim3.t), centers, with_scale=True)

    assert np.all(np.isfinite(np.asarray(out_sim3.cost_history)))
    # Sim(3) must repair what SE(3) cannot
    assert ate_sim3 < 0.5 * ate_se3, \
        f"sim3 {ate_sim3:.3f} vs se3 {ate_se3:.3f} (init {ate_init:.3f})"
    assert ate_sim3 < 0.1, f"sim3 residual ATE {ate_sim3:.3f}"
    # recovered scales must trend against the injected drift
    s = np.asarray(out_sim3.s)
    assert s[0] == pytest.approx(1.0, abs=1e-3)  # gauge
    assert s[-1] < 0.65  # counteracting the accumulated 1.06^23 drift
