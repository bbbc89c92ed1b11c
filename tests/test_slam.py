"""Sequential odometry on a rendered 3D sequence + ATE evaluation."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import REFERENCE, requires_reference

from opencv_dlco_tpu.geometry.se3 import so3_exp
from opencv_dlco_tpu.pipeline.slam import (
    SlamConfig,
    ate_rmse,
    refine_with_pose_graph,
    run_odometry,
)

from test_sfm import _render_3d_blobs


def _sequence(rng, n_frames=5, size=320, f=300.0, c=160.0, n_blobs=260):
    pts3d = np.stack([
        rng.uniform(-4, 4, n_blobs), rng.uniform(-3, 3, n_blobs),
        rng.uniform(5, 12, n_blobs)
    ], 1)
    amps = rng.uniform(0.4, 1.0, n_blobs) * rng.choice([-1, 1], n_blobs)
    sigmas = rng.uniform(2.0, 4.0, n_blobs)
    frames, rs_gt, ts_gt = [], [], []
    for i in range(n_frames):
        r = np.asarray(so3_exp(jnp.asarray([0.0, 0.015 * i, 0.0])))
        t = np.array([0.25 * i, 0.0, 0.05 * i])
        frames.append(_render_3d_blobs(pts3d, amps, sigmas, f, c, size,
                                       r=r, t=t))
        rs_gt.append(r)
        ts_gt.append(t)
    return frames, np.stack(rs_gt), np.stack(ts_gt), (f, f, c, c)


def test_ate_rmse_invariances(rng):
    traj = rng.normal(size=(20, 3))
    # similarity transform of itself -> 0 error
    r = np.asarray(so3_exp(jnp.asarray([0.3, -0.2, 0.5])))
    warped = 2.5 * traj @ r.T + np.array([1.0, -2.0, 3.0])
    assert ate_rmse(warped, traj) < 1e-6
    assert ate_rmse(traj + rng.normal(0, 0.1, traj.shape), traj) > 0.01


@requires_reference
def test_odometry_sequence(rng):
    frames, rs_gt, ts_gt, intr = _sequence(rng)
    from opencv_dlco_tpu.models.vgg import VGGDescriptor

    with open(f"{REFERENCE}/workspace/opencv/vgg_generated_64.i") as fh:
        model = VGGDescriptor.from_header(fh.read())
    res = run_odometry(frames, intr, model, SlamConfig(n_keypoints=256))
    assert len(res.pairs) == len(frames) - 1
    for est in res.pairs:
        assert est.n_inliers >= 20

    # camera centers: gt world_T_k has center c_k = -R^T t
    centers_gt = np.stack([-rs_gt[i].T @ ts_gt[i] for i in range(len(frames))])
    ate = ate_rmse(res.translations, centers_gt)
    # trajectory spans ~1.0 in world units; aligned ATE should be well below
    span = np.linalg.norm(centers_gt[-1] - centers_gt[0])
    assert ate < 0.15 * span, f"ATE {ate:.3f} vs span {span:.3f}"

    refined = refine_with_pose_graph(res)
    ate2 = ate_rmse(refined.translations, centers_gt)
    assert ate2 < 0.2 * span  # pose graph keeps (or improves) the estimate
