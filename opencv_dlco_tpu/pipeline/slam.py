"""Sequential monocular odometry / SLAM over an image sequence.

KITTI-style pipeline (BASELINE.json config 5) built from this package's
jitted parts: per-frame detect+describe once, consecutive-pair matching →
batched RANSAC essential → cheirality pose → two-view BA, monocular scale
propagated through landmarks shared by overlapping pairs (depth-ratio
voting on common keypoints of the middle frame), optional loop-closure
edges, and a pose-graph solve over the whole trajectory. Evaluation:
Umeyama-aligned ATE-RMSE.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..geometry.ba import two_view_ba
from ..geometry.epipolar import ransac_essential, recover_pose
from ..geometry.posegraph import optimize_pose_graph
from ..geometry.se3 import se3_compose, se3_inverse
from ..models.vgg import VGGDescriptor
from ..ops.detect import detect_corners, extract_patches
from ..ops.knn import knn_match, ratio_test


@dataclass
class SlamConfig:
    n_keypoints: int = 384
    ratio: float = 0.9
    ransac_iters: int = 512
    ransac_thresh: float = 2e-5
    ba_iters: int = 8
    min_matches: int = 16
    min_scale_points: int = 5


@dataclass
class PairEstimate:
    rotation: np.ndarray        # frame i -> i+1
    translation: np.ndarray     # scaled (after propagation)
    kp_prev_idx: np.ndarray     # indices into frame-i keypoint set
    points3d: np.ndarray        # landmarks in frame-i coordinates
    n_inliers: int


@dataclass
class SlamResult:
    rotations: np.ndarray       # (F, 3, 3) world_T_frame (frame 0 = world)
    translations: np.ndarray    # (F, 3)
    pairs: List[PairEstimate] = field(default_factory=list)


def _frame_features(frames, model: VGGDescriptor, cfg: SlamConfig):
    feats = []
    for f in frames:
        img = jnp.asarray(f)
        _, yx, valid = detect_corners(img, k=cfg.n_keypoints)
        desc = model.describe(extract_patches(img, yx))
        big = jnp.float32(1e6)
        desc = jnp.where(valid[:, None], desc, big)
        feats.append((np.asarray(yx), np.asarray(desc), np.asarray(valid)))
    return feats


def _pair_pose(feats_a, feats_b, intrinsics, cfg: SlamConfig, key):
    fx, fy, cx, cy = intrinsics
    yx1, d1, v1 = feats_a
    yx2, d2, v2 = feats_b
    d2m = np.where(v2[:, None], d2, -1e6)
    dists, idx = knn_match(jnp.asarray(d1), jnp.asarray(d2m), k=2,
                           block=min(4096, d1.shape[0]))
    midx, ok = ratio_test(dists, idx, ratio=cfg.ratio)
    ok = np.asarray(ok) & v1
    sel = np.flatnonzero(ok)
    if sel.size < cfg.min_matches:
        raise ValueError(f"too few matches between frames: {sel.size}")
    m2 = np.asarray(jnp.maximum(midx, 0))[sel]
    p1 = np.stack([(yx1[sel, 1] - cx) / fx, (yx1[sel, 0] - cy) / fy], 1)
    p2 = np.stack([(yx2[m2, 1] - cx) / fx, (yx2[m2, 0] - cy) / fy], 1)
    x1 = jnp.asarray(p1.astype(np.float32))
    x2 = jnp.asarray(p2.astype(np.float32))
    e, mask, n_inl = ransac_essential(
        x1, x2, key, n_hypotheses=cfg.ransac_iters,
        thresh=cfg.ransac_thresh)
    r, t, pts, _ = recover_pose(e, x1, x2, mask)
    ba = two_view_ba(r, t, pts, x1, x2,
                     weights=mask.astype(jnp.float32), n_iters=cfg.ba_iters)
    mask_np = np.asarray(mask)
    return PairEstimate(
        rotation=np.asarray(ba.r),
        translation=np.asarray(ba.t),
        kp_prev_idx=sel[mask_np],
        points3d=np.asarray(ba.points)[mask_np],
        n_inliers=int(n_inl),
    ), sel, mask_np


def run_odometry(frames, intrinsics, model: VGGDescriptor,
                 cfg: Optional[SlamConfig] = None,
                 key: Optional[jax.Array] = None) -> SlamResult:
    """Chain consecutive-pair estimates into an absolute trajectory.

    Monocular scale: pair k's unit-norm translation is rescaled so that
    landmarks of the shared middle frame agree in depth with pair k-1
    (median depth ratio over common keypoints).
    """
    cfg = cfg or SlamConfig()
    if key is None:
        key = jax.random.PRNGKey(0)
    feats = _frame_features(frames, model, cfg)

    pairs: List[PairEstimate] = []
    prev_pts_in_cur: Optional[dict] = None  # keypoint idx (cur frame) -> depth
    for i in range(len(frames) - 1):
        key, sub = jax.random.split(key)
        est, sel, mask_np = _pair_pose(feats[i], feats[i + 1], intrinsics,
                                       cfg, sub)
        if prev_pts_in_cur is not None:
            # depths of this pair's landmarks, keyed by frame-i keypoint
            common_ratios = []
            for kp, pt in zip(est.kp_prev_idx, est.points3d):
                if kp in prev_pts_in_cur and pt[2] > 1e-6:
                    common_ratios.append(prev_pts_in_cur[kp] / pt[2])
            if len(common_ratios) >= cfg.min_scale_points:
                scale = float(np.median(common_ratios))
            else:
                scale = 1.0  # carry previous scale (drift, but no crash)
            est.translation = est.translation * scale
            est.points3d = est.points3d * scale
        # landmarks expressed in frame i+1 for the next overlap:
        # X_{i+1} = R X_i + t ; key them by the frame-(i+1) keypoint index
        # (which is this pair's *match target*); recompute matches mapping
        pts_next = est.points3d @ est.rotation.T + est.translation
        # match targets for surviving landmarks
        yx1, d1, v1 = feats[i]
        # reconstruct the match target indices for the surviving subset
        # (kp_prev_idx are frame-i keypoints; we need frame-i+1 partners)
        d2m = np.where(feats[i + 1][2][:, None], feats[i + 1][1], -1e6)
        dists, idx = knn_match(jnp.asarray(d1), jnp.asarray(d2m), k=2,
                               block=min(4096, d1.shape[0]))
        midx, _ = ratio_test(dists, idx, ratio=cfg.ratio)
        tgt = np.asarray(jnp.maximum(midx, 0))
        prev_pts_in_cur = {
            int(tgt[kp]): float(p[2])
            for kp, p in zip(est.kp_prev_idx, pts_next) if p[2] > 1e-6
        }
        pairs.append(est)

    # chain absolute poses: world = frame 0; world_T_k
    rs = [np.eye(3)]
    ts = [np.zeros(3)]
    for est in pairs:
        # pose maps frame-k coords to frame-k+1: x_{k+1} = R x_k + t
        # world_T_{k+1} = world_T_k ∘ inv([R|t])
        r_inv, t_inv = se3_inverse(jnp.asarray(est.rotation),
                                   jnp.asarray(est.translation))
        r_w, t_w = se3_compose(jnp.asarray(rs[-1]), jnp.asarray(ts[-1]),
                               r_inv, t_inv)
        rs.append(np.asarray(r_w))
        ts.append(np.asarray(t_w))
    return SlamResult(rotations=np.stack(rs), translations=np.stack(ts),
                      pairs=pairs)


def refine_with_pose_graph(result: SlamResult,
                           loop_edges: Optional[List[Tuple[int, int, np.ndarray, np.ndarray]]] = None,
                           n_iters: int = 15) -> SlamResult:
    """Pose-graph polish: odometry edges from the chained pairs plus
    optional (i, j, R_ij, t_ij) loop closures."""
    m = result.rotations.shape[0]
    ei, ej, rz, tz = [], [], [], []
    for k, est in enumerate(result.pairs):
        # edge measurement i_T_j with j = k+1: inv([R|t])
        r_inv, t_inv = se3_inverse(jnp.asarray(est.rotation),
                                   jnp.asarray(est.translation))
        ei.append(k)
        ej.append(k + 1)
        rz.append(np.asarray(r_inv))
        tz.append(np.asarray(t_inv))
    for (i, j, r_ij, t_ij) in loop_edges or []:
        ei.append(i)
        ej.append(j)
        rz.append(np.asarray(r_ij))
        tz.append(np.asarray(t_ij))
    out = optimize_pose_graph(
        jnp.asarray(result.rotations.astype(np.float32)),
        jnp.asarray(result.translations.astype(np.float32)),
        jnp.asarray(ei, dtype=jnp.int32), jnp.asarray(ej, dtype=jnp.int32),
        jnp.asarray(np.stack(rz).astype(np.float32)),
        jnp.asarray(np.stack(tz).astype(np.float32)),
        n_iters=n_iters)
    return SlamResult(rotations=np.asarray(out.r),
                      translations=np.asarray(out.t), pairs=result.pairs)


def ate_rmse(traj: np.ndarray, gt: np.ndarray,
             with_scale: bool = True) -> float:
    """Umeyama-aligned absolute trajectory error (RMSE over positions)."""
    traj = np.asarray(traj, np.float64)
    gt = np.asarray(gt, np.float64)
    mu_t, mu_g = traj.mean(0), gt.mean(0)
    xt, xg = traj - mu_t, gt - mu_g
    cov = xg.T @ xt / len(traj)
    u, d, vt = np.linalg.svd(cov)
    s = np.eye(3)
    if np.linalg.det(u @ vt) < 0:
        s[2, 2] = -1
    rot = u @ s @ vt
    if with_scale:
        var = (xt ** 2).sum() / len(traj)
        scale = np.trace(np.diag(d) @ s) / (var + 1e-12)
    else:
        scale = 1.0
    aligned = scale * xt @ rot.T + mu_g
    return float(np.sqrt(((aligned - gt) ** 2).sum(1).mean()))
