"""Sequential monocular odometry / SLAM over an image sequence.

KITTI-style pipeline (BASELINE.json config 5) built from this package's
jitted parts, structured like a production monocular system:

- per-frame detect+describe ONCE (features shared by odometry, loop
  detection and windowed BA);
- consecutive-pair matching -> batched RANSAC essential -> cheirality pose
  -> two-view BA, monocular scale propagated through landmarks shared by
  overlapping pairs (depth-ratio voting on common keypoints);
- motion-based keyframe selection;
- loop-closure DETECTION: global-descriptor retrieval over keyframes
  (mean-pooled local descriptors) + geometric verification (descriptor
  matching, RANSAC essential, inlier gate) + depth-ratio scale recovery —
  detected, not injected;
- windowed bundle adjustment: multi-frame tracks chained from the pair
  correspondences, triangulated and refined per window through
  geometry/mvba.multi_view_ba; the refined consecutive relative poses
  replace the odometry edges (local-BA + pose-graph architecture);
- a pose-graph solve over the whole trajectory fusing refined odometry
  edges and loop closures. Evaluation: Umeyama-aligned ATE-RMSE.

The reference has no SLAM analogue; this is the north-star extension
(SURVEY.md §7 phase 5).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..geometry.ba import two_view_ba
from ..geometry.epipolar import ransac_essential, recover_pose
from ..geometry.mvba import build_landmark_table, multi_view_ba
from ..geometry.posegraph import (
    optimize_pose_graph,
    optimize_pose_graph_sim3,
)
from ..geometry.se3 import se3_compose, se3_inverse, so3_log
from ..geometry.triangulate import triangulate_points
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
    # keyframe selection (motion-based; translation in propagated-scale units)
    kf_min_rotation: float = 0.04       # rad accumulated since last keyframe
    kf_min_translation: float = 0.25
    # loop-closure detection
    loop_gap: int = 12                  # min frame separation
    loop_top_k: int = 2                 # retrieval candidates per keyframe
    loop_min_inliers: int = 24
    loop_weight: float = 1.0            # pose-graph weight of loop edges
    use_sim3: bool = True               # Sim(3) graph when loops detected
    # windowed bundle adjustment
    ba_window: int = 6                  # frames per window (0 disables)
    ba_stride: int = 3
    ba_max_tracks: int = 384
    ba_window_iters: int = 10


@dataclass
class PairEstimate:
    rotation: np.ndarray        # frame i -> i+1
    translation: np.ndarray     # scaled (after propagation)
    kp_prev_idx: np.ndarray     # inlier keypoint indices in frame i
    kp_next_idx: np.ndarray     # their matched keypoint indices in frame i+1
    points3d: np.ndarray        # landmarks in frame-i coordinates
    n_inliers: int


@dataclass
class SlamResult:
    rotations: np.ndarray       # (F, 3, 3) world_T_frame (frame 0 = world)
    translations: np.ndarray    # (F, 3)
    pairs: List[PairEstimate] = field(default_factory=list)
    keyframes: np.ndarray = field(default_factory=lambda: np.empty(0, int))
    loop_edges: List[Tuple[int, int, np.ndarray, np.ndarray]] = \
        field(default_factory=list)


def compute_features(frames, model: VGGDescriptor, cfg: SlamConfig,
                     chunk: int = 8):
    """Detect + describe every frame once; shared by all downstream stages.

    Keypoint coordinates are sub-pixel refined (parabolic fit) — at the
    ~9 px disparities of consecutive frames, integer centres alone put
    >10% noise on triangulated depths, which poisons monocular scale
    propagation.

    Frames are processed in vmapped chunks: detection batches over the
    frame axis and description runs as ONE (chunk * K)-patch program —
    the KITTI-scale throughput path (a per-frame Python loop would leave
    the MXU idle between small dispatches)."""
    frames = [np.asarray(f) for f in frames]
    feats = []
    big = jnp.float32(1e6)

    @functools.partial(jax.jit, static_argnames=("k",))
    def detect_chunk(imgs, k):
        def one(img):
            _, yx, valid, yx_f = detect_corners(img, k=k, subpixel=True)
            return yx, valid, yx_f

        return jax.vmap(one)(imgs)

    i = 0
    while i < len(frames):
        # uniform-shape run starting at i (vmap needs equal frame sizes)
        j = i + 1
        while (j < len(frames) and j - i < chunk
               and frames[j].shape == frames[i].shape):
            j += 1
        imgs = jnp.asarray(np.stack(frames[i:j]))
        yx, valid, yx_f = detect_chunk(imgs, cfg.n_keypoints)
        patches = jax.vmap(extract_patches)(imgs, yx)     # (C, K, P, P)
        c, k_pts = patches.shape[:2]
        desc = model.describe(patches.reshape((c * k_pts,)
                                              + patches.shape[2:]))
        desc = desc.reshape(c, k_pts, -1)
        desc = jnp.where(valid[..., None], desc, big)
        yx_f_np = np.asarray(yx_f)
        desc_np = np.asarray(desc)
        valid_np = np.asarray(valid)
        for m in range(c):
            feats.append((yx_f_np[m], desc_np[m], valid_np[m]))
        i = j
    return feats


def _pair_pose(feats_a, feats_b, intrinsics, cfg: SlamConfig, key):
    """Relative pose frame a -> frame b from one descriptor matching pass.

    Matching runs ONCE here; the returned estimate carries both endpoint
    keypoint indices so callers never need to re-match.
    """
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
    # cheirality-clean landmarks only: a triangulation behind either camera
    # is geometric junk and poisons downstream depth-ratio scale voting
    pts_np = np.asarray(ba.points)
    r_np = np.asarray(ba.r)
    t_np = np.asarray(ba.t)
    z2 = pts_np @ r_np.T[:, 2] + t_np[2]
    good = mask_np & (pts_np[:, 2] > 1e-6) & (z2 > 1e-6)
    return PairEstimate(
        rotation=r_np,
        translation=t_np,
        kp_prev_idx=sel[good],
        kp_next_idx=m2[good],
        points3d=pts_np[good],
        n_inliers=int(n_inl),
    )


def _median_depth_ratio(depths_by_kp: Dict[int, float], kp_idx, points3d,
                        min_points: int) -> Optional[float]:
    """Median over common keypoints of (known depth / new landmark depth)."""
    ratios = [depths_by_kp[int(kp)] / pt[2]
              for kp, pt in zip(kp_idx, points3d)
              if int(kp) in depths_by_kp and pt[2] > 1e-6]
    if len(ratios) < min_points:
        return None
    return float(np.median(ratios))


def run_odometry(frames, intrinsics, model: VGGDescriptor,
                 cfg: Optional[SlamConfig] = None,
                 key: Optional[jax.Array] = None,
                 feats=None) -> SlamResult:
    """Chain consecutive-pair estimates into an absolute trajectory.

    Monocular scale: pair k's unit-norm translation is rescaled so that
    landmarks of the shared middle frame agree in depth with pair k-1
    (median depth ratio over common keypoints). Pass precomputed ``feats``
    (from compute_features) to avoid re-extracting.
    """
    cfg = cfg or SlamConfig()
    if key is None:
        key = jax.random.PRNGKey(0)
    if feats is None:
        feats = compute_features(frames, model, cfg)

    pairs: List[PairEstimate] = []
    prev_depths: Optional[Dict[int, float]] = None  # kp idx (cur frame) -> z
    prev_scale = 1.0
    for i in range(len(feats) - 1):
        key, sub = jax.random.split(key)
        est = _pair_pose(feats[i], feats[i + 1], intrinsics, cfg, sub)
        if prev_depths is not None:
            scale = _median_depth_ratio(prev_depths, est.kp_prev_idx,
                                        est.points3d, cfg.min_scale_points)
            if scale is None:
                scale = prev_scale  # carry previous (drift, but no crash)
            # smooth motion bounds consecutive applied scales: a jump
            # beyond 2x is depth-voting noise, clamp against it
            scale = float(np.clip(scale, 0.5 * prev_scale, 2.0 * prev_scale))
            prev_scale = scale
            est.translation = est.translation * scale
            est.points3d = est.points3d * scale
        # landmarks expressed in frame i+1 for the next overlap, keyed by
        # this pair's match-target keypoint (no re-matching needed):
        # X_{i+1} = R X_i + t
        pts_next = est.points3d @ est.rotation.T + est.translation
        prev_depths = {
            int(kp): float(p[2])
            for kp, p in zip(est.kp_next_idx, pts_next) if p[2] > 1e-6
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


def select_keyframes(result: SlamResult, cfg: SlamConfig) -> np.ndarray:
    """Motion-based keyframe promotion: a frame becomes a keyframe when the
    accumulated rotation angle or translation since the last keyframe
    exceeds the config thresholds. Frames 0 and F-1 are always keyframes."""
    n = result.rotations.shape[0]
    kf = [0]
    acc_rot, acc_tr = 0.0, 0.0
    for k, est in enumerate(result.pairs):
        acc_rot += float(np.linalg.norm(
            np.asarray(so3_log(jnp.asarray(est.rotation)))))
        acc_tr += float(np.linalg.norm(est.translation))
        if acc_rot >= cfg.kf_min_rotation or acc_tr >= cfg.kf_min_translation:
            kf.append(k + 1)
            acc_rot, acc_tr = 0.0, 0.0
    if kf[-1] != n - 1:
        kf.append(n - 1)
    return np.asarray(kf, int)


def _global_descriptors(feats) -> np.ndarray:
    """L2-normalised mean of the valid local descriptors per frame — the
    retrieval representation (pipeline/eval.py retrieval protocol)."""
    out = []
    for yx, desc, valid in feats:
        d = desc[valid]
        g = d.mean(0) if len(d) else np.zeros(desc.shape[1], desc.dtype)
        out.append(g / (np.linalg.norm(g) + 1e-12))
    return np.stack(out)


def detect_loop_closures(feats, keyframes: np.ndarray, result: SlamResult,
                         intrinsics, cfg: SlamConfig,
                         key: Optional[jax.Array] = None,
                         ) -> List[Tuple[int, int, np.ndarray, np.ndarray]]:
    """Find loop closures among keyframes: retrieval + geometric verify.

    Returns pose-graph edges (i, j, R_ij, t_ij) with i < j and the
    measurement in the i_T_j convention of geometry/posegraph.py. Monocular
    translation scale is recovered by depth-ratio voting against the
    odometry landmarks of frame i; candidate pairs whose scale cannot be
    established are dropped (a mis-scaled loop edge is worse than none).
    """
    if key is None:
        key = jax.random.PRNGKey(1)
    kfs = [int(k) for k in keyframes]
    g = _global_descriptors([feats[k] for k in kfs])
    sims = g @ g.T
    edges = []
    seen = set()
    for a_pos in range(len(kfs)):
        fa = kfs[a_pos]
        cands = [(float(sims[a_pos, b_pos]), b_pos)
                 for b_pos in range(a_pos)
                 if fa - kfs[b_pos] >= cfg.loop_gap]
        cands.sort(reverse=True)
        for _, b_pos in cands[:cfg.loop_top_k]:
            fb = kfs[b_pos]
            if (fb, fa) in seen:
                continue
            seen.add((fb, fa))
            key, sub = jax.random.split(key)
            try:
                est = _pair_pose(feats[fb], feats[fa], intrinsics, cfg, sub)
            except ValueError:
                continue
            if est.n_inliers < cfg.loop_min_inliers:
                continue
            # scale: est.points3d live in frame-fb coords with unit-baseline
            # scale; compare with the odometry landmark depths of pair
            # (fb, fb+1), which are scale-propagated and also frame-fb.
            if fb >= len(result.pairs):
                continue
            odo = result.pairs[fb]
            depths = {int(kp): float(p[2])
                      for kp, p in zip(odo.kp_prev_idx, odo.points3d)
                      if p[2] > 1e-6}
            scale = _median_depth_ratio(depths, est.kp_prev_idx,
                                        est.points3d, cfg.min_scale_points)
            if scale is None:
                continue
            # est maps frame-fb -> frame-fa; the edge measurement is
            # i_T_j = inv([R | s*t]) with i=fb, j=fa.
            r_inv, t_inv = se3_inverse(
                jnp.asarray(est.rotation),
                jnp.asarray(est.translation * scale))
            edges.append((fb, fa, np.asarray(r_inv), np.asarray(t_inv)))
    return edges


def build_tracks(pairs: Sequence[PairEstimate]) -> List[List[Tuple[int, int]]]:
    """Chain pairwise inlier correspondences into multi-frame tracks.

    Each track is a list of (frame, keypoint) observations; consecutive
    pairs sharing a keypoint extend the same track (forward chaining, the
    union-find degenerates to this because matches are frame-to-next)."""
    active: Dict[int, List[Tuple[int, int]]] = {}
    tracks: List[List[Tuple[int, int]]] = []
    for k, est in enumerate(pairs):
        new_active: Dict[int, List[Tuple[int, int]]] = {}
        for kp_i, kp_j in zip(est.kp_prev_idx, est.kp_next_idx):
            tr = active.pop(int(kp_i), None)
            if tr is None:
                tr = [(k, int(kp_i))]
                tracks.append(tr)
            tr.append((k + 1, int(kp_j)))
            new_active[int(kp_j)] = tr
        active = new_active
    return tracks


def _extrinsics(result: SlamResult, frame: int):
    """world_T_frame -> (R, t) with x_cam = R x_world + t."""
    rw = result.rotations[frame]
    tw = result.translations[frame]
    return rw.T, -rw.T @ tw


def _pad_to(x: np.ndarray, n: int, fill=0):
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad, constant_values=fill)


def windowed_ba(result: SlamResult, feats, intrinsics, cfg: SlamConfig,
                ) -> Dict[int, Tuple[np.ndarray, np.ndarray]]:
    """Refine local geometry per window with multi-view BA; return refined
    odometry edge measurements {k: (R, t)} = i_T_j for edge (k, k+1).

    Architecture note: instead of splicing window poses into the global
    trajectory (which would need gauge bookkeeping per overlap), each
    window's BA result is read back as *relative* consecutive-pose
    measurements that replace the two-view odometry edges in the final
    pose-graph solve — the local-BA + pose-graph split of modern monocular
    systems, and it maps onto the sharded MVBA unchanged (the landmark
    shard axis is free to grow with window size).
    """
    fx, fy, cx, cy = intrinsics
    n_frames = result.rotations.shape[0]
    if cfg.ba_window < 3 or n_frames < 3:
        return {}
    tracks = build_tracks(result.pairs)
    edges: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}

    def obs_uv(frame, kp):
        yx = feats[frame][0][kp]
        return np.array([(yx[1] - cx) / fx, (yx[0] - cy) / fy], np.float32)

    starts = list(range(0, max(1, n_frames - 2), cfg.ba_stride))
    for a in starts:
        b = min(a + cfg.ba_window, n_frames)
        if b - a < 3:
            continue
        m = b - a
        # tracks clipped to the window, longest first
        win_tracks = []
        for tr in tracks:
            clip = [(f, kp) for f, kp in tr if a <= f < b]
            if len(clip) >= 2:
                win_tracks.append(clip)
        win_tracks.sort(key=len, reverse=True)
        win_tracks = win_tracks[:cfg.ba_max_tracks]
        if len(win_tracks) < 8:
            continue

        cam_idx, pt_idx, uvs = [], [], []
        points0 = []
        r_cam = np.stack([_extrinsics(result, f)[0] for f in range(a, b)])
        t_cam = np.stack([_extrinsics(result, f)[1] for f in range(a, b)])
        for n_id, tr in enumerate(win_tracks):
            (f0, kp0), (f1, kp1) = tr[0], tr[-1]
            # triangulate from the first/last observation: relative pose
            # f0 -> f1 from the current trajectory estimate
            r_rel = r_cam[f1 - a] @ r_cam[f0 - a].T
            t_rel = t_cam[f1 - a] - r_rel @ t_cam[f0 - a]
            x0 = jnp.asarray(obs_uv(f0, kp0)[None])
            x1 = jnp.asarray(obs_uv(f1, kp1)[None])
            p_f0 = np.asarray(triangulate_points(
                jnp.asarray(r_rel.astype(np.float32)),
                jnp.asarray(t_rel.astype(np.float32)), x0, x1))[0]
            # to world coords
            p_w = result.rotations[f0] @ p_f0 + result.translations[f0]
            points0.append(p_w)
            for f, kp in tr:
                cam_idx.append(f - a)
                pt_idx.append(n_id)
                uvs.append(obs_uv(f, kp))

        n_lm = len(points0)
        k_obs = len(uvs)
        # pad to buckets so repeated windows reuse one compiled program;
        # n_pad > n_lm always, so padded observations can be spread over
        # padding landmarks without touching real landmarks' tables
        n_pad = -(-(n_lm + 1) // 64) * 64
        k_pad = -(-k_obs // 256) * 256
        pts = _pad_to(np.asarray(points0, np.float32), n_pad, fill=1.0)
        cam = _pad_to(np.asarray(cam_idx, np.int32), k_pad)
        pt = _pad_to(np.asarray(pt_idx, np.int32), k_pad)
        uv = _pad_to(np.asarray(uvs, np.float32), k_pad)
        w = np.zeros(k_pad, np.float32)
        w[:k_obs] = 1.0
        pt[k_obs:] = np.arange(k_pad - k_obs) % (n_pad - n_lm) + n_lm
        table, _ = build_landmark_table(pt, n_pad)
        out = multi_view_ba(
            jnp.asarray(r_cam.astype(np.float32)),
            jnp.asarray(t_cam.astype(np.float32)),
            jnp.asarray(pts), jnp.asarray(cam), jnp.asarray(pt),
            jnp.asarray(uv), jnp.asarray(table), jnp.asarray(w),
            n_iters=cfg.ba_window_iters)
        costs = np.asarray(out.cost_history)
        if not np.isfinite(costs[-1]) or costs[-1] > costs[0]:
            continue  # keep the two-view edges for this window
        r_ba = np.asarray(out.r)
        t_ba = np.asarray(out.t)
        # world_T_f = inv(extrinsic); edge Z_{k,k+1} = T_k^-1 T_{k+1}
        rel = []
        for k in range(m - 1):
            # T_k^-1 T_{k+1} in world_T convention equals
            # extr_k ∘ inv(extr_{k+1})
            r_z = r_ba[k] @ r_ba[k + 1].T
            t_z = t_ba[k] - r_z @ t_ba[k + 1]
            rel.append((r_z, t_z))
        # monocular scale-gauge anchor: BA's reduced system is singular
        # along global scale (the LM damping lets it drift per window);
        # re-anchor so the window's total baseline matches the input
        # trajectory's (shape is BA's to refine, scale is not)
        base_in = sum(
            float(np.linalg.norm(t_cam[k + 1]
                                 - (r_cam[k + 1] @ r_cam[k].T) @ t_cam[k]))
            for k in range(m - 1))
        base_ba = sum(float(np.linalg.norm(t)) for _, t in rel)
        s = base_in / base_ba if base_ba > 1e-12 else 1.0
        for k, (r_z, t_z) in enumerate(rel):
            edges[a + k] = (r_z, t_z * s)
    return edges


def refine_with_pose_graph(result: SlamResult,
                           loop_edges: Optional[List[Tuple[int, int, np.ndarray, np.ndarray]]] = None,
                           odometry_overrides: Optional[Dict[int, Tuple[np.ndarray, np.ndarray]]] = None,
                           loop_weight: float = 1.0,
                           n_iters: int = 15,
                           sim3: bool = False) -> SlamResult:
    """Pose-graph polish: odometry edges from the chained pairs (optionally
    overridden by windowed-BA refinements) plus (i, j, R_ij, t_ij) loop
    closures. ``sim3=True`` optimises over Sim(3) — per-node scale states
    absorb monocular scale drift, which SE(3) edges structurally cannot
    (use whenever loop closures are present)."""
    ei, ej, rz, tz, wts = [], [], [], [], []
    overrides = odometry_overrides or {}
    for k, est in enumerate(result.pairs):
        if k in overrides:
            r_e, t_e = overrides[k]
        else:
            # edge measurement i_T_j with j = k+1: inv([R|t])
            r_inv, t_inv = se3_inverse(jnp.asarray(est.rotation),
                                       jnp.asarray(est.translation))
            r_e, t_e = np.asarray(r_inv), np.asarray(t_inv)
        ei.append(k)
        ej.append(k + 1)
        rz.append(r_e)
        tz.append(t_e)
        wts.append(1.0)
    for (i, j, r_ij, t_ij) in loop_edges or []:
        ei.append(i)
        ej.append(j)
        rz.append(np.asarray(r_ij))
        tz.append(np.asarray(t_ij))
        wts.append(loop_weight)
    solver = optimize_pose_graph_sim3 if sim3 else optimize_pose_graph
    out = solver(
        jnp.asarray(result.rotations.astype(np.float32)),
        jnp.asarray(result.translations.astype(np.float32)),
        jnp.asarray(ei, dtype=jnp.int32), jnp.asarray(ej, dtype=jnp.int32),
        jnp.asarray(np.stack(rz).astype(np.float32)),
        jnp.asarray(np.stack(tz).astype(np.float32)),
        jnp.asarray(np.asarray(wts, np.float32)),
        n_iters=n_iters)
    return SlamResult(rotations=np.asarray(out.r),
                      translations=np.asarray(out.t), pairs=result.pairs,
                      keyframes=result.keyframes,
                      loop_edges=result.loop_edges)


def run_slam(frames, intrinsics, model: VGGDescriptor,
             cfg: Optional[SlamConfig] = None,
             key: Optional[jax.Array] = None) -> SlamResult:
    """Full pipeline: odometry -> keyframes -> loop detection -> windowed
    BA -> pose graph. Returns the refined trajectory with the keyframe set
    and detected loop edges attached."""
    cfg = cfg or SlamConfig()
    if key is None:
        key = jax.random.PRNGKey(0)
    key, k_odo, k_loop = jax.random.split(key, 3)
    feats = compute_features(frames, model, cfg)
    odo = run_odometry(frames, intrinsics, model, cfg, key=k_odo,
                       feats=feats)
    kf = select_keyframes(odo, cfg)
    loops = detect_loop_closures(feats, kf, odo, intrinsics, cfg, key=k_loop)
    overrides = windowed_ba(odo, feats, intrinsics, cfg)
    odo.keyframes = kf
    odo.loop_edges = loops
    refined = refine_with_pose_graph(odo, loop_edges=loops,
                                     odometry_overrides=overrides,
                                     loop_weight=cfg.loop_weight,
                                     sim3=cfg.use_sim3 and len(loops) > 0)
    return refined


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
