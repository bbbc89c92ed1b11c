"""Two-view structure-from-motion: the full learned front-end in one pass.

detect -> describe (learned VGG descriptor) -> kNN match (+ratio/mutual)
-> RANSAC essential -> cheirality pose recovery -> triangulation ->
Schur-complement two-view BA. This is BASELINE.json config 4; every step is
a jitted TPU program from this package (no OpenCV at runtime).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..geometry.ba import reprojection_residuals, two_view_ba
from ..geometry.epipolar import ransac_essential, recover_pose
from ..models.vgg import VGGDescriptor
from ..ops.detect import detect_corners, extract_patches
from ..ops.knn import knn_match, ratio_test


@dataclass
class TwoViewResult:
    rotation: np.ndarray       # (3, 3) cam1 -> cam2
    translation: np.ndarray    # (3,) unit-scale
    points3d: np.ndarray       # (M, 3) in cam-1 frame (inlier matches)
    keypoints1: np.ndarray     # (M, 2) pixel (x, y)
    keypoints2: np.ndarray
    n_matches: int
    n_inliers: int
    rms_reproj: float          # normalized-coordinate units


def two_view_sfm(img1, img2, intrinsics, model: VGGDescriptor, *,
                 n_keypoints: int = 512, ratio: float = 0.85,
                 ransac_iters: int = 1024, ransac_thresh: float = 1e-5,
                 ba_iters: int = 12,
                 key: Optional[jax.Array] = None) -> TwoViewResult:
    """Estimate relative pose + sparse structure for one image pair.

    intrinsics: (fx, fy, cx, cy). Images are (H, W) grayscale uint8/float.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    fx, fy, cx, cy = (float(v) for v in intrinsics)
    img1 = jnp.asarray(img1)
    img2 = jnp.asarray(img2)

    # detect + describe
    _, yx1, v1 = detect_corners(img1, k=n_keypoints)
    _, yx2, v2 = detect_corners(img2, k=n_keypoints)
    d1 = model.describe(extract_patches(img1, yx1))
    d2 = model.describe(extract_patches(img2, yx2))
    # invalidate padded detections by pushing them far away in desc space
    big = jnp.float32(1e6)
    d1 = jnp.where(v1[:, None], d1, big)
    d2 = jnp.where(v2[:, None], d2, -big)

    # match with ratio test
    dists, idx = knn_match(d1, d2, k=2, block=min(4096, n_keypoints))
    midx, ok = ratio_test(dists, idx, ratio=ratio)
    ok = ok & v1

    # normalized coordinates of matched pairs (invalid rows masked later)
    midx_safe = jnp.maximum(midx, 0)
    p1 = jnp.stack([(yx1[:, 1] - cx) / fx, (yx1[:, 0] - cy) / fy], 1)
    p2_all = jnp.stack([(yx2[:, 1] - cx) / fx, (yx2[:, 0] - cy) / fy], 1)
    p2 = p2_all[midx_safe]

    # keep static shapes: replace unmatched rows with a repeat of a valid one
    ok_np = np.asarray(ok)
    sel = np.flatnonzero(ok_np)
    if sel.size < 8:
        raise ValueError(f"too few matches: {sel.size}")
    x1 = jnp.asarray(np.asarray(p1)[sel])
    x2 = jnp.asarray(np.asarray(p2)[sel])

    e, mask, n_inl = ransac_essential(
        x1, x2, key, n_hypotheses=ransac_iters, thresh=ransac_thresh)
    r, t, pts3d, _ = recover_pose(e, x1, x2, mask)

    w = mask.astype(jnp.float32)
    ba = two_view_ba(r, t, pts3d, x1, x2, weights=w, n_iters=ba_iters)
    res = reprojection_residuals(ba.r, ba.t, ba.points, x1, x2)
    res = np.asarray(res)[np.asarray(mask)]
    rms = float(np.sqrt((res ** 2).mean())) if res.size else float("nan")

    mask_np = np.asarray(mask)
    kp1 = np.asarray(yx1)[sel][:, ::-1]  # (x, y)
    kp2 = np.asarray(yx2)[np.asarray(midx_safe)[sel]][:, ::-1]
    return TwoViewResult(
        rotation=np.asarray(ba.r),
        translation=np.asarray(ba.t),
        points3d=np.asarray(ba.points)[mask_np],
        keypoints1=kp1[mask_np],
        keypoints2=kp2[mask_np],
        n_matches=int(sel.size),
        n_inliers=int(n_inl),
        rms_reproj=rms,
    )
