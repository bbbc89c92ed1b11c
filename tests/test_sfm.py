"""Detector + full two-view SfM pipeline on a rendered synthetic scene."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import REFERENCE, requires_reference

from opencv_dlco_tpu.ops.detect import detect_corners, extract_patches


def _render_scene(rng, size=256, n_blobs=120):
    """Textured image: sum of random Gaussian blobs (detectable corners)."""
    yy, xx = np.mgrid[:size, :size].astype(np.float64)
    img = np.zeros((size, size))
    cys = rng.uniform(10, size - 10, n_blobs)
    cxs = rng.uniform(10, size - 10, n_blobs)
    amps = rng.uniform(-1, 1, n_blobs)
    for cy, cx, a in zip(cys, cxs, amps):
        img += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 3.0 ** 2))
    img = (img - img.min()) / (img.max() - img.min())
    return (img * 255).astype(np.uint8)


def test_detect_corners_finds_blobs(rng):
    img = _render_scene(rng)
    scores, yx, valid = detect_corners(jnp.asarray(img), k=128, border=32)
    n_valid = int(np.asarray(valid).sum())
    assert n_valid > 50
    yx_np = np.asarray(yx)[np.asarray(valid)]
    assert yx_np[:, 0].min() >= 32 and yx_np[:, 0].max() < 256 - 32
    # detections are spread out (NMS works)
    d = np.sqrt(((yx_np[:, None] - yx_np[None]) ** 2).sum(-1))
    np.fill_diagonal(d, 1e9)
    assert d.min() >= 4


def test_extract_patches_centered(rng):
    img = np.arange(128 * 128, dtype=np.float32).reshape(128, 128)
    yx = jnp.asarray([[40, 50], [64, 64]], dtype=jnp.int32)
    patches = np.asarray(extract_patches(jnp.asarray(img), yx, patch_size=64))
    assert patches.shape == (2, 64, 64)
    np.testing.assert_array_equal(patches[0], img[8:72, 18:82])


def _render_3d_blobs(pts3d, amps, sigma_px, f, c, size, r=None, t=None):
    """Splat Gaussian blobs at the projections of 3D points."""
    if r is not None:
        pts3d = pts3d @ np.asarray(r).T + np.asarray(t)
    u = f * pts3d[:, 0] / pts3d[:, 2] + c
    v = f * pts3d[:, 1] / pts3d[:, 2] + c
    yy, xx = np.mgrid[:size, :size].astype(np.float64)
    img = np.zeros((size, size))
    for ui, vi, a, s in zip(u, v, amps, sigma_px):
        if -10 < ui < size + 10 and -10 < vi < size + 10:
            img += a * np.exp(-((yy - vi) ** 2 + (xx - ui) ** 2) / (2 * s ** 2))
    img = (img - img.min()) / (img.max() - img.min() + 1e-12)
    return (img * 255).astype(np.uint8)


@requires_reference
def test_two_view_sfm_end_to_end():
    """Non-planar 3D blob field seen from two poses; the full
    detect->describe->match->RANSAC->BA pipeline, running the reference's
    *published* 64-D descriptor through our stack, must recover the
    relative pose (a planar scene would leave E degenerate).

    Dedicated rng (not the shared session fixture): the rendered scene —
    and the 2-degree rotation margin — must not depend on which tests
    consumed the session rng before this one (subset runs reorder it)."""
    from opencv_dlco_tpu.models.vgg import VGGDescriptor
    from opencv_dlco_tpu.pipeline.sfm import two_view_sfm
    from opencv_dlco_tpu.geometry.se3 import so3_exp

    rng = np.random.default_rng(2215)
    f, c, size = 300.0, 160.0, 320
    n = 220
    pts3d = np.stack([
        rng.uniform(-3, 3, n), rng.uniform(-3, 3, n), rng.uniform(4, 9, n)
    ], 1)
    amps = rng.uniform(0.4, 1.0, n) * rng.choice([-1, 1], n)
    sigmas = rng.uniform(2.0, 4.0, n)
    r = np.asarray(so3_exp(jnp.asarray([0.02, -0.03, 0.01])))
    t = np.array([0.3, 0.1, 0.02])
    img1 = _render_3d_blobs(pts3d, amps, sigmas, f, c, size)
    img2 = _render_3d_blobs(pts3d, amps, sigmas, f, c, size, r=r, t=t)

    with open(f"{REFERENCE}/workspace/opencv/vgg_generated_64.i") as fh:
        model = VGGDescriptor.from_header(fh.read())

    res = two_view_sfm(img1, img2, (f, f, c, c), model,
                       n_keypoints=256, ratio=0.9,
                       ransac_iters=512, ransac_thresh=2e-5)
    assert res.n_matches >= 50
    assert res.n_inliers >= 40
    assert res.rms_reproj < 5e-3
    # recovered rotation close to ground truth
    dr = res.rotation @ r.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dr) - 1) / 2, -1, 1)))
    assert ang < 2.0, f"rotation error {ang:.2f} deg"
    # translation direction (planar scenes are harder; direction only)
    cos = abs(res.translation @ t / (np.linalg.norm(res.translation)
                                     * np.linalg.norm(t) + 1e-12))
    assert cos > 0.9, f"translation direction cos {cos:.3f}"
