"""Harris/Shi-Tomasi keypoint detection, fully batched and jit-static.

Front-end detector feeding the VGG descriptor (no reference analogue — the
reference consumes pre-cropped Brown patches; this is the SfM extension's
detect step). TPU design: gradients reuse the descriptor's dense operator
matmuls, non-maximum suppression is a reduce-window equality test, and
"variable number of keypoints" becomes a static top-k with a validity mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .patch_transform import blur_matrix, gradient_matrix

_HIGHEST = jax.lax.Precision.HIGHEST


@functools.partial(jax.jit, static_argnames=("k", "nms_radius", "border",
                                             "use_shi_tomasi", "subpixel"))
def detect_corners(image: jax.Array, k: int = 512, *, nms_radius: int = 4,
                   border: int = 32, harris_k: float = 0.04,
                   sigma: float = 2.0, use_shi_tomasi: bool = True,
                   subpixel: bool = False):
    """(H, W) image -> (scores (k,), yx (k, 2) int32, valid (k,)).

    Corners are NMS-filtered local maxima of the structure-tensor response,
    excluding a border margin (so a full patch fits around each corner).

    With ``subpixel=True`` a fourth output (k, 2) float32 is appended: the
    per-axis parabolic refinement of each maximum (offset clamped to
    +-0.5 px). Sub-pixel centres matter for geometry (triangulation depth
    error scales with keypoint error over an ~9 px disparity); the integer
    centres remain the patch-extraction anchors.
    """
    img = image.astype(jnp.float32)
    h, w = img.shape
    gy = jnp.asarray(gradient_matrix(h))
    gx = jnp.asarray(gradient_matrix(w))
    ix = jnp.matmul(img, gx.T, precision=_HIGHEST)
    iy = jnp.matmul(gy, img, precision=_HIGHEST)

    by = jnp.asarray(blur_matrix(h, sigma))
    bx = jnp.asarray(blur_matrix(w, sigma))

    def smooth(a):
        return jnp.matmul(by, jnp.matmul(a, bx.T, precision=_HIGHEST),
                          precision=_HIGHEST)

    sxx = smooth(ix * ix)
    syy = smooth(iy * iy)
    sxy = smooth(ix * iy)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    if use_shi_tomasi:
        # smaller eigenvalue of the structure tensor
        resp = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0)))
    else:
        resp = det - harris_k * tr * tr

    # NMS: keep pixels equal to their neighbourhood max
    win = 2 * nms_radius + 1
    local_max = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (win, win), (1, 1), "SAME")
    keep = resp >= local_max

    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    in_border = ((ys >= border) & (ys < h - border)
                 & (xs >= border) & (xs < w - border))
    score = jnp.where(keep & in_border, resp, -jnp.inf)

    flat = score.reshape(-1)
    top, idx = jax.lax.top_k(flat, k)
    yx = jnp.stack([idx // w, idx % w], axis=1).astype(jnp.int32)
    valid = jnp.isfinite(top) & (top > 0)
    if not subpixel:
        return top, yx, valid

    # 1-D parabola per axis on the raw response: off = -0.5 (r+ - r-) /
    # (r+ - 2 r0 + r-); borders guarantee the +-1 neighbours exist
    def refine_axis(dy, dx):
        return resp[jnp.clip(yx[:, 0] + dy, 0, h - 1),
                    jnp.clip(yx[:, 1] + dx, 0, w - 1)]

    r0 = refine_axis(0, 0)
    denom_y = refine_axis(1, 0) - 2.0 * r0 + refine_axis(-1, 0)
    denom_x = refine_axis(0, 1) - 2.0 * r0 + refine_axis(0, -1)
    off_y = jnp.where(jnp.abs(denom_y) > 1e-12,
                      -0.5 * (refine_axis(1, 0) - refine_axis(-1, 0))
                      / denom_y, 0.0)
    off_x = jnp.where(jnp.abs(denom_x) > 1e-12,
                      -0.5 * (refine_axis(0, 1) - refine_axis(0, -1))
                      / denom_x, 0.0)
    off = jnp.clip(jnp.stack([off_y, off_x], axis=1), -0.5, 0.5)
    yx_f = yx.astype(jnp.float32) + off
    return top, yx, valid, yx_f


@functools.partial(jax.jit, static_argnames=("patch_size",))
def extract_patches(image: jax.Array, yx: jax.Array,
                    patch_size: int = 64) -> jax.Array:
    """Crop patch_size^2 windows centred on each (y, x): (K, P, P).

    Centres must be >= patch_size//2 from the border (the detector's
    ``border`` argument guarantees this).
    """
    img = image.astype(jnp.float32)
    half = patch_size // 2

    def crop(c):
        return jax.lax.dynamic_slice(
            img, (c[0] - half, c[1] - half), (patch_size, patch_size))

    return jax.vmap(crop)(yx)
