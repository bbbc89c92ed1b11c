"""Patch -> oriented-gradient feature transform ("get_desc").

TPU-native re-design of the reference's per-patch CPU routine
(reference: src/vgg-desc.cpp:41-152, itself a port of MATLAB get_patch.m):

- The separable Gaussian blur and the [-1,0,1] gradient filters (both with
  replicate border) are expressed as *dense 64x64 operator matrices*, so a
  whole batch of patches is blurred/differentiated with batched matmuls on
  the MXU instead of per-patch im2col convolutions:
      blur(P)  = M @ P @ M^T        (M encodes kernel taps + border clamp)
      Ix       = B @ G_x^T,  Iy = G_y @ B
- Everything downstream (magnitude, orientation, soft angular binning,
  quantile normalisation) is elementwise / sort work on the VPU, vmapped
  over the batch.

Output layout parity: the reference flattens the patch in *transposed*
(column-major) order before building the (4096, 8) PatchTrans
(reference: src/vgg-desc.cpp:134-151), i.e. flat index p = x*64 + y with x
the horizontal coordinate. We produce the same layout so pooling filters
(which use the same [x, y] flattening, see ops/pool_regions.py) line up.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.configs import DescriptorConfig

_HIGHEST = jax.lax.Precision.HIGHEST


def opencv_gaussian_ksize(sigma: float) -> int:
    """Aperture OpenCV derives for GaussianBlur(Size(0,0), sigma) on CV_32F.

    ksize = round(sigma * 4 * 2 + 1) | 1  (non-8U depth branch).
    """
    k = int(round(sigma * 4.0 * 2.0 + 1.0))
    return k | 1


def gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """float32 Gaussian taps with OpenCV getGaussianKernel rounding semantics.

    Taps are exp(-x^2/(2 sigma^2)) computed and unit-sum normalised in
    double, cast to float32 only at the end — matching cv2.getGaussianKernel
    bit-for-bit (verified in tests/test_patch_transform.py).
    """
    assert ksize % 2 == 1
    xs = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    taps64 = np.exp(-(xs * xs) / (2.0 * float(sigma) * float(sigma)))
    return (taps64 / taps64.sum()).astype(np.float32)


def _clamped_tap_matrix(n: int, taps: np.ndarray) -> np.ndarray:
    """(n, n) operator: out[o] = sum_t taps[t] * in[clip(o + t - r, 0, n-1)].

    Encodes a 1-D correlation with BORDER_REPLICATE as a dense matrix so the
    filter runs as a matmul on the MXU.
    """
    r = (len(taps) - 1) // 2
    m = np.zeros((n, n), dtype=np.float64)
    for o in range(n):
        for t, k in enumerate(taps):
            src = min(max(o + t - r, 0), n - 1)
            m[o, src] += float(k)
    return m.astype(np.float32)


@functools.lru_cache(maxsize=8)
def blur_matrix(patch_size: int, sigma: float) -> np.ndarray:
    """Dense (P, P) Gaussian blur-with-replicate-border operator."""
    taps = gaussian_kernel_1d(opencv_gaussian_ksize(sigma), sigma)
    return _clamped_tap_matrix(patch_size, taps)


@functools.lru_cache(maxsize=8)
def gradient_matrix(patch_size: int) -> np.ndarray:
    """Dense (P, P) central-difference operator for the [-1, 0, 1] kernel.

    Correlation with replicate border: out[o] = in[clip(o+1)] - in[clip(o-1)]
    (reference: src/vgg-desc.cpp:50-53).
    """
    return _clamped_tap_matrix(
        patch_size, np.array([-1.0, 0.0, 1.0], dtype=np.float32)
    )


def _quantile_coeffs(n: int, q: float):
    """Static (k, gamma) for the reference's mquantiles convention.

    reference: src/vgg-desc.cpp:113-125 — aleph = n*q + 0.5 in float32,
    k = floor(aleph) clamped to [1, n-1], gamma = aleph - k clamped to [0, 1].
    """
    aleph = np.float32(np.float32(n) * np.float32(q) + np.float32(0.5))
    k = int(np.floor(aleph))
    k = min(max(k, 1), n - 1)
    gamma = np.float32(aleph - np.float32(k))
    gamma = float(np.clip(gamma, 0.0, 1.0))
    return k, gamma


def patch_transform(patch: jax.Array, cfg: DescriptorConfig = DescriptorConfig()) -> jax.Array:
    """One patch (P, P) [row=y, col=x] -> PatchTrans (P*P, n_angle_bins).

    Pure function of a float32 (or uint8) image; jit/vmap-safe.
    """
    p = cfg.patch_size
    nb = cfg.n_angle_bins
    x = patch.astype(jnp.float32)

    m = jnp.asarray(blur_matrix(p, cfg.init_sigma))
    g = jnp.asarray(gradient_matrix(p))

    # blur(P) = M P M^T : rows (y) then cols (x)
    b = jnp.matmul(m, jnp.matmul(x, m.T, precision=_HIGHEST), precision=_HIGHEST)

    # Ix: horizontal derivative => operate on columns; Iy: vertical => rows.
    ix = jnp.matmul(b, g.T, precision=_HIGHEST)
    iy = jnp.matmul(g, b, precision=_HIGHEST)

    mag = jnp.sqrt(ix * ix + iy * iy)
    ang = jnp.arctan2(iy, ix) + np.float32(math.pi)

    step = np.float32(2.0 * math.pi / nb)
    ratio = ang / step - np.float32(0.5)
    off = ratio - jnp.floor(ratio)
    w1 = 1.0 - off
    w2 = off

    # Bin1 = ceil(ratio - 1) with -1 wrapping to nb-1 (src/vgg-desc.cpp:84-91)
    b1f = jnp.ceil(ratio - 1.0)
    bin1 = jnp.where(b1f == -1.0, nb - 1, b1f).astype(jnp.int32)
    bin2 = jnp.where(bin1 + 1 > nb - 1, 0, bin1 + 1)

    if cfg.norm:
        k, gamma = _quantile_coeffs(p * p, cfg.norm_quantile)
        srt = jnp.sort(mag.reshape(-1))
        t = np.float32(1.0 - gamma) * srt[k - 1] + np.float32(gamma) * srt[k]
        # The reference skips normalisation when T == 0 exactly (flat patch,
        # src/vgg-desc.cpp:131). Our MXU blur leaves O(1e-5) rounding noise
        # on flat patches, which the rescale would amplify to O(1); treat
        # noise-scale quantiles as the reference's zero-contrast case.
        mag = jnp.where(t > 1e-4, mag / (t / np.float32(nb)), mag)

    # soft assignment into angle bins; transpose to the reference's
    # column-major patch flattening (src/vgg-desc.cpp:134-151)
    oh1 = jax.nn.one_hot(bin1, nb, dtype=jnp.float32)
    oh2 = jax.nn.one_hot(bin2, nb, dtype=jnp.float32)
    trans = (w1 * mag)[..., None] * oh1 + (w2 * mag)[..., None] * oh2
    return trans.transpose(1, 0, 2).reshape(p * p, nb)


@functools.partial(jax.jit, static_argnums=(1,))
def batch_patch_transform(patches: jax.Array,
                          cfg: DescriptorConfig = DescriptorConfig()) -> jax.Array:
    """(B, P, P) patches -> (B, P*P, n_angle_bins) feature stacks."""
    return jax.vmap(lambda im: patch_transform(im, cfg))(patches)
