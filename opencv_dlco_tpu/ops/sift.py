"""SIFT-style baseline descriptor, fully batched on the MXU.

The hand-crafted baseline BASELINE.json config 3 compares the learned DLCO
descriptors against ("HPatches matching: DLCO descriptors vs SIFT
baseline"). No reference analogue — the reference's only descriptor is the
learned VGG pipeline (src/vgg-desc.cpp) — so this is north-star scope;
the gradient front half intentionally reuses the same dense operator
matmuls as ops/patch_transform (blur + central-difference as (P, P)
operators, one batched matmul each) so both descriptors ride the MXU.

Descriptor: Lowe's classic layout — per-pixel gradient magnitude +
orientation, Gaussian-weighted over the patch, soft-assigned (trilinear:
2 x 2 spatial cells x 2 orientation bins per pixel via full bilinear
weight matrices, same mechanism as the reference's 8-bin angle
interpolation at src/vgg-desc.cpp:69-101) into a 4 x 4 spatial grid of
8-bin orientation histograms -> 128-D; L2 normalise, clip at 0.2,
renormalise (the standard illumination-robustness step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .patch_transform import blur_matrix, gradient_matrix

_HIGHEST = jax.lax.Precision.HIGHEST

N_SPATIAL = 4    # 4 x 4 descriptor grid
N_ANGLE = 8      # orientation bins
N_DIM = N_SPATIAL * N_SPATIAL * N_ANGLE  # 128


@functools.lru_cache(maxsize=8)
def _spatial_weights(patch_size: int) -> np.ndarray:
    """(P, N_SPATIAL) bilinear weights of each pixel row/col onto the 4
    cell centres (shared across rows and columns by separability)."""
    coords = (np.arange(patch_size) + 0.5) / patch_size * N_SPATIAL - 0.5
    cells = np.arange(N_SPATIAL)
    w = np.maximum(0.0, 1.0 - np.abs(coords[:, None] - cells[None, :]))
    # edge pixels outside the outer cell centres keep full weight on the
    # nearest cell (standard clamping)
    w[coords < 0, 0] = 1.0
    w[coords > N_SPATIAL - 1, -1] = 1.0
    return w.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _gauss_window(patch_size: int) -> np.ndarray:
    """(P, P) isotropic Gaussian magnitude weighting (sigma = P/2)."""
    c = (patch_size - 1) / 2.0
    y = np.arange(patch_size) - c
    g = np.exp(-(y ** 2) / (2.0 * (patch_size / 2.0) ** 2))
    return np.outer(g, g).astype(np.float32)


def sift_fn(patch_size: int = 64, sigma: float = 1.4, clip: float = 0.2):
    """Returns a pure jittable (B, P, P) uint8/float -> (B, 128) function."""
    by = jnp.asarray(blur_matrix(patch_size, sigma))
    gd = jnp.asarray(gradient_matrix(patch_size))
    sw = jnp.asarray(_spatial_weights(patch_size))
    gw = jnp.asarray(_gauss_window(patch_size))

    def forward(patches):
        img = patches.astype(jnp.float32) / 255.0
        img = jnp.einsum("ij,bjk,lk->bil", by, img, by,
                         precision=_HIGHEST)            # separable blur
        ix = jnp.matmul(img, gd.T, precision=_HIGHEST)
        iy = jnp.einsum("ij,bjk->bik", gd, img, precision=_HIGHEST)
        mag = jnp.sqrt(ix * ix + iy * iy) * gw
        ang = jnp.arctan2(iy, ix)                        # [-pi, pi]
        # soft orientation assignment (same bilinear scheme as the
        # reference's 8-bin interpolation, vgg-desc.cpp:69-101)
        t = (ang / (2.0 * jnp.pi) + 0.5) * N_ANGLE       # [0, 8]
        lo = jnp.floor(t)
        frac = t - lo
        lo = lo.astype(jnp.int32) % N_ANGLE
        hi = (lo + 1) % N_ANGLE
        onehot_lo = jax.nn.one_hot(lo, N_ANGLE, dtype=jnp.float32)
        onehot_hi = jax.nn.one_hot(hi, N_ANGLE, dtype=jnp.float32)
        hist_px = (mag[..., None]
                   * (onehot_lo * (1.0 - frac[..., None])
                      + onehot_hi * frac[..., None]))    # (B, P, P, 8)
        # spatial pooling: rows then cols through the bilinear cell
        # weights — two skinny matmuls instead of a scatter
        pooled = jnp.einsum("yr,byxa->brxa", sw, hist_px,
                            precision=_HIGHEST)
        pooled = jnp.einsum("xc,brxa->brca", sw, pooled,
                            precision=_HIGHEST)          # (B, 4, 4, 8)
        d = pooled.reshape(patches.shape[0], N_DIM)
        d = d / (jnp.linalg.norm(d, axis=1, keepdims=True) + 1e-12)
        d = jnp.minimum(d, clip)
        return d / (jnp.linalg.norm(d, axis=1, keepdims=True) + 1e-12)

    return forward


@functools.partial(jax.jit, static_argnames=("patch_size",))
def sift_describe(patches: jax.Array, patch_size: int = 64) -> jax.Array:
    """Batched SIFT baseline: (B, P, P) patches -> (B, 128) descriptors."""
    return sift_fn(patch_size)(patches)
