"""Independent numpy/OpenCV oracle implementations used by the test suite.

These follow the *published algorithm* (Simonyan-Vedaldi-Zisserman DLCO /
MATLAB get_patch.m semantics, as documented in SURVEY.md) using cv2 + numpy
directly — the same libraries the reference wraps — giving an implementation
of the spec that is independent of the framework's JAX code paths.
"""

from __future__ import annotations

import math

import cv2
import numpy as np


def get_desc_oracle(patch: np.ndarray, n_angle_bins: int = 8,
                    init_sigma: float = 1.4, norm: bool = True) -> np.ndarray:
    """(64, 64) patch -> (4096, n_angle_bins) float32 feature transform.

    Mirrors the DLCO patch transform spec (reference: src/vgg-desc.cpp:41-152)
    using cv2 primitives for blur/filtering.
    """
    p = patch.astype(np.float32)
    p = cv2.GaussianBlur(p, (0, 0), init_sigma, None, init_sigma,
                         cv2.BORDER_REPLICATE)
    kernel = np.array([[-1.0, 0.0, 1.0]], dtype=np.float32)
    ix = cv2.filter2D(p, cv2.CV_32F, kernel, anchor=(-1, -1),
                      borderType=cv2.BORDER_REPLICATE)
    iy = cv2.filter2D(p, cv2.CV_32F, kernel.T, anchor=(-1, -1),
                      borderType=cv2.BORDER_REPLICATE)
    mag = np.sqrt(ix * ix + iy * iy).astype(np.float32)
    ang = (np.arctan2(iy.astype(np.float32), ix.astype(np.float32))
           + np.float32(math.pi)).astype(np.float32)

    step = np.float32(2.0 * math.pi / n_angle_bins)
    ratio = (ang / step - np.float32(0.5)).astype(np.float32)
    off = ratio - np.floor(ratio)
    w1 = (1.0 - off).astype(np.float32)
    w2 = off.astype(np.float32)

    b1 = np.ceil(ratio - 1.0)
    bin1 = np.where(b1 == -1.0, n_angle_bins - 1, b1).astype(np.int32)
    bin2 = np.where(bin1 + 1 > n_angle_bins - 1, 0, bin1 + 1).astype(np.int32)

    if norm:
        q = np.float32(0.8)
        srt = np.sort(mag.reshape(-1))
        n = srt.shape[0]
        aleph = np.float32(np.float32(n) * q + np.float32(0.5))
        k = int(math.floor(aleph))
        k = min(max(k, 1), n - 1)
        gamma = float(np.clip(np.float32(aleph - np.float32(k)), 0.0, 1.0))
        t = np.float32((1.0 - gamma)) * srt[k - 1] + np.float32(gamma) * srt[k]
        if t != 0.0:
            mag = mag / (t / np.float32(n_angle_bins))

    npix = patch.shape[0] * patch.shape[1]
    out = np.zeros((npix, n_angle_bins), dtype=np.float32)
    # transpose (column-major patch flattening), then scatter the two bins
    b1t = bin1.T.reshape(-1)
    b2t = bin2.T.reshape(-1)
    w1t = w1.T.reshape(-1)
    w2t = w2.T.reshape(-1)
    mt = mag.T.reshape(-1)
    idx = np.arange(npix)
    out[idx, b1t] = w1t * mt
    out[idx, b2t] = w2t * mt
    return out


def pr_filter_oracle(x0: float, y0: float, sigma: float,
                     patch_size: int = 64) -> np.ndarray:
    """Scalar-loop Gaussian pooling filter on the extended grid, then crop.

    Direct transcription of the *spec*: extended grid of size P + 2*ceil(3s),
    Gaussian written only inside the 3-sigma loop box, cropped, unit-sum
    normalised (reference: src/gen-poolregion.cpp:51-80). Returns (P, P)
    float32 in [x, y] indexing.
    """
    r_ext = math.ceil(3.0 * sigma)
    size = patch_size + 2 * r_ext
    pr = np.zeros((size, size), dtype=np.float32)
    cx = x0 + 0.5 * (1.0 + patch_size) + r_ext
    cy = y0 + 0.5 * (1.0 + patch_size) + r_ext
    for y in range(math.floor(cy - 3.0 * sigma), math.ceil(cy + 3.0 * sigma) + 1):
        for x in range(math.floor(cx - 3.0 * sigma), math.ceil(cx + 3.0 * sigma) + 1):
            dx = x - cx
            dy = y - cy
            r2 = dx * dx + dy * dy
            pr[x - 1, y - 1] = np.float32(math.exp(-r2 / (2.0 * sigma * sigma)))
    crop = pr[r_ext:r_ext + patch_size, r_ext:r_ext + patch_size].copy()
    return (crop / crop.sum(dtype=np.float64)).astype(np.float32)


def hinge_oracle(pos: np.ndarray, neg: np.ndarray) -> float:
    """sum_i sum_j max(0, pos_i + 1 - neg_j) in float64."""
    d = pos[:, None] + 1.0 - neg[None, :]
    return float(np.sum(np.maximum(d, 0.0)))


def roc_oracle(dists: np.ndarray, labels: np.ndarray):
    """(fpr95, auc) with cv2.contourArea as the AUC oracle."""
    order = np.argsort(dists, kind="stable")
    lab = labels[order]
    tp = np.cumsum(lab == 1).astype(np.float64)
    fp = np.cumsum(lab == 0).astype(np.float64)
    tpr = tp / tp[-1]
    fpr = fp / fp[-1]
    fpr95 = fpr[np.argmax(tpr >= 0.95)]
    pts = np.concatenate(
        [np.stack([fpr, tpr], -1), np.array([[1.0, 0.0]])]
    ).astype(np.float32)
    auc = cv2.contourArea(pts.reshape(-1, 1, 2))
    return float(fpr95), float(auc)


def random_patches(rng: np.random.Generator, n: int,
                   patch_size: int = 64) -> np.ndarray:
    """Smooth-ish random uint8 test patches (pure noise has degenerate stats)."""
    base = rng.normal(size=(n, patch_size, patch_size))
    smooth = np.stack([cv2.GaussianBlur(b, (0, 0), 3.0) for b in base])
    smooth = smooth + 0.3 * rng.normal(size=smooth.shape)
    lo = smooth.min(axis=(1, 2), keepdims=True)
    hi = smooth.max(axis=(1, 2), keepdims=True)
    return ((smooth - lo) / (hi - lo + 1e-9) * 255).astype(np.uint8)
