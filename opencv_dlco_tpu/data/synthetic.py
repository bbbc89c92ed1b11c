"""Synthetic datasets: planted-structure solver inputs + warped patch pairs.

The mounted reference ships only learned models (no Brown raw data), so
tests and benchmarks exercise the full pipeline on synthetic data:

- ``synth_pr_dataset`` / ``synth_pj_dataset``: distance / difference
  matrices with a planted informative structure the convex solvers must
  recover (quality measured by FPR95/AUC, the reference's own oracle).
- ``synth_patch_pairs``: uint8 patch pairs where positives are warped +
  noised copies — drives the full stage-1..3 descriptor/distance path.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def synth_pr_dataset(rng: np.random.Generator, *, n_pos=2000, n_neg=2000,
                     n_feat=256, n_informative=16, sep=1.5):
    """Ring-distance-like matrices (pos, neg, informative_idx)."""
    info = rng.choice(n_feat, size=n_informative, replace=False)
    pos = np.abs(rng.normal(1.0, 0.5, size=(n_pos, n_feat))).astype(np.float32)
    neg = np.abs(rng.normal(1.0, 0.5, size=(n_neg, n_feat))).astype(np.float32)
    pos[:, info] = np.abs(rng.normal(0.3, 0.15, size=(n_pos, n_informative)))
    neg[:, info] = np.abs(rng.normal(0.3 + sep, 0.5, size=(n_neg, n_informative)))
    return pos.astype(np.float32), neg.astype(np.float32), info


def synth_pj_dataset(rng: np.random.Generator, *, n_pos=1500, n_neg=1500,
                     n_feat=64, n_subspace=8, sep=2.0):
    """Signed descriptor-difference vectors (pos, neg, subspace_basis)."""
    basis = np.linalg.qr(rng.normal(size=(n_feat, n_feat)))[0]
    sub = basis[:, :n_subspace]
    pos = rng.normal(0.0, 0.3, size=(n_pos, n_feat))
    neg = rng.normal(0.0, 0.3, size=(n_neg, n_feat))
    neg += rng.normal(0.0, sep, size=(n_neg, n_subspace)) @ sub.T
    return pos.astype(np.float32), neg.astype(np.float32), sub


def _smooth(rng: np.random.Generator, n: int, size: int) -> np.ndarray:
    """Band-limited random images in [0, 1] (pure white noise has degenerate
    gradient statistics)."""
    freq = rng.normal(size=(n, size, size)) + 1j * rng.normal(size=(n, size, size))
    fy = np.fft.fftfreq(size)[None, :, None]
    fx = np.fft.fftfreq(size)[None, None, :]
    mask = np.exp(-((fx ** 2 + fy ** 2) * (size / 4.0) ** 2))
    img = np.fft.ifft2(freq * mask).real
    lo = img.min(axis=(1, 2), keepdims=True)
    hi = img.max(axis=(1, 2), keepdims=True)
    return (img - lo) / (hi - lo + 1e-9)


def render_blob_sequence(rng: np.random.Generator, n_frames: int = 48,
                         *, size: int = 256, f: float = 300.0,
                         n_blobs: int = 240, radius: float = 1.5,
                         closed_loop: bool = True
                         ) -> Tuple[list, np.ndarray, Tuple[float, float, float, float]]:
    """Rendered monocular sequence over a 3D Gaussian-blob field.

    Camera follows a circle in the x-y plane (closing the loop when
    ``closed_loop``), looking down +z — the SLAM benchmark scene (loop
    closures are detectable, not injected). Vectorised splatting (one
    (H*W, B) exp per frame) so rendering never dominates a benchmark run.

    Returns (frames [uint8 (size, size)], gt camera centers (F, 3),
    intrinsics (fx, fy, cx, cy)).
    """
    c = size / 2.0
    pts3d = np.stack([
        rng.uniform(-4, 4, n_blobs), rng.uniform(-4, 4, n_blobs),
        rng.uniform(5, 12, n_blobs)
    ], 1)
    amps = (rng.uniform(0.4, 1.0, n_blobs)
            * rng.choice([-1, 1], n_blobs)).astype(np.float32)
    sigmas = rng.uniform(2.0, 4.0, n_blobs).astype(np.float32)
    inv2s2 = (1.0 / (2.0 * sigmas ** 2)).astype(np.float32)
    yy, xx = np.mgrid[:size, :size].astype(np.float32)
    span = 2 * np.pi if closed_loop else np.pi
    frames, centers = [], []
    for i in range(n_frames):
        th = span * i / n_frames
        center = np.array([radius * (np.cos(th) - 1.0),
                           radius * np.sin(th), 0.0])
        yaw = 0.03 * np.sin(th)
        cy_, sy = np.cos(yaw), np.sin(yaw)
        r_wc = np.array([[cy_, 0, sy], [0, 1, 0], [-sy, 0, cy_]])
        r = r_wc.T                      # world -> cam
        t = -r @ center
        p = pts3d @ r.T + t
        u = (f * p[:, 0] / p[:, 2] + c).astype(np.float32)
        v = (f * p[:, 1] / p[:, 2] + c).astype(np.float32)
        vis = ((u > -10) & (u < size + 10) & (v > -10) & (v < size + 10)
               & (p[:, 2] > 0.1))
        d2 = ((yy[:, :, None] - v[vis]) ** 2
              + (xx[:, :, None] - u[vis]) ** 2)
        img = np.einsum("hwb,b->hw", np.exp(-d2 * inv2s2[vis]), amps[vis])
        img = (img - img.min()) / (img.max() - img.min() + 1e-12)
        frames.append((img * 255).astype(np.uint8))
        centers.append(center)
    return frames, np.stack(centers), (f, f, c, c)


def synth_patch_pairs(rng: np.random.Generator, n_pairs: int = 256,
                      patch_size: int = 64, pos_frac: float = 0.5,
                      noise: float = 0.06, shift: int = 2
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (patches1, patches2, labels): uint8 (N, P, P) x2 + {0,1} (N,).

    Positives are shifted/noised copies of the same base texture; negatives
    are independent textures.
    """
    n_pos = int(n_pairs * pos_frac)
    base = _smooth(rng, n_pairs + (n_pairs - n_pos), patch_size + 2 * shift)
    p1 = np.empty((n_pairs, patch_size, patch_size))
    p2 = np.empty((n_pairs, patch_size, patch_size))
    labels = np.zeros(n_pairs, dtype=np.uint8)
    c = shift
    for i in range(n_pairs):
        a = base[i]
        p1[i] = a[c:c + patch_size, c:c + patch_size]
        if i < n_pos:
            dy, dx = rng.integers(-shift, shift + 1, size=2)
            p2[i] = a[c + dy:c + dy + patch_size, c + dx:c + dx + patch_size]
            labels[i] = 1
        else:
            b = base[n_pairs + (i - n_pos)]
            p2[i] = b[c:c + patch_size, c:c + patch_size]
    p1 += rng.normal(0, noise, p1.shape)
    p2 += rng.normal(0, noise, p2.shape)
    to_u8 = lambda x: (np.clip(x, 0, 1) * 255).astype(np.uint8)
    return to_u8(p1), to_u8(p2), labels
