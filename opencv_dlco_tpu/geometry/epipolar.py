"""Two-view epipolar geometry: essential-matrix estimation, TPU-style RANSAC.

TPU design: RANSAC's data-dependent hypothesize-and-verify loop becomes a
*fully batched* program — all H hypotheses are sampled, solved (vmapped
8-point), and scored against all N correspondences at once (one (H, N)
Sampson-distance einsum), then an argmax picks the winner and a masked
least-squares refit polishes it. No python loops, no dynamic shapes, the
whole estimator is one jitted function (BASELINE.json config 4).

Points are in *normalized camera coordinates* (K^-1 applied) unless noted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .se3 import hat
from .triangulate import triangulate_points

_HIGHEST = jax.lax.Precision.HIGHEST


def normalize_points(x: jax.Array):
    """Hartley normalisation: (N, 2) -> (normalized (N, 2), T (3, 3))."""
    mean = jnp.mean(x, axis=0)
    d = jnp.sqrt(jnp.sum((x - mean) ** 2, axis=1))
    scale = jnp.sqrt(2.0) / (jnp.mean(d) + 1e-12)
    t = jnp.array([[1.0, 0.0, -mean[0]],
                   [0.0, 1.0, -mean[1]],
                   [0.0, 0.0, 1.0]]) * jnp.array([[scale], [scale], [1.0]])
    xn = (x - mean) * scale
    return xn, t


def _design_matrix(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """(N, 2) x2 -> (N, 9) rows [x2x1, x2y1, x2, y2x1, y2y1, y2, x1, y1, 1]
    for x2^T E x1 = 0."""
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], 1)
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], 1)
    return (x2h[:, :, None] * x1h[:, None, :]).reshape(-1, 9)


def essential_project(e: jax.Array) -> jax.Array:
    """Project onto the essential manifold: singular values -> (s, s, 0)."""
    u, s, vt = jnp.linalg.svd(e)
    sm = (s[..., 0] + s[..., 1]) * 0.5
    s_new = jnp.stack([sm, sm, jnp.zeros_like(sm)], -1)
    return jnp.sum(u[..., :, :, None] * (s_new[..., :, None] * vt)[..., None, :, :],
                   axis=-2)


def eight_point(x1: jax.Array, x2: jax.Array,
                weights: jax.Array | None = None) -> jax.Array:
    """(Weighted) 8-point algorithm on normalized coords -> E (3, 3).

    Solves min ||A e|| via the smallest eigenvector of A^T A (no dynamic
    shapes: weights mask inliers for the refit case).
    """
    a = _design_matrix(x1, x2)
    if weights is not None:
        a = a * weights[:, None]
    ata = jnp.matmul(a.T, a, precision=_HIGHEST)
    _, vecs = jnp.linalg.eigh(ata)
    e = vecs[:, 0].reshape(3, 3)
    return essential_project(e)


def sampson_distance(e: jax.Array, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """First-order geometric error of x2^T E x1 = 0: (..., N)."""
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], -1)
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[..., :1])], -1)
    # True-f32 scoring via explicit broadcast-multiply-sum: with einsum,
    # unspecified precision lowers these 3-wide contractions to one-pass
    # bf16 on the MXU and the ~0.4%-grade distance error flips RANSAC
    # inliers near the threshold (hardware-measured odometry degradation
    # vs the CPU oracle); requesting HIGHEST instead expands every tiny
    # contraction into 6-pass MXU programs (pathological compile times in
    # the vmapped hypothesis scorer). Elementwise ops run true-f32 on the
    # VPU — exact AND fast at contraction width 3.
    ex1 = jnp.sum(e[..., None, :, :] * x1h[..., None, :], -1)
    etx2 = jnp.sum(jnp.swapaxes(e, -1, -2)[..., None, :, :]
                   * x2h[..., None, :], -1)
    num = jnp.sum(x2h * ex1, -1) ** 2
    den = (ex1[..., 0] ** 2 + ex1[..., 1] ** 2
           + etx2[..., 0] ** 2 + etx2[..., 1] ** 2)
    return num / (den + 1e-12)


@functools.partial(jax.jit, static_argnames=("n_hypotheses", "sample_size"))
def ransac_essential(x1: jax.Array, x2: jax.Array, key: jax.Array,
                     *, n_hypotheses: int = 512, thresh: float = 1e-4,
                     sample_size: int = 8,
                     n_valid: jax.Array | None = None):
    """Batched RANSAC for E.

    Returns (E (3,3), inlier_mask (N,), n_inliers ()). thresh is a Sampson
    distance in normalized-coordinate units (~ (px / focal)^2 scale).

    ``n_valid`` (traced scalar) marks a valid prefix of the N rows: only
    rows < n_valid are sampled into hypotheses or counted as inliers. This
    is the static-shape contract that lets many variable-size match sets
    run as ONE vmapped program (pad each set to N, compact valid matches to
    the front) — the batched-SLAM front end depends on it.
    """
    n = x1.shape[0]
    if n_valid is None:
        valid = jnp.ones(n, bool)
        hi = n
    else:
        valid = jnp.arange(n) < n_valid
        hi = jnp.clip(n_valid, sample_size, n)
    idx = jax.random.randint(key, (n_hypotheses, sample_size), 0, hi)
    e_all = jax.vmap(lambda i: eight_point(x1[i], x2[i]))(idx)  # (H, 3, 3)
    d = sampson_distance(e_all, x1[None], x2[None])             # (H, N)
    inl = (d < thresh) & valid[None]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)
    best_mask = inl[best]
    # masked least-squares refit on all inliers of the winner
    e_refit = eight_point(x1, x2, weights=best_mask.astype(x1.dtype))
    d_refit = sampson_distance(e_refit, x1, x2)
    mask_refit = (d_refit < thresh) & valid
    # keep the refit only if it didn't lose inliers
    better = jnp.sum(mask_refit) >= jnp.sum(best_mask)
    e_final = jnp.where(better, e_refit, e_all[best])
    mask_final = jnp.where(better, mask_refit, best_mask)
    return e_final, mask_final, jnp.sum(mask_final)


def decompose_essential(e: jax.Array):
    """E -> 4 candidate (R, t) with ||t|| = 1 (Hartley-Zisserman)."""
    u, _, vt = jnp.linalg.svd(e)
    # enforce proper rotations
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    w = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    def mm3(a, b):   # 3x3 true-f32 product on the VPU
        return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)

    r1 = mm3(mm3(u, w), vt)
    r2 = mm3(mm3(u, w.T), vt)
    t = u[:, 2]
    rs = jnp.stack([r1, r1, r2, r2])
    ts = jnp.stack([t, -t, t, -t])
    return rs, ts


@jax.jit
def recover_pose(e: jax.Array, x1: jax.Array, x2: jax.Array,
                 mask: jax.Array | None = None):
    """Pick the (R, t) candidate with the most points in front of both
    cameras (cheirality), triangulating with each candidate.

    Returns (R, t, points3d (N, 3), n_good).
    """
    if mask is None:
        mask = jnp.ones(x1.shape[0], bool)
    rs, ts = decompose_essential(e)

    def score(r, t):
        pts = triangulate_points(r, t, x1, x2)
        z1 = pts[:, 2]
        z2 = jnp.sum(r[2] * pts, -1) + t[2]
        good = (z1 > 0) & (z2 > 0) & mask
        return jnp.sum(good), pts

    counts, pts_all = jax.vmap(score)(rs, ts)
    best = jnp.argmax(counts)
    return rs[best], ts[best], pts_all[best], counts[best]
