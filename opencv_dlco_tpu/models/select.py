"""Model selection and statistics for learned PR / PJ models.

Re-design of the reference's misc library (reference: src/misc.cpp:78-169
SelectPRFilters, :171-264 ComputePRStats, :266-333 ComputePJStats):

- the O(n^2) scalar dedup/sort loops become np.unique(axis=0) (identical
  semantics: float-equality dedup + lexicographic row sort);
- the ROC sweeps run on-device via ops.roc;
- the "apply model" GEMMs (w * Dists^T and colsum((W Dists^T)^2)) run
  on the MXU, optionally sharded over a pairs axis (see parallel/).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.roc import roc_stats

_HIGHEST = jax.lax.Precision.HIGHEST


def select_pr_filters(filters: np.ndarray, w: np.ndarray,
                      n_symmetries: int = 8) -> np.ndarray:
    """Unique, lexicographically sorted filters selected by nonzero w.

    w has one weight per *ring*; each selected ring contributes its 8
    symmetric filters (minus all-zero rows), then duplicate rows collapse
    and rows sort ascending — MATLAB unique(...,'rows') semantics
    (reference: src/misc.cpp:78-169).

    Host-side (shapes are data-dependent); the result feeds the jitted
    distance ops.
    """
    w = np.asarray(w).reshape(-1)
    filters = np.asarray(filters)
    assert w.shape[0] * n_symmetries == filters.shape[0], (
        f"w rings {w.shape[0]} x {n_symmetries} != filters {filters.shape[0]}"
    )
    ring_sel = w > 0.0
    mask = np.repeat(ring_sel, n_symmetries)
    mask &= np.any(filters != 0.0, axis=1)
    chosen = filters[mask]
    return np.unique(chosen, axis=0)


def selected_pr_geometry(params: np.ndarray, w: np.ndarray,
                         n_symmetries: int = 8,
                         n_channels: int = 8) -> Tuple[int, int, int]:
    """(n_pr, dim, nz_dim) for a PR weight vector.

    Replicates the reference's counting *exactly*, including its
    dup_rows/2 convention (a row family with multiplicity m contributes m to
    dup_rows, so nPR = nzDim - dup_rows//2 — NOT the unique count;
    reference: src/misc.cpp:196-217).
    """
    w = np.asarray(w).reshape(-1)
    params = np.asarray(params)
    ring_sel = w > 0.0
    mask = np.repeat(ring_sel, n_symmetries)
    mask &= np.any(params != 0.0, axis=1)
    nz = params[mask]
    nz_dim = nz.shape[0]
    if nz_dim == 0:
        return 0, 0, 0
    _, inv, counts = np.unique(nz, axis=0, return_inverse=True,
                               return_counts=True)
    dup_rows = int(np.sum(counts[inv] >= 2))
    n_pr = nz_dim - dup_rows // 2
    dim = n_pr * n_channels
    return n_pr, dim, nz_dim


@jax.jit
def pr_model_distances(w: jax.Array, dists: jax.Array) -> jax.Array:
    """PatchDist = w . Dists^T (reference: src/misc.cpp:226)."""
    return jnp.matmul(dists, w.reshape(-1), precision=_HIGHEST)


@jax.jit
def pj_model_distances(w_proj: jax.Array, diffs: jax.Array) -> jax.Array:
    """PatchDist = colsum((W diffs^T)^2) (reference: src/misc.cpp:286-290).

    Zero rows of W contribute nothing, so the full square (static-shape) W
    gives identical distances to the reference's nonzero-row submatrix.
    """
    proj = jnp.matmul(diffs, w_proj.T, precision=_HIGHEST)
    return jnp.sum(proj * proj, axis=1)


def compute_pr_stats(params: np.ndarray, dists, labels, w,
                     n_channels: int = 8, max_dim: int = -1):
    """Full-dataset PR model stats (reference: src/misc.cpp:171-264).

    Returns dict(n_pr, dim, nz_dim, fpr95, auc); fpr95/auc are None when the
    model exceeds max_dim (the reference early-outs before the ROC sweep).
    """
    n_pr, dim, nz_dim = selected_pr_geometry(params, w, n_channels=n_channels)
    out = {"n_pr": n_pr, "dim": dim, "nz_dim": nz_dim,
           "fpr95": None, "auc": None}
    if max_dim != -1 and dim > max_dim:
        return out
    pd = pr_model_distances(jnp.asarray(w, jnp.float32), jnp.asarray(dists))
    fpr95, auc = roc_stats(pd, jnp.asarray(labels))
    out["fpr95"] = float(fpr95)
    out["auc"] = float(auc)
    return out


def compute_pj_stats(diffs, labels, w_proj):
    """Full-dataset PJ model stats (reference: src/misc.cpp:266-333).

    Returns dict(dim, fpr95, auc); dim counts nonzero rows of W.
    """
    w_np = np.asarray(w_proj)
    dim = int(np.sum(np.any(w_np != 0.0, axis=1)))
    pd = pj_model_distances(jnp.asarray(w_proj, jnp.float32), jnp.asarray(diffs))
    fpr95, auc = roc_stats(pd, jnp.asarray(labels))
    return {"dim": dim, "fpr95": float(fpr95), "auc": float(auc)}
