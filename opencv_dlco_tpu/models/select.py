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


@jax.jit
def _pr_split_distances(w, pos_trn, neg_trn, pos_val, neg_val):
    w = w.reshape(-1)
    return (jnp.matmul(pos_trn, w, precision=_HIGHEST),
            jnp.matmul(neg_trn, w, precision=_HIGHEST),
            jnp.matmul(pos_val, w, precision=_HIGHEST),
            jnp.matmul(neg_val, w, precision=_HIGHEST))


@jax.jit
def _split_roc(pos_d_trn, neg_d_trn, pos_d_val, neg_d_val):
    pd = jnp.concatenate([pos_d_trn, pos_d_val, neg_d_trn, neg_d_val])
    n_pos = pos_d_trn.shape[0] + pos_d_val.shape[0]
    labels = jnp.concatenate([
        jnp.ones((n_pos,), jnp.int32),
        jnp.zeros((pd.shape[0] - n_pos,), jnp.int32)])
    return roc_stats(pd, labels)


def compute_pr_stats_splits(params, splits, w, n_channels: int = 8,
                            max_dim: int = -1):
    """Full-dataset PR stats computed from the resident train/val splits.

    The full 500k x 5120 distance matrix is exactly the union of the four
    split arrays, and the ROC sweep is row-order invariant, so evaluating
    the splits in place gives the reference's full-dataset statistics
    (src/misc.cpp:171-264) with ZERO extra HBM — the full matrix never
    touches the device (it would not fit next to the training residency on
    a 16 GB v5e; cf. the reference keeping it host-side,
    src/pr-learn.cpp:194-225).

    ``splits`` maps {pos_trn, neg_trn, pos_val, neg_val} to device arrays.
    """
    n_pr, dim, nz_dim = selected_pr_geometry(params, w, n_channels=n_channels)
    out = {"n_pr": n_pr, "dim": dim, "nz_dim": nz_dim,
           "fpr95": None, "auc": None}
    if max_dim != -1 and dim > max_dim:
        return out
    ds = _pr_split_distances(jnp.asarray(w, jnp.float32),
                             splits["pos_trn"], splits["neg_trn"],
                             splits["pos_val"], splits["neg_val"])
    fpr95, auc = _split_roc(*ds)
    out["fpr95"] = float(fpr95)
    out["auc"] = float(auc)
    return out


@jax.jit
def _pj_split_distances(w_proj, pos_trn, neg_trn, pos_val, neg_val):
    return tuple(
        jnp.sum(jnp.square(jnp.matmul(d, w_proj.T, precision=_HIGHEST)),
                axis=1)
        for d in (pos_trn, neg_trn, pos_val, neg_val))


def compute_pj_stats_splits(splits, w_proj):
    """Full-dataset PJ stats from the resident splits (see PR variant)."""
    w_np = np.asarray(w_proj)
    dim = int(np.sum(np.any(w_np != 0.0, axis=1)))
    ds = _pj_split_distances(jnp.asarray(w_proj, jnp.float32),
                             splits["pos_trn"], splits["neg_trn"],
                             splits["pos_val"], splits["neg_val"])
    fpr95, auc = _split_roc(*ds)
    return {"dim": dim, "fpr95": float(fpr95), "auc": float(auc)}


@functools.partial(jax.jit, static_argnames=())
def _pr_rows_roc(dists, labels, w_rows):
    """(fpr95, auc) for a block of model rows in one GEMM + vmapped ROC.

    dists (N, F) resident once per dataset; w_rows (R, F). The reference
    re-runs a full GEMM + scalar ROC sweep per row (src/pr-stats.cpp:221);
    here R rows share one MXU GEMM and R argsorts run as one batched sort.
    """
    pd = jnp.matmul(dists, w_rows.T, precision=_HIGHEST)      # (N, R)
    return jax.vmap(roc_stats, in_axes=(1, None))(pd, labels)


def compute_pr_stats_rows(params, dists, labels, hist,
                          n_channels: int = 8, max_dim: int = -1,
                          row_block: int = 64):
    """Stats for every row of a model history (vmapped pr-stats inner loop).

    Returns a list of dicts in row order, same fields as compute_pr_stats.
    """
    hist = np.asarray(hist)
    out = []
    for row in range(hist.shape[0]):
        n_pr, dim, nz_dim = selected_pr_geometry(
            params, hist[row], n_channels=n_channels)
        out.append({"n_pr": n_pr, "dim": dim, "nz_dim": nz_dim,
                    "fpr95": None, "auc": None})
    eval_rows = [r for r, o in enumerate(out)
                 if max_dim == -1 or o["dim"] <= max_dim]
    for s in range(0, len(eval_rows), row_block):
        block = eval_rows[s:s + row_block]
        w_block = hist[block].astype(np.float32, copy=False)
        # pad each block to the next power of two (repeat the first row)
        # so a full-scale stats pass over hundreds of model files with
        # varying history lengths compiles _pr_rows_roc for at most
        # log2(row_block)+1 shapes per dataset instead of once per
        # distinct R (remote-TPU compiles are ~20-40 s each; padded
        # outputs are discarded, and the pad waste is bounded at 2x)
        n_real = len(block)
        padded = 1 << (n_real - 1).bit_length() if n_real > 1 else 1
        if n_real < padded:
            pad = np.broadcast_to(w_block[:1],
                                  (padded - n_real, w_block.shape[1]))
            w_block = np.concatenate([w_block, pad], axis=0)
        fpr95, auc = _pr_rows_roc(dists, labels, jnp.asarray(w_block))
        for j, r in enumerate(block):
            out[r]["fpr95"] = float(fpr95[j])
            out[r]["auc"] = float(auc[j])
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
