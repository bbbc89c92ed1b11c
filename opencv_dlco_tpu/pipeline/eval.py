"""Descriptor evaluation protocols (HPatches-style).

Three standard tasks over learned descriptors (BASELINE.json config 3; the
reference only evaluates verification, via FPR95/AUC on labelled pairs —
src/misc.cpp:171-264):

- verification: FPR95/AUC over labelled descriptor pairs (ops/roc.py);
- matching: mean average precision of nearest-neighbour matching between
  two views with known ground-truth correspondence;
- retrieval: mAP of ranking a gallery by distance to each query, multiple
  positives per query.

All batched jitted math; inputs are plain descriptor arrays so the
protocols apply to any descriptor (ours, reference-published, SIFT
baselines loaded from elsewhere).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import knn_match, pairwise_sq_dists
from ..ops.roc import roc_stats


def verification(desc_a, desc_b, labels) -> Dict[str, float]:
    """Labelled pairs (N, D) x2 + {0,1} (N,) -> FPR95 / AUC."""
    d = jnp.sum((jnp.asarray(desc_a) - jnp.asarray(desc_b)) ** 2, axis=1)
    fpr95, auc = roc_stats(d, jnp.asarray(labels))
    return {"fpr95": float(fpr95), "auc": float(auc)}


def matching_map(query, train, gt_idx, k: int = 10) -> Dict[str, float]:
    """Matching mAP: for each query, gt_idx gives its true partner in train
    (-1 = no partner). AP per query = 1/rank of the true partner within the
    top-k candidates (0 if absent); mAP averages over valid queries.
    Also reports precision@1.
    """
    query = jnp.asarray(query)
    train = jnp.asarray(train)
    gt = jnp.asarray(gt_idx)
    _, idx = knn_match(query, train, k=k, block=min(4096, train.shape[0]))
    hits = idx == gt[:, None]                       # (N, k)
    rank = jnp.argmax(hits, axis=1)                 # first hit position
    found = jnp.any(hits, axis=1)
    ap = jnp.where(found, 1.0 / (rank + 1.0), 0.0)
    valid = gt >= 0
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    m_ap = jnp.sum(jnp.where(valid, ap, 0.0)) / n_valid
    p_at_1 = jnp.sum(jnp.where(valid, hits[:, 0], False)) / n_valid
    return {"map": float(m_ap), "precision_at_1": float(p_at_1),
            "n_queries": int(jnp.sum(valid))}


def retrieval_map(query, gallery, query_labels, gallery_labels) -> Dict[str, float]:
    """Retrieval mAP: rank the gallery per query; positives share the
    query's label. Standard interpolated AP over the full ranking."""
    query = jnp.asarray(query)
    gallery = jnp.asarray(gallery)
    ql = jnp.asarray(query_labels)
    gl = jnp.asarray(gallery_labels)
    d = pairwise_sq_dists(query, gallery)           # (Q, G)
    order = jnp.argsort(d, axis=1)
    rel = (gl[order] == ql[:, None]).astype(jnp.float32)  # (Q, G) ranked
    cum = jnp.cumsum(rel, axis=1)
    ranks = jnp.arange(1, rel.shape[1] + 1, dtype=jnp.float32)
    precision = cum / ranks[None, :]
    n_pos = jnp.maximum(jnp.sum(rel, axis=1), 1.0)
    ap = jnp.sum(precision * rel, axis=1) / n_pos
    return {"map": float(jnp.mean(ap)), "n_queries": int(query.shape[0])}


def evaluate_descriptor(model, patch_pairs, labels) -> Dict[str, float]:
    """Convenience: run verification on uint8 patch pairs with a
    VGGDescriptor-like model (has .describe)."""
    p1, p2 = patch_pairs
    d1 = np.asarray(model.describe(p1))
    d2 = np.asarray(model.describe(p2))
    return verification(d1, d2, labels)
