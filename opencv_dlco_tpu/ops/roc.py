"""ROC statistics: FPR@95% recall and area-under-curve.

Re-design of the reference's CPU ROC sweep (reference: src/misc.cpp:226-263,
:297-332): the rank loop becomes an argsort + two cumulative sums, and the
AUC — which the reference computes as cv::contourArea of the ROC polygon
closed with the point (1, 0) — becomes the shoelace formula over the same
polygon, so values agree with the reference's convention (not the plain
trapezoid rule).

Everything is jit-friendly (static shapes, no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def roc_curve(dists: jax.Array, labels: jax.Array):
    """Ascending-distance ROC.

    Args:
      dists: (N,) match scores; smaller = more similar.
      labels: (N,) {0, 1}; 1 = matching pair.

    Returns:
      (tpr, fpr): each (N,) float32, cumulative rates in rank order.
    """
    order = jnp.argsort(dists)
    lab = labels[order].astype(jnp.float32)
    tp = jnp.cumsum(lab)
    fp = jnp.cumsum(1.0 - lab)
    tpr = tp / tp[-1]
    fpr = fp / fp[-1]
    return tpr, fpr


def _fpr_at_recall(tpr: jax.Array, fpr: jax.Array, recall: float) -> jax.Array:
    """First FPR value where TPR >= recall (reference: src/misc.cpp:247-256)."""
    idx = jnp.argmax(tpr >= recall)
    return fpr[idx]


def _contour_area(xs: jax.Array, ys: jax.Array) -> jax.Array:
    """|shoelace|/2 of the closed polygon given by (xs, ys) vertices.

    Matches cv::contourArea semantics used by the reference (src/misc.cpp:263).
    Accumulated in float64-ish style via float32 cumsum; for N ~ 5e5 points the
    pairwise-summed jnp.sum keeps error ~1e-6.
    """
    x2 = jnp.roll(xs, -1)
    y2 = jnp.roll(ys, -1)
    cross = xs * y2 - x2 * ys
    return 0.5 * jnp.abs(jnp.sum(cross))


@jax.jit
def roc_stats(dists: jax.Array, labels: jax.Array):
    """Returns (fpr95, auc) for a scored pair set.

    AUC is the contour area of the polygon [(fpr_i, tpr_i)..., (1, 0)],
    exactly the reference's convention (src/misc.cpp:249-263).
    """
    tpr, fpr = roc_curve(dists, labels)
    fpr95 = _fpr_at_recall(tpr, fpr, 0.95)
    xs = jnp.concatenate([fpr, jnp.ones((1,), fpr.dtype)])
    ys = jnp.concatenate([tpr, jnp.zeros((1,), tpr.dtype)])
    auc = _contour_area(xs, ys)
    return fpr95, auc
