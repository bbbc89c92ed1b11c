"""Pooled descriptors and per-ring pair distances (the stage-3 hot path).

Re-design of comp-fulldists / comp-uprjdists (reference:
src/comp-fulldists.cpp:294-356, src/comp-uprjdists.cpp:298-349). The
reference processes one pair per OpenMP thread with its own CUDA stream and
a skinny (40960x4096)@(4096x8) GEMM; here a whole *block* of pairs becomes a
single wide matmul that keeps the MXU full:

    F (n_filters, n_pixels)  @  PT (n_pixels, 2B * n_bins)

followed by fused truncation / squared-difference / two-stage ring reduction
(XLA fuses the epilogue into the matmul consumer). The 500k x 5120 distance
matrix is produced tile-by-tile and streamed to the artifact store — it is
never resident on device.

Layout parity notes:
- filters and patch features share the [x-major] pixel flattening
  (see ops/patch_transform.py, ops/pool_regions.py);
- the ring distance reduces over n_bins channels then over the 8 symmetric
  offsets of a ring (reference: src/comp-fulldists.cpp:340-342);
- the unprojected "distance" is the *signed difference vector* Desc1 - Desc2
  flattened (n_sel, n_bins) row-major (reference: src/comp-uprjdists.cpp:320-330).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST


@functools.partial(jax.jit, static_argnames=("precision",))
def pooled_descriptors(filters: jax.Array, patch_trans: jax.Array,
                       precision=_HIGHEST) -> jax.Array:
    """min(F @ PT, 1): (n_filters, n_pixels) x (B, n_pixels, n_bins) -> (B, n_filters, n_bins).

    reference: src/comp-fulldists.cpp:328-333 (GEMM + trunc-at-1).
    """
    d = jnp.einsum("fk,bkc->bfc", filters, patch_trans, precision=precision)
    return jnp.minimum(d, 1.0)


@functools.partial(jax.jit, static_argnames=("n_symmetries", "precision"))
def ring_distances(filters: jax.Array, pt1: jax.Array, pt2: jax.Array,
                   n_symmetries: int = 8, precision=_HIGHEST) -> jax.Array:
    """Per-ring squared L2 distances for a block of pairs.

    Args:
      filters: (n_filters, n_pixels) pooling bank; n_filters = n_rings * n_symmetries,
        ring-major (8 consecutive rows per ring).
      pt1, pt2: (B, n_pixels, n_bins) patch feature stacks of each pair side.

    Returns:
      (B, n_rings) float32: sum over bins and symmetric offsets of
      (trunc(F@PT2) - trunc(F@PT1))^2  (reference: src/comp-fulldists.cpp:336-342).
    """
    d1 = pooled_descriptors(filters, pt1, precision=precision)
    d2 = pooled_descriptors(filters, pt2, precision=precision)
    sq = (d2 - d1) ** 2
    b, f, c = sq.shape
    per_filter = jnp.sum(sq, axis=2)  # (B, n_filters)
    return jnp.sum(
        per_filter.reshape(b, f // n_symmetries, n_symmetries), axis=2
    )


@functools.partial(jax.jit, static_argnames=("precision",))
def unprojected_diffs(sel_filters: jax.Array, pt1: jax.Array, pt2: jax.Array,
                      precision=_HIGHEST) -> jax.Array:
    """Signed truncated-descriptor difference vectors for the PJ stage.

    Args:
      sel_filters: (n_sel, n_pixels) deduplicated selected filters.
      pt1, pt2: (B, n_pixels, n_bins).

    Returns:
      (B, n_sel * n_bins) float32 rows of (Desc1 - Desc2) flattened row-major
      (reference: src/comp-uprjdists.cpp:320-330).
    """
    d1 = pooled_descriptors(sel_filters, pt1, precision=precision)
    d2 = pooled_descriptors(sel_filters, pt2, precision=precision)
    diff = d1 - d2
    b = diff.shape[0]
    return diff.reshape(b, -1)
