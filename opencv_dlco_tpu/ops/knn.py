"""Batched k-nearest-neighbour descriptor matching.

The matching front-end the learned VGG descriptors feed (BASELINE.json
HPatches / SfM configs; no reference analogue — the reference stops at
descriptor export). TPU design: the N x M distance matrix is produced in
column blocks on the MXU and immediately reduced to a running top-k, so
memory stays O(N * (k + block)) — the same blockwise-Gram pattern as the
hinge kernel (SURVEY.md §5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST


def pairwise_sq_dists(a: jax.Array, b: jax.Array,
                      precision=_HIGHEST) -> jax.Array:
    """(N, D), (M, D) -> (N, M) squared L2 distances (one MXU GEMM)."""
    na = jnp.sum(a * a, axis=1, keepdims=True)
    nb = jnp.sum(b * b, axis=1, keepdims=True)
    g = jnp.matmul(a, b.T, precision=precision)
    return jnp.maximum(na + nb.T - 2.0 * g, 0.0)


@functools.partial(jax.jit, static_argnames=("k", "block", "precision"))
def knn_match(query: jax.Array, train: jax.Array, k: int = 2,
              block: int = 4096,
              precision=jax.lax.Precision.DEFAULT):
    """Top-k nearest training descriptors per query, blockwise.

    Returns (dists (N, k) ascending, idx (N, k) int32). The full N x M
    matrix never exists: column blocks stream through a running-top-k merge.

    ``precision`` applies to the distance GEMM. The default (bf16
    multiplies, f32 accumulation on TPU) is match-set-identity-gated
    against HIGHEST (tests/test_knn_pallas.py): a ratio-test consumer
    tolerates bf16-grade distances exactly like the hinge gate in the PR
    solver (models/pr_rda.py). Pass Precision.HIGHEST for 6-pass-f32
    distances. For k=2 at scale, ops/knn_pallas.knn2_fused fuses the GEMM
    with the top-2 merge and is ~10x faster still.
    """
    n, d = query.shape
    m = train.shape[0]
    pad = (-m) % block
    if pad:
        train = jnp.concatenate(
            [train, jnp.full((pad, d), jnp.inf, train.dtype)])
    mb = train.shape[0] // block
    train_blocks = train.reshape(mb, block, d)
    nq = jnp.sum(query * query, axis=1, keepdims=True)

    def body(carry, inp):
        best_d, best_i = carry
        tb, off = inp
        ntb = jnp.where(jnp.isfinite(tb[:, :1]),
                        jnp.sum(tb * tb, axis=1, keepdims=True), jnp.inf)
        g = jnp.matmul(query, tb.T, precision=precision)
        dist = jnp.maximum(nq + ntb.T - 2.0 * g, 0.0)
        dist = jnp.where(jnp.isfinite(ntb.T), dist, jnp.inf)
        cand_d = jnp.concatenate([best_d, dist], axis=1)
        cand_i = jnp.concatenate(
            [best_i,
             jnp.broadcast_to(
                 jax.lax.broadcasted_iota(jnp.int32, (1, block), 1) + off,
                 (n, block))],
            axis=1)
        neg_top, arg = jax.lax.top_k(-cand_d, k)
        return (-neg_top, jnp.take_along_axis(cand_i, arg, axis=1)), None

    init = (jnp.full((n, k), jnp.inf, jnp.float32),
            jnp.full((n, k), -1, jnp.int32))
    offs = jnp.arange(mb, dtype=jnp.int32) * block
    (best_d, best_i), _ = jax.lax.scan(body, init, (train_blocks, offs))
    return best_d, best_i


@jax.jit
def ratio_test(dists: jax.Array, idx: jax.Array, ratio: float = 0.8):
    """Lowe ratio test on 2-NN results: (match_idx (N,), mask (N,))."""
    ok = dists[:, 0] < (ratio * ratio) * dists[:, 1]  # squared distances
    return jnp.where(ok, idx[:, 0], -1), ok


@functools.partial(jax.jit, static_argnames=("block",))
def mutual_nearest(query: jax.Array, train: jax.Array, block: int = 4096):
    """Mutual 1-NN cross-check: idx (N,) into train, -1 where not mutual."""
    d_qt, i_qt = knn_match(query, train, k=1, block=block)
    d_tq, i_tq = knn_match(train, query, k=1, block=block)
    back = i_tq[i_qt[:, 0], 0]
    ok = back == jnp.arange(query.shape[0], dtype=jnp.int32)
    return jnp.where(ok, i_qt[:, 0], -1), ok
