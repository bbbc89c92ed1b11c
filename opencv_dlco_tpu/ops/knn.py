"""Batched k-nearest-neighbour descriptor matching.

The matching front-end the learned VGG descriptors feed (BASELINE.json
HPatches / SfM configs; no reference analogue — the reference stops at
descriptor export). TPU design: the N x M distance matrix is produced in
column blocks on the MXU and immediately reduced to a running top-k, so
memory stays O(N * (k + block)) — the same blockwise-Gram pattern as the
hinge kernel (SURVEY.md §5).

``knn_match`` is a dispatcher (VERDICT r3 next #3): on a TPU backend with
concrete inputs it routes to the fused Pallas kernels
(ops/knn_pallas.py — GEMM + running top-k in one pass, no materialised
distance matrix, ~7-10x faster at 65k x 65k), exactly as
Workspace.compdist auto-selects the fused stage-3 kernel. Under a trace
(jit/vmap callers like pipeline/slam._match_pose_chunk, which wants
HIGHEST-precision tiny matmuls) or on CPU it takes the XLA scan path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST

#: auto-dispatch to the fused Pallas kernel only above this candidate-pair
#: count — below it program dispatch dominates either way and the XLA path
#: avoids a second compiled program per shape.
FUSED_MIN_PAIRS = 1 << 16


def pairwise_sq_dists(a: jax.Array, b: jax.Array,
                      precision=_HIGHEST) -> jax.Array:
    """(N, D), (M, D) -> (N, M) squared L2 distances (one MXU GEMM)."""
    na = jnp.sum(a * a, axis=1, keepdims=True)
    nb = jnp.sum(b * b, axis=1, keepdims=True)
    g = jnp.matmul(a, b.T, precision=precision)
    return jnp.maximum(na + nb.T - 2.0 * g, 0.0)


@functools.partial(jax.jit, static_argnames=("k", "block", "precision"))
def _knn_match_xla(query: jax.Array, train: jax.Array, k: int = 2,
                   block: int = 4096,
                   precision=jax.lax.Precision.DEFAULT):
    """XLA scan path: column blocks stream through a running-top-k merge.

    The full N x M matrix never exists: each (N, block) tile is folded
    into the running top-k with lax.top_k over (N, k + block) candidates.
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


def _fused_eligible(query, train, k: int) -> bool:
    """Auto-dispatch gate: concrete inputs, a compiled-Pallas backend,
    a supported k, and a problem large enough to beat dispatch overhead."""
    if os.environ.get("DLCO_DISABLE_FUSED_KNN"):
        return False
    if isinstance(query, jax.core.Tracer) or isinstance(train, jax.core.Tracer):
        return False            # jit/vmap callers keep their XLA semantics
    if jax.default_backend() != "tpu":
        return False            # pltpu Mosaic kernels: no gpu/cpu lowering
    if not 1 <= k <= 16:
        return False
    if query.ndim != 2 or train.ndim != 2:
        return False
    return query.shape[0] * train.shape[0] >= FUSED_MIN_PAIRS


def knn_match(query: jax.Array, train: jax.Array, k: int = 2,
              block: int = 4096,
              precision=jax.lax.Precision.DEFAULT,
              fused: "bool | str" = "auto"):
    """Top-k nearest training descriptors per query.

    Returns (dists (N, k) ascending, idx (N, k) int32; idx -1 / dist inf
    where fewer than k real neighbours exist).

    ``precision`` applies to the distance GEMM. The default (bf16
    multiplies, f32 accumulation on TPU) is match-set-identity-gated
    against HIGHEST (tests/test_knn_pallas.py): a ratio-test consumer
    tolerates bf16-grade distances exactly like the hinge gate in the PR
    solver (models/pr_rda.py). Pass Precision.HIGHEST for 6-pass-f32
    distances — the fused kernel honours it (bf16=False is
    HIGHEST-exact on hardware, tests/test_tpu_smoke.py).

    ``fused``: "auto" (default) dispatches to the Pallas kernels when
    profitable; True forces them (interpret-mode on CPU, for tests);
    False forces the XLA path.
    """
    use_fused = fused if isinstance(fused, bool) else _fused_eligible(
        query, train, k)
    if use_fused:
        from .knn_pallas import knn2_fused, knnk_fused

        interpret = jax.default_backend() == "cpu"
        bf16 = precision is not _HIGHEST
        if k <= 2:
            d2, i2 = knn2_fused(query, train, interpret=interpret, bf16=bf16)
            return d2[:, :k], i2[:, :k]
        return knnk_fused(query, train, k, interpret=interpret, bf16=bf16)
    return _knn_match_xla(query, train, k=k, block=block, precision=precision)


@jax.jit
def ratio_test(dists: jax.Array, idx: jax.Array, ratio: float = 0.8):
    """Lowe ratio test on 2-NN results: (match_idx (N,), mask (N,))."""
    ok = dists[:, 0] < (ratio * ratio) * dists[:, 1]  # squared distances
    return jnp.where(ok, idx[:, 0], -1), ok


def mutual_nearest(query: jax.Array, train: jax.Array, block: int = 4096,
                   fused: "bool | str" = "auto"):
    """Mutual 1-NN cross-check: idx (N,) into train, -1 where not mutual.

    Both directions go through knn_match's dispatcher, so on TPU this is
    two fused Pallas passes (the r3 bench's 0.245 s XLA mutual at
    65k x 65k drops ~10x; bench_matching's mutual_time_d64 gate)."""
    d_qt, i_qt = knn_match(query, train, k=1, block=block, fused=fused)
    d_tq, i_tq = knn_match(train, query, k=1, block=block, fused=fused)
    return _mutual_back_check(i_qt, i_tq, query.shape[0])


@functools.partial(jax.jit, static_argnames=("n",))
def _mutual_back_check(i_qt: jax.Array, i_tq: jax.Array, n: int):
    back = i_tq[jnp.maximum(i_qt[:, 0], 0), 0]
    ok = (back == jnp.arange(n, dtype=jnp.int32)) & (i_qt[:, 0] >= 0)
    return jnp.where(ok, i_qt[:, 0], -1), ok
