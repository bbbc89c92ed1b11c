"""Pooling-region learner: L1-regularised hinge-loss RDA, batched for TPU.

Re-design of the reference's stochastic solver (reference:
src/pr-learn.cpp:302-434). The reference serialises a 50M-iteration
per-sample RDA recursion behind `omp ordered` because it runs on CPU; the
regularised-dual-averaging update is a running *average* of hinge
subgradients, which commutes over a minibatch, so here each optimizer step
consumes a batch of B sampled (pos, neg) pairs:

    FeatDiff_b = D[pos_b] - D[neg_b]                 (gather, B x F)
    f_b        = FeatDiff_b . w                      (GEMV on MXU)
    g          = sum_{b : f_b > -1} FeatDiff_b       (masked matvec)
    dfAvg     <- (t * dfAvg + g) / (t + B)           (t counts samples)
    w         <- max(0, -sqrt(t + B) / gamma * (dfAvg + mu))

`t` counts *samples* so hyperparameters (mu, gamma) keep the reference's
meaning; n_iter=50M reference iterations == 50M samples here. Within a
batch every sample sees the start-of-batch w (the reference updates w after
every sample); this changes the trajectory, not the solution class — parity
is measured in FPR95/AUC, not bitwise (SURVEY.md §7 hard-part 3).

Everything carries a leading sweep axis S: a hyperparameter grid trains as
*one* jitted program where the per-sample work becomes (B,F)x(F,S) matmuls
shared across the whole grid — the reference's week-long 768-run bash sweep
(workspace/04-prlearn.sh) collapses into a single MXU-saturating loop (see
parallel/sweep.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.hinge import hinge_sum_sorted

_HIGHEST = jax.lax.Precision.HIGHEST


class PRState(NamedTuple):
    """Solver state; leading axis S = sweep entries."""

    w: jax.Array        # (S, F) current iterate (non-negative)
    df_avg: jax.Array   # (S, F) running subgradient average
    t: jax.Array        # ()     samples processed (int32, shared across sweep)


def pr_init(n_feat: int, n_sweep: int = 1) -> PRState:
    return PRState(
        w=jnp.zeros((n_sweep, n_feat), jnp.float32),
        df_avg=jnp.zeros((n_sweep, n_feat), jnp.float32),
        t=jnp.zeros((), jnp.int32),
    )


def _pr_step(pos_trn, neg_trn, mu, gamma, batch, sampling, state, key,
             precision=_HIGHEST):
    """One batched RDA step; mu/gamma are (S,) arrays.

    sampling="gather": i.i.d. row sampling with replacement (reference
    semantics). sampling="block": a random *contiguous* block of the
    pre-shuffled training rows — the rows were permuted uniformly at split
    time (pipeline/stages._load_split), so a random-offset block is a
    uniform sample without replacement; sequential HBM reads run ~2.5x
    faster than the random gather on TPU. sampling="block_fused": block
    mode through the fused Pallas kernel (ops/fused_rda.py) — subtract +
    both matmuls in one VMEM pass, 2 BF of HBM traffic instead of 5 BF
    (offsets are tile-granular); falls back to "block" when the sweep axis
    is too wide for VMEM residency.
    """
    kp, kn = jax.random.split(key)
    n_pos = pos_trn.shape[0]
    n_neg = neg_trn.shape[0]
    if sampling == "block_fused":
        sampling = "block"  # fused handling lives in pr_train_chunk
    # block mode needs at least one full block per side; tiny datasets
    # (shapes are static, so this resolves at trace time) fall back to gather
    if sampling == "block" and batch < min(n_pos, n_neg):
        ip0 = jax.random.randint(kp, (), 0, n_pos - batch + 1)
        in0 = jax.random.randint(kn, (), 0, n_neg - batch + 1)
        fd = (jax.lax.dynamic_slice(pos_trn, (ip0, 0),
                                    (batch, pos_trn.shape[1]))
              - jax.lax.dynamic_slice(neg_trn, (in0, 0),
                                      (batch, neg_trn.shape[1])))
    else:
        ip = jax.random.randint(kp, (batch,), 0, n_pos)
        ineg = jax.random.randint(kn, (batch,), 0, n_neg)
        fd = pos_trn[ip] - neg_trn[ineg]                  # (B, F)
    f = jnp.matmul(fd, state.w.T, precision=precision)    # (B, S)
    viol = (f > -1.0).astype(jnp.float32)
    g = jnp.matmul(viol.T, fd, precision=precision)       # (S, F)
    t_new = state.t + batch
    tf = state.t.astype(jnp.float32)
    tnf = t_new.astype(jnp.float32)
    df_avg = (tf * state.df_avg + g) / tnf
    w = jnp.maximum(
        0.0, -jnp.sqrt(tnf) / gamma[:, None] * (df_avg + mu[:, None])
    )
    return PRState(w=w, df_avg=df_avg, t=t_new)


@functools.partial(jax.jit, static_argnames=("batch", "n_steps", "sampling",
                                             "precision"))
def pr_train_chunk(pos_trn: jax.Array, neg_trn: jax.Array,
                   mu: jax.Array, gamma: jax.Array,
                   state: PRState, key: jax.Array,
                   *, batch: int, n_steps: int,
                   sampling: str = "gather",
                   precision=_HIGHEST) -> PRState:
    """Run n_steps batched RDA steps (n_steps * batch reference iterations).

    ``precision`` applies to the two step matmuls: HIGHEST (default) is
    true-f32 6-pass; DEFAULT runs them as bf16 multiplies with f32
    accumulation — the hinge gate (f > -1) tolerates ~1e-3 relative error
    in f by the same margin argument as the distance pipeline (end-metric
    gate measured at dFPR95 = 0; see tests/test_sweep.py precision study),
    and df_avg/w stay float32 throughout.
    """
    tile_b = 128
    s_axis = state.w.shape[0]
    f_dim = pos_trn.shape[1]
    if (sampling == "block_fused" and batch % tile_b == 0
            and batch < min(pos_trn.shape[0], neg_trn.shape[0])):
        if s_axis <= 8:
            # the whole chunk runs as ONE Pallas kernel: n_steps sampled
            # blocks stream through VMEM, the RDA update executes in-core
            # at each step's last tile, the iterate never round-trips HBM
            # (ops/fused_rda.fused_block_train)
            from ..ops.fused_rda import fused_block_train

            w, df_avg, t = fused_block_train(
                pos_trn, neg_trn, state.w, state.df_avg, state.t, mu,
                gamma, key, batch=batch, n_steps=n_steps, tile_b=tile_b,
                interpret=jax.default_backend() != "tpu")
            return PRState(w=w, df_avg=df_avg, t=t)
        # wide sweep axis: w + df resident in VMEM, g folded into df in
        # F-chunks — engage when the planned footprint fits
        # (ops/fused_rda.wide_kernel_vmem_bytes; the round-3 12 MB bound
        # silently excluded the Brown grid size and this path fell back
        # to XLA without saying so)
        from ..ops.fused_rda import (WIDE_KERNEL_VMEM_LIMIT,
                                     wide_kernel_vmem_bytes)

        if wide_kernel_vmem_bytes(
                s_axis, f_dim, tile_b,
                pos_trn.dtype.itemsize) <= WIDE_KERNEL_VMEM_LIMIT:
            from ..ops.fused_rda import fused_block_train_wide

            w, df_avg, t = fused_block_train_wide(
                pos_trn, neg_trn, state.w, state.df_avg, state.t, mu,
                gamma, key, batch=batch, n_steps=n_steps, tile_b=tile_b,
                interpret=jax.default_backend() != "tpu")
            return PRState(w=w, df_avg=df_avg, t=t)

    keys = jax.random.split(key, n_steps)

    def body(st, k):
        return _pr_step(pos_trn, neg_trn, mu, gamma, batch, sampling,
                        st, k, precision), None

    state, _ = jax.lax.scan(body, state, keys)
    return state


@jax.jit
def pr_validate(pos_val: jax.Array, neg_val: jax.Array,
                mu: jax.Array, state: PRState):
    """Validation objective per sweep entry.

    Matches reference: src/pr-learn.cpp:340-365 — all-pairs hinge on the
    held-out split (via the sorted O(N log N) kernel, see ops/hinge.py),
    normalised by |P||N|, plus the L1 regulariser.

    Returns (loss_val, regul, obj, nnz), each (S,).
    """
    pd = jnp.matmul(pos_val, state.w.T, precision=_HIGHEST)  # (Np, S)
    nd = jnp.matmul(neg_val, state.w.T, precision=_HIGHEST)  # (Nn, S)
    loss = jax.vmap(hinge_sum_sorted, in_axes=1)(pd, nd)     # (S,)
    denom = jnp.float32(pos_val.shape[0]) * jnp.float32(neg_val.shape[0])
    loss_val = loss / denom
    regul = mu * jnp.sum(jnp.abs(state.w), axis=1)
    nnz = jnp.sum(state.w > 0.0, axis=1)
    return loss_val, regul, loss_val + regul, nnz


def pr_train(pos_trn, neg_trn, pos_val, neg_val, cfg, *,
             key=None, on_log=None):
    """Host driver for a single (mu, gamma) run; returns (best_w, history).

    ``on_log(t, metrics, state)`` fires every cfg.log_step samples —
    the hook used by pipeline/prlearn for stats + checkpoint appends.
    Sweeps should use parallel/sweep.py instead.
    """
    import numpy as np

    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    n_feat = pos_trn.shape[1]
    state = pr_init(n_feat, 1)
    mu = jnp.asarray([cfg.mu], jnp.float32)
    gamma = jnp.asarray([cfg.gamma], jnp.float32)

    steps_per_log = max(1, cfg.log_step // cfg.batch)
    n_logs = max(1, cfg.n_iter // (steps_per_log * cfg.batch))

    obj_best = np.inf
    w_best = np.zeros((n_feat,), np.float32)
    history = []
    for li in range(n_logs):
        key, sub = jax.random.split(key)
        state = pr_train_chunk(pos_trn, neg_trn, mu, gamma, state, sub,
                               batch=cfg.batch, n_steps=steps_per_log)
        loss_val, regul, obj, nnz = pr_validate(pos_val, neg_val, mu, state)
        obj0 = float(obj[0])
        rec = {
            "t": int(state.t),
            "loss": float(loss_val[0]),
            "regul": float(regul[0]),
            "obj": obj0,
            "nnz": int(nnz[0]),
            "best": obj0 < obj_best,
        }
        if obj0 < obj_best:
            obj_best = obj0
            w_best = np.asarray(state.w[0])
        rec["obj_best"] = obj_best
        history.append(rec)
        if on_log is not None:
            on_log(rec, state)
    return w_best, history
