"""Sharded compute paths: pjit/GSPMD for the data plane, shard_map + explicit
collectives for the optimizer steps.

Design (SURVEY.md §5 "long-context" analogue): the 500k x 5120 pair/ring
matrices are laid out P(dp, mp) — pair rows over the ``dp`` axis, ring/feature
columns over ``mp``. The solvers keep their iterates sharded over ``mp`` and
replicated over ``dp``; each step does

    f   = psum_mp(local_partial_dots)     (contraction over sharded features)
    g   = psum_dp(local_subgradients)     (reduction over sharded samples)

which reproduces the single-device RDA recursion exactly (batch per step =
per-device batch x dp). The distance precompute needs no collectives at all —
GSPMD partitions the einsum along both axes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.pr_rda import PRState
from ..models.pj_rda import PJState, _eigh_exact
from .mesh import data_axis, model_axis

_HIGHEST = jax.lax.Precision.HIGHEST


def distance_sharding(mesh: Mesh) -> NamedSharding:
    """Rows (pairs) over dp, columns (rings/features) over mp."""
    return NamedSharding(mesh, P(data_axis, model_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_distance_matrix(arr, mesh: Mesh):
    return jax.device_put(arr, distance_sharding(mesh))


# -- stage 3: distance precompute under GSPMD ----------------------------

def ring_distances_sharded(mesh: Mesh, filters, pt1, pt2,
                           n_symmetries: int = 8):
    """ring_distances with filters row-sharded over mp and pairs over dp.

    Fully communication-free: the (B, n_pixels) @ (n_pixels, F) contraction
    keeps pairs on dp and filter rows on mp; the ring reduction stays within
    an mp shard because shards are whole multiples of the 8-fold symmetry
    group (enforced below).
    """
    from ..ops.pair_distance import ring_distances

    n_rings = filters.shape[0] // n_symmetries
    mp = mesh.shape[model_axis]
    if n_rings % mp:
        raise ValueError(f"rings {n_rings} not divisible by mp={mp}")
    f_sh = jax.device_put(filters, NamedSharding(mesh, P(model_axis, None)))
    pt_sh = NamedSharding(mesh, P(data_axis, None, None))
    pt1 = jax.device_put(pt1, pt_sh)
    pt2 = jax.device_put(pt2, pt_sh)
    fn = jax.jit(
        lambda f, a, b: ring_distances(f, a, b, n_symmetries),
        out_shardings=distance_sharding(mesh),
    )
    return fn(f_sh, pt1, pt2)


# -- stage 5: sharded model-selection stats pass -------------------------

def pr_stats_sharded(mesh: Mesh, dists, labels, w_rows):
    """Cross-dataset stats (FPR95/AUC per model row) over the SHARDED
    distance matrix — the pr-stats pass (src/pr-stats.cpp:196-252) as a
    distributed program: the (N, F) x (F, R) scoring GEMM runs sharded
    (pairs over dp, features over mp, one psum over mp), then per-pair
    scores are all-gathered over dp and every shard runs the identical
    batched ROC sweep (a global sort cannot stay sharded; the gather is
    N x R floats, tiny next to the resident matrix).

    dists: (N, F) P(dp, mp); labels: (N,) P(dp); w_rows: (R, F)
    replicated. Returns (fpr95 (R,), auc (R,)) replicated.
    """
    from ..ops.roc import roc_stats

    def stats(d_l, lab_l, w_l):
        pd = jax.lax.psum(
            jnp.matmul(d_l, w_l.T, precision=_HIGHEST), model_axis
        )  # (N/dp, R)
        pd_full = jax.lax.all_gather(pd, data_axis, axis=0, tiled=True)
        lab_full = jax.lax.all_gather(lab_l, data_axis, axis=0, tiled=True)
        fpr95, auc = jax.vmap(roc_stats, in_axes=(1, None))(pd_full,
                                                            lab_full)
        return fpr95, auc

    return shard_map(
        stats, mesh=mesh,
        in_specs=(P(data_axis, model_axis), P(data_axis),
                  P(None, model_axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )(dists, labels, w_rows)


# -- stage 4: sharded PR RDA ---------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("mesh", "batch_per_device", "n_steps"))
def pr_train_chunk_sharded(mesh: Mesh, pos_trn, neg_trn, mu, gamma,
                           state: PRState, key,
                           *, batch_per_device: int, n_steps: int) -> PRState:
    """Sharded equivalent of pr_train_chunk.

    pos_trn/neg_trn are P(dp, mp); state.w/df_avg are P(None, mp); the
    effective RDA batch per step is batch_per_device * dp.
    """
    n_dp = mesh.shape[data_axis]

    def chunk(pos_l, neg_l, mu_l, gamma_l, w0, df0, t0, key_l):
        dp_idx = jax.lax.axis_index(data_axis)

        def step(carry, k):
            w, df, t = carry
            k = jax.random.fold_in(k, dp_idx)
            kp, kn = jax.random.split(k)
            ip = jax.random.randint(kp, (batch_per_device,), 0,
                                    pos_l.shape[0])
            ineg = jax.random.randint(kn, (batch_per_device,), 0,
                                      neg_l.shape[0])
            fd = pos_l[ip] - neg_l[ineg]                      # (B, F/mp)
            f_part = jnp.matmul(fd, w.T, precision=_HIGHEST)  # (B, S)
            f = jax.lax.psum(f_part, model_axis)
            viol = (f > -1.0).astype(jnp.float32)
            g = jnp.matmul(viol.T, fd, precision=_HIGHEST)    # (S, F/mp)
            g = jax.lax.psum(g, data_axis)
            t_new = t + batch_per_device * n_dp
            tf = t.astype(jnp.float32)
            tnf = t_new.astype(jnp.float32)
            df = (tf * df + g) / tnf
            w = jnp.maximum(
                0.0,
                -jnp.sqrt(tnf) / gamma_l[:, None] * (df + mu_l[:, None]),
            )
            return (w, df, t_new), None

        keys = jax.random.split(key_l, n_steps)
        (w, df, t), _ = jax.lax.scan(step, (w0, df0, t0), keys)
        return w, df, t

    w, df, t = shard_map(
        chunk, mesh=mesh,
        in_specs=(
            P(data_axis, model_axis), P(data_axis, model_axis),
            P(), P(),
            P(None, model_axis), P(None, model_axis), P(), P(),
        ),
        out_specs=(P(None, model_axis), P(None, model_axis), P()),
        check_vma=False,
    )(pos_trn, neg_trn, mu, gamma, state.w, state.df_avg, state.t, key)
    return PRState(w=w, df_avg=df, t=t)


@functools.partial(jax.jit, static_argnames=("mesh",))
def pr_validate_sharded(mesh: Mesh, pos_val, neg_val, mu, state: PRState):
    """Sharded validation: all-pairs hinge with negatives all-gathered over
    dp, positives kept local (the sharded-Gram pattern of SURVEY.md §5)."""

    def val(pos_l, neg_l, mu_l, w_l):
        pd = jax.lax.psum(
            jnp.matmul(pos_l, w_l.T, precision=_HIGHEST), model_axis
        )  # (Np/dp, S)
        nd = jax.lax.psum(
            jnp.matmul(neg_l, w_l.T, precision=_HIGHEST), model_axis
        )
        nd_full = jax.lax.all_gather(nd, data_axis, axis=0,
                                     tiled=True)       # (Nn, S)

        def one(p_col, n_col):
            ns = jnp.sort(n_col)
            prefix = jnp.concatenate(
                [jnp.zeros((1,), jnp.float32), jnp.cumsum(ns)])
            th = p_col + 1.0
            k = jnp.searchsorted(ns, th, side="left")
            return jnp.sum(th * k.astype(jnp.float32) - prefix[k])

        loss_part = jax.vmap(one, in_axes=(1, 1))(pd, nd_full)  # (S,)
        loss = jax.lax.psum(loss_part, data_axis)
        regul = mu_l * jax.lax.psum(
            jnp.sum(jnp.abs(w_l), axis=1), model_axis)
        nnz = jax.lax.psum(jnp.sum(w_l > 0.0, axis=1), model_axis)
        return loss, regul, nnz

    loss, regul, nnz = shard_map(
        val, mesh=mesh,
        in_specs=(P(data_axis, model_axis), P(data_axis, model_axis),
                  P(), P(None, model_axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(pos_val, neg_val, mu, state.w)
    denom = jnp.float32(pos_val.shape[0]) * jnp.float32(neg_val.shape[0])
    loss_val = loss / denom
    return loss_val, regul, loss_val + regul, nnz


# -- stage 8: sharded PJ RDA ---------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("mesh", "batch_per_device", "n_steps"))
def pj_train_chunk_sharded(mesh: Mesh, pos_trn, neg_trn, mu, gamma,
                           state: PJState, key,
                           *, batch_per_device: int, n_steps: int) -> PJState:
    """Sharded PJ step: batch rows over dp (features replicated — F is a few
    hundred), violator counts exchanged via all_gather, dLoss psum-reduced,
    eigendecomposition replicated on every device."""
    n_dp = mesh.shape[data_axis]
    batch = batch_per_device * n_dp

    def chunk(pos_l, neg_l, mu_l, gamma_l, w0, a0, df0, basis0, t0, key_l):
        dp_idx = jax.lax.axis_index(data_axis)
        f_dim = pos_l.shape[1]

        def step(carry, k):
            w, a, df, basis, t = carry
            k = jax.random.fold_in(k, dp_idx)
            kp, kn = jax.random.split(k)
            ip = jax.random.randint(kp, (batch_per_device,), 0,
                                    pos_l.shape[0])
            ineg = jax.random.randint(kn, (batch_per_device,), 0,
                                      neg_l.shape[0])
            dp_b = pos_l[ip]
            dn_b = neg_l[ineg]
            pd = jnp.sum(jnp.matmul(dp_b, w.T, precision=_HIGHEST) ** 2, 1)
            nd = jnp.sum(jnp.matmul(dn_b, w.T, precision=_HIGHEST) ** 2, 1)
            pd_full = jax.lax.all_gather(pd, data_axis, axis=0, tiled=True)
            nd_full = jax.lax.all_gather(nd, data_axis, axis=0, tiled=True)
            # per-local-positive violations vs ALL negatives, and
            # per-local-negative violations vs ALL positives
            n_viol = jnp.sum(
                (pd[:, None] + 1.0 > nd_full[None, :]).astype(jnp.float32), 1)
            cnt = jnp.sum(
                (pd_full[:, None] + 1.0 > nd[None, :]).astype(jnp.float32), 0)
            dloss = (
                jnp.matmul(dp_b.T * n_viol[None, :], dp_b, precision=_HIGHEST)
                - jnp.matmul(dn_b.T * cnt[None, :], dn_b, precision=_HIGHEST)
            )
            dloss = jax.lax.psum(dloss, data_axis)
            tf = t.astype(jnp.float32)
            df = (tf * df + dloss / jnp.float32(batch * batch)) / (tf + 1.0)
            a_new = -(jnp.sqrt(tf + 1.0) / gamma_l) * (
                df + mu_l * jnp.eye(f_dim, dtype=jnp.float32))
            a_new = 0.5 * (a_new + a_new.T)
            vals, vecs = _eigh_exact(a_new, basis)
            lam = jnp.maximum(vals, 0.0)
            a_psd = jnp.matmul(vecs * lam[None, :], vecs.T,
                               precision=_HIGHEST)
            w_new = jnp.sqrt(lam)[:, None] * vecs.T
            return (w_new, a_psd, df, vecs, t + 1), None

        keys = jax.random.split(key_l, n_steps)
        (w, a, df, basis, t), _ = jax.lax.scan(
            step, (w0, a0, df0, basis0, t0), keys)
        return w, a, df, basis, t

    w, a, df, basis, t = shard_map(
        chunk, mesh=mesh,
        in_specs=(P(data_axis, None), P(data_axis, None), P(), P(),
                  P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )(pos_trn, neg_trn, mu, gamma, state.w, state.a, state.df_avg,
      state.basis, state.t, key)
    return PJState(w=w, a=a, df_avg=df, basis=basis, t=t)


# -- pod-level sweep: hyperparameter axis sharded over devices -------------

def sweep_state_sharding(mesh: Mesh) -> NamedSharding:
    """Sweep-entry axis S over dp; feature axis replicated."""
    return NamedSharding(mesh, P(data_axis, None))


def shard_sweep(mesh: Mesh, mus, gammas, state: PRState):
    """Lay a PR sweep out for pod execution: the S axis (hyperparameter
    combos) shards over ``dp``, training data stays replicated per device
    (each chip holds the splits once — the Brown-scale residency plan is
    per-chip). Zero collectives: the sweep is the embarrassingly parallel
    pod workload SURVEY.md §5 assigns to the reference's 768-run bash grid.

    S must be divisible by the dp size (pad the grid with dummy combos if
    not — their artifacts are simply ignored).
    """
    n_dp = mesh.shape[data_axis]
    s = state.w.shape[0]
    if s % n_dp:
        raise ValueError(f"sweep width {s} not divisible by dp={n_dp}; "
                         f"pad the grid")
    sh = sweep_state_sharding(mesh)
    vec = NamedSharding(mesh, P(data_axis))
    return (jax.device_put(mus, vec), jax.device_put(gammas, vec),
            PRState(w=jax.device_put(state.w, sh),
                    df_avg=jax.device_put(state.df_avg, sh),
                    t=jax.device_put(state.t, replicated(mesh))))


def pr_sweep_chunk_sharded(mesh: Mesh, pos_trn, neg_trn, mus, gammas,
                           state: PRState, key, *, batch: int,
                           n_steps: int, sampling: str = "gather",
                           precision=None):
    """pr_train_chunk with the sweep axis GSPMD-sharded over dp.

    Same program, same RNG stream, bit-identical results to the
    single-device sweep (GSPMD only partitions the matmuls); data is
    replicated, every step's (B,F)x(F,S/dp) partial runs locally.
    """
    from ..models.pr_rda import pr_train_chunk

    rep = replicated(mesh)
    pos_trn = jax.device_put(pos_trn, rep)
    neg_trn = jax.device_put(neg_trn, rep)
    mus, gammas, state = shard_sweep(mesh, mus, gammas, state)
    kw = {}
    if precision is not None:
        kw["precision"] = precision
    return pr_train_chunk(pos_trn, neg_trn, mus, gammas, state, key,
                          batch=batch, n_steps=n_steps, sampling=sampling,
                          **kw)


def shard_pj_sweep(mesh: Mesh, mus, gammas, states: PJState):
    """Lay a PJ sweep out for pod execution: the S axis (hyperparameter
    combos) shards over ``dp``; every stacked state field — including the
    (S, F, F) metric/subgradient tensors whose batched eigh is the PJ
    bottleneck — splits across devices. Data stays replicated per device
    (same residency plan as shard_sweep). Zero collectives."""
    n_dp = mesh.shape[data_axis]
    s = states.w.shape[0]
    if s % n_dp:
        raise ValueError(f"sweep width {s} not divisible by dp={n_dp}; "
                         f"pad the grid")
    vec = NamedSharding(mesh, P(data_axis))

    def put(x):
        spec = P(data_axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return (jax.device_put(mus, vec), jax.device_put(gammas, vec),
            jax.tree_util.tree_map(put, states))


def pj_sweep_chunk_sharded(mesh: Mesh, pos_trn, neg_trn, mus, gammas,
                           states: PJState, keys, *, batch: int,
                           n_steps: int, eigh_mode: str = "exact",
                           subspace_steps: int = 4) -> PJState:
    """pj_train_chunk_batch with the sweep axis GSPMD-sharded over dp.

    Same program, same per-entry RNG streams, results identical to the
    single-device vmapped sweep — GSPMD partitions the vmap's batch axis,
    so each device factorises S/dp of the (S, F, F) eigh batch (the
    reference runs its 45-combo PJ grid as sequential processes,
    08-pjlearn.sh; here the grid is one program across the pod)."""
    from ..models.pj_rda import pj_train_chunk_batch

    rep = replicated(mesh)
    pos_trn = jax.device_put(pos_trn, rep)
    neg_trn = jax.device_put(neg_trn, rep)
    mus, gammas, states = shard_pj_sweep(mesh, mus, gammas, states)
    keys = jax.device_put(
        keys, NamedSharding(mesh, P(data_axis, *([None] * (keys.ndim - 1)))))
    return pj_train_chunk_batch(pos_trn, neg_trn, mus, gammas, states, keys,
                                batch=batch, n_steps=n_steps,
                                eigh_mode=eigh_mode,
                                subspace_steps=subspace_steps)
