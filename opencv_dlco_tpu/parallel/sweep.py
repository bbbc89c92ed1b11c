"""Hyperparameter sweep engine: the grid trains as ONE program.

The reference's PR sweep is 768 sequential week-long binary invocations
driven by bash (workspace/04-prlearn.sh: 3 datasets x 16 mu x 16 gamma);
its PJ sweep is 405 more (08-pjlearn.sh). Here the whole grid becomes the
leading S axis of the batched solvers (models/pr_rda.py): every sweep entry
shares each step's sampled minibatch, so the per-sample work for S entries
is a single (B, F) x (F, S) matmul — the MXU sees one big GEMM instead of
S GEMVs, and the sweep costs barely more than one run.

Validation is vmapped over S (one sort per entry); per-entry best iterates
are tracked on-device and appended to the per-run artifact history exactly
like single runs, so downstream stages (prstats, compunproj) see the same
files the reference layout has.
"""

from __future__ import annotations

import os
import time
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..data.store import ArtifactStore
from ..models.pr_rda import pr_init, pr_train_chunk, pr_validate
from ..models.pj_rda import pj_init, pj_train_chunk, pj_validate
from ..models.select import compute_pj_stats, selected_pr_geometry
from ..utils.configs import (
    PJLearnConfig,
    PJSweepGrid,
    PRLearnConfig,
    PRSweepGrid,
)
from ..utils.logs import MetricLogger


@jax.jit
def _track_best(obj, best_obj, w, best_w):
    """Per-entry best-iterate tracking, fully on device."""
    improved = obj < best_obj
    best_obj = jnp.where(improved, obj, best_obj)
    best_w = jnp.where(improved[:, None], w, best_w)
    return improved, best_obj, best_w


def run_pr_sweep(ws, ds: str, grid: PRSweepGrid, base: PRLearnConfig,
                 dist_path: Optional[str] = None) -> List[dict]:
    """Train the full (mu, gamma) grid for one dataset in a single program.

    Writes one pr-learn/{ds}-{mu}-{gamma}-pr.h5 per combo (best-w history,
    same layout as Workspace.prlearn) and returns per-combo summaries
    sorted by final validation objective.
    """
    combos = grid.combos()
    s = len(combos)
    mus = jnp.asarray([c[0] for c in combos], jnp.float32)
    gammas = jnp.asarray([c[1] for c in combos], jnp.float32)

    data = ws._load_split(
        dist_path or ws.path("distances", f"{ds}-dist.h5"),
        base.train_frac, base.seed)
    pos_trn = jnp.asarray(data["pos_trn"])
    neg_trn = jnp.asarray(data["neg_trn"])
    pos_val = jnp.asarray(data["pos_val"])
    neg_val = jnp.asarray(data["neg_val"])
    params = ws.load_pr_params()

    n_feat = pos_trn.shape[1]
    state = pr_init(n_feat, s)
    key = jax.random.PRNGKey(base.seed)
    best_obj = jnp.full((s,), jnp.inf, jnp.float32)
    best_w = jnp.zeros((s, n_feat), jnp.float32)

    steps_per_log = max(1, base.log_step // base.batch)
    n_logs = max(1, base.n_iter // (steps_per_log * base.batch))

    log = MetricLogger(jsonl_path=ws.path("pr-learn", "logging",
                                          f"{ds}-sweep.jsonl"))
    stores = {}
    try:
        for c in combos:
            run = f"{ds}-{c[0]}-{c[1]}-pr"
            stores[c] = ArtifactStore(ws.path("pr-learn", f"{run}.h5"), "w")
        t0 = time.perf_counter()
        for li in range(n_logs):
            key, sub = jax.random.split(key)
            state = pr_train_chunk(pos_trn, neg_trn, mus, gammas, state, sub,
                                   batch=base.batch, n_steps=steps_per_log,
                                   sampling=base.sampling)
            loss, regul, obj, nnz = pr_validate(pos_val, neg_val, mus, state)
            improved, best_obj, best_w = _track_best(obj, best_obj,
                                                     state.w, best_w)
            imp_idx = np.flatnonzero(np.asarray(improved))
            w_host = np.asarray(state.w[imp_idx]) if imp_idx.size else None
            for j, si in enumerate(imp_idx):
                c = combos[si]
                w_np = w_host[j]
                _, dim, _ = selected_pr_geometry(params, w_np)
                if dim <= base.max_dim:
                    stores[c].append_row("w", w_np)
            log.record(
                "pr_sweep_step",
                f"SweepStep: {int(state.t)} samples x {s} combos  "
                f"improved: {imp_idx.size}  medObj: "
                f"{float(jnp.median(obj)):.6f}  "
                f"t: {time.perf_counter() - t0:.1f}s",
                t=int(state.t), improved=int(imp_idx.size),
                med_obj=float(jnp.median(obj)),
            )
        results = []
        obj_np = np.asarray(best_obj)
        nnz_np = np.asarray(nnz)
        for si, c in enumerate(combos):
            stores[c].set_meta("done_iters", f"{base.n_iter}")
            stores[c].set_meta("config", {"mu": c[0], "gamma": c[1],
                                          "sweep": True})
            results.append(dict(mu=c[0], gamma=c[1],
                                obj=float(obj_np[si]), nnz=int(nnz_np[si]),
                                model=stores[c].path))
        results.sort(key=lambda r: r["obj"])
        return results
    finally:
        for st in stores.values():
            st.close()
        log.close()


def run_pj_sweep(ws, unproj_path: str, grid: PJSweepGrid,
                 base: PJLearnConfig) -> List[dict]:
    """PJ grid sweep. The PJ state is (F, F) per entry (e.g. 544^2 = 1.2 MB),
    so the full 45-combo grid fits on one chip; entries run as a python loop
    over a shared resident dataset (the eigh dominates each step, and XLA
    overlaps the host loop's next-step dispatch), reusing Workspace.pjlearn
    artifacts and resume semantics."""
    results = []
    for mu in grid.mus:
        for gamma in grid.gammas:
            cfg = PJLearnConfig(mu=mu, gamma=gamma, n_iter=base.n_iter,
                                log_step=base.log_step, batch=base.batch,
                                train_frac=base.train_frac, seed=base.seed,
                                eigh_mode=base.eigh_mode,
                                subspace_steps=base.subspace_steps)
            path = ws.pjlearn(unproj_path, cfg)
            with ArtifactStore(path, "r") as st:
                best = st.get_meta("best", {})
                dim = st.shape("W")[0] if st.exists("W") else 0
            results.append(dict(mu=mu, gamma=gamma, model=path, dim=dim,
                                **best))
    results.sort(key=lambda r: r.get("fpr95", np.inf))
    return results
