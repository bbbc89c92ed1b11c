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

Both sweeps checkpoint their stacked solver state + per-combo append
positions into a sidecar `*-sweep-ckpt.h5` every log period and resume
from it bit-identically — the whole-grid analogue of the reference's
per-run log-grep resume (04-prlearn.sh:17-22, 08-pjlearn.sh:18-21): an
interrupted grid loses at most one log period, not the whole sweep.

Multi-process runs (process_count > 1) switch the sidecar to
utils/checkpoint.ShardedSweepCheckpoint: every process writes its own
combo-range shard of the stacked state to its own file (double-buffered
slots; no primary-writer IO funnel) and every process resumes from the
assembled newest common wave — exercised for real by the 2-OS-process
test (tests/test_distributed_procs.py interrupts and resumes the sweep).
"""

from __future__ import annotations

import os
import time
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..data.store import ArtifactStore, writer_store
from ..models.pr_rda import PRState, pr_init, pr_train_chunk, pr_validate
from ..models.pj_rda import pj_validate
from ..models.select import (
    compute_pj_stats_splits,
    selected_pr_geometry,
)
from ..utils.checkpoint import (
    RunInterrupted,
    ShardedSweepCheckpoint,
    load_solver_state,
    save_solver_state,
)
from ..utils.configs import (
    PJLearnConfig,
    PJSweepGrid,
    PRLearnConfig,
    PRSweepGrid,
)
from ..utils.logs import MetricLogger
from ..utils.memory import check_device_budget, nbytes


SweepInterrupted = RunInterrupted

@jax.jit
def _track_best(obj, best_obj, w, best_w):
    """Per-entry best-iterate tracking, fully on device."""
    improved = obj < best_obj
    best_obj = jnp.where(improved, obj, best_obj)
    best_w = jnp.where(improved[:, None], w, best_w)
    return improved, best_obj, best_w


def _check_finite(obj, what, t):
    """Crash-fast on a diverged sweep entry (feenableexcept's role,
    src/pr-learn.cpp:57): a non-finite objective means that entry's
    iterate is poisoned and every later artifact append would be junk."""
    bad = np.flatnonzero(~np.isfinite(np.asarray(obj)))
    if bad.size:
        raise FloatingPointError(
            f"{what}: non-finite objective for sweep entries {bad.tolist()} "
            f"at t={t}")


def _sweep_signature(combos, base, n_feat, extra=None):
    return {
        "combos": [list(c) for c in combos],
        "n_iter": base.n_iter, "batch": base.batch,
        "log_step": base.log_step, "seed": base.seed,
        "train_frac": base.train_frac, "n_feat": int(n_feat),
        **(extra or {}),
    }


def _completed_sweep_results(ws, subdir: str, runs, combos, n_iter: int,
                             sidecar: str):
    """Stage-level idempotence for whole sweeps (the reference skips a
    run iff its log carries the final-iteration line,
    04-prlearn.sh:17-22): if EVERY combo artifact exists with the
    done_iters marker for this budget and no resume sidecar is pending,
    return reconstructed per-combo summaries instead of retraining —
    a re-invoked run_full (e.g. after a crash in a later stage) must
    not pay the sweep again. Any mismatch -> None (train normally;
    the fresh-start path rewrites the artifacts)."""
    if os.path.exists(sidecar) or jax.process_count() > 1:
        return None
    results = []
    for run, c in zip(runs, combos):
        path = ws.path(subdir, f"{run}.h5")
        if not os.path.exists(path):
            return None
        try:
            with ArtifactStore(path, "r") as st:
                if st.get_meta("done_iters") != f"{n_iter}":
                    return None
                rec = dict(mu=c[0], gamma=c[1], model=path,
                           obj=np.inf, nnz=0)
                best = st.get_meta("best") or {}
                rec.update({k: best[k] for k in ("auc", "fpr95")
                            if k in best})
                if st.exists("w"):
                    rec["nnz"] = int(np.sum(st.read("w")[-1] > 0.0))
                if st.exists("W"):
                    w_np = st.read("W")
                    rec["dim"] = int(np.sum(np.any(w_np != 0.0, axis=1)))
                results.append(rec)
        except OSError:
            return None
    return results


def run_pr_sweep(ws, ds: str, grid: PRSweepGrid, base: PRLearnConfig,
                 dist_path: Optional[str] = None,
                 _stop_after_logs: Optional[int] = None,
                 ckpt_every: int = 1) -> List[dict]:
    """Train the full (mu, gamma) grid for one dataset in a single program.

    Writes one pr-learn/{ds}-{mu}-{gamma}-pr.h5 per combo (best-w history,
    same layout as Workspace.prlearn) and returns per-combo summaries
    sorted by final validation objective. Interruptions resume from the
    sidecar checkpoint with identical final artifacts.

    ``ckpt_every``: sidecar cadence in log periods (default every log, the
    resume-tests' contract). Reference-budget runs log 500 times per sweep
    (50M samples / 100k); a coarser cadence bounds checkpoint IO while an
    interruption still loses at most ``ckpt_every`` log periods.
    """
    combos = grid.combos()
    s = len(combos)
    mus = jnp.asarray([c[0] for c in combos], jnp.float32)
    gammas = jnp.asarray([c[1] for c in combos], jnp.float32)

    done = _completed_sweep_results(
        ws, "pr-learn", [f"{ds}-{c[0]}-{c[1]}-pr" for c in combos],
        combos, base.n_iter,
        sidecar=ws.path("pr-learn", f"{ds}-sweep-ckpt.h5"))
    if done is not None:
        return done

    data = ws._load_split(
        dist_path or ws.dist_path(ds),
        base.train_frac, base.seed)
    # budget computed at f32 size — a safe overestimate when split_dtype
    # is bf16 (residency halves after the cast below)
    check_device_budget(
        {k: nbytes(v) for k, v in data.items()}, f"pr_sweep[{ds}]")
    split_dt = jnp.bfloat16 if base.split_dtype == "bf16" else jnp.float32
    pos_trn = jnp.asarray(data["pos_trn"]).astype(split_dt)
    neg_trn = jnp.asarray(data["neg_trn"]).astype(split_dt)
    pos_val = jnp.asarray(data["pos_val"])
    neg_val = jnp.asarray(data["neg_val"])
    del data
    params = ws.load_pr_params()

    n_feat = pos_trn.shape[1]
    steps_per_log = max(1, base.log_step // base.batch)
    n_logs = max(1, base.n_iter // (steps_per_log * base.batch))
    signature = _sweep_signature(combos, base, n_feat,
                                 {"sampling": base.sampling,
                                  "matmul_precision": base.matmul_precision,
                                  "split_dtype": base.split_dtype})

    from ..parallel.distributed import is_primary

    primary = is_primary()
    ckpt_path = ws.path("pr-learn", f"{ds}-sweep-ckpt.h5")
    done_logs = 0
    resume = None
    # multi-process runs checkpoint SHARDED: every process writes its own
    # combo-range shard to its own file (no primary-writer IO funnel) and
    # every process resumes from the assembled common wave
    sck = None
    if jax.process_count() > 1:
        sck = ShardedSweepCheckpoint(
            ws.path("pr-learn", f"{ds}-sweep-ckpt"),
            jax.process_index(), jax.process_count(), s)
        loaded = sck.load(PRState, signature)
        if loaded is not None:
            st_l, key_l, arrs, done_logs = loaded
            resume = (st_l, key_l)
            best_obj = jnp.asarray(arrs["best_obj"])
            best_w = jnp.asarray(arrs["best_w"])
            row_counts = np.asarray(arrs["row_counts"])
    elif primary and os.path.exists(ckpt_path):
        # single-process path keeps the one-file sidecar (the layout the
        # reference's resume contract and the golden resume tests pin)
        with ArtifactStore(ckpt_path, "r") as ck:
            if ck.get_meta("signature") == signature:
                resume = load_solver_state(ck, PRState)
                meta = ck.get_meta("solver_state_meta") or {}
                done_logs = int(meta.get("completed_logs", 0))
                best_obj = jnp.asarray(ck.read("best_obj"))
                best_w = jnp.asarray(ck.read("best_w"))
                row_counts = ck.read("row_counts")
        if resume is None and primary:
            os.remove(ckpt_path)

    if resume is not None:
        state, key = resume
    else:
        state = pr_init(n_feat, s)
        key = jax.random.PRNGKey(base.seed)
        best_obj = jnp.full((s,), jnp.inf, jnp.float32)
        best_w = jnp.zeros((s, n_feat), jnp.float32)
        row_counts = np.zeros((s,), np.int64)

    log = MetricLogger(jsonl_path=ws.path("pr-learn", "logging",
                                          f"{ds}-sweep.jsonl")
                       if primary else None)
    stores = {}
    try:
        for si, c in enumerate(combos):
            run = f"{ds}-{c[0]}-{c[1]}-pr"
            path = ws.path("pr-learn", f"{run}.h5")
            if primary and resume is None and os.path.exists(path):
                os.remove(path)
            stores[c] = writer_store(path, "a")
            if resume is not None:
                # drop any rows appended after the checkpoint was taken
                stores[c].truncate_rows("w", int(row_counts[si]))
        t0 = time.perf_counter()
        for li in range(done_logs, n_logs):
            key, sub = jax.random.split(key)
            state = pr_train_chunk(pos_trn, neg_trn, mus, gammas, state, sub,
                                   batch=base.batch, n_steps=steps_per_log,
                                   sampling=base.sampling,
                                   precision=base.precision)
            loss, regul, obj, nnz = pr_validate(pos_val, neg_val, mus, state)
            _check_finite(obj, f"pr_sweep[{ds}]", int(state.t))
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
                    row_counts[si] += 1
            log.record(
                "pr_sweep_step",
                f"SweepStep: {int(state.t)} samples x {s} combos  "
                f"improved: {imp_idx.size}  medObj: "
                f"{float(jnp.median(obj)):.6f}  "
                f"t: {time.perf_counter() - t0:.1f}s",
                t=int(state.t), improved=int(imp_idx.size),
                med_obj=float(jnp.median(obj)),
            )
            def _save_ckpt(li=li):
                if sck is not None:
                    sck.save(state, key,
                             {"best_obj": np.asarray(best_obj),
                              "best_w": np.asarray(best_w),
                              "row_counts": row_counts},
                             signature, li + 1)
                else:
                    with writer_store(ckpt_path, "a") as ck:
                        save_solver_state(ck, state, key,
                                          extra={"completed_logs": li + 1},
                                          compression=0)
                        ck.write("best_obj", np.asarray(best_obj),
                                 compression=0)
                        ck.write("best_w", np.asarray(best_w),
                                 compression=0)
                        ck.write("row_counts", row_counts, compression=0)
                        ck.set_meta("signature", signature)

            if (li + 1) % ckpt_every == 0 or li + 1 == n_logs:
                _save_ckpt()
            if _stop_after_logs is not None and li + 1 >= _stop_after_logs:
                if (li + 1) % ckpt_every != 0:
                    _save_ckpt()
                raise SweepInterrupted(f"stopped after log {li + 1}")
        results = []
        obj_np = np.asarray(best_obj)
        nnz_np = np.asarray(nnz) if done_logs < n_logs else \
            np.asarray(jnp.sum(best_w > 0.0, axis=1))
        for si, c in enumerate(combos):
            stores[c].set_meta("done_iters", f"{base.n_iter}")
            stores[c].set_meta("config", {"mu": c[0], "gamma": c[1],
                                          "sweep": True})
            results.append(dict(mu=c[0], gamma=c[1],
                                obj=float(obj_np[si]), nnz=int(nnz_np[si]),
                                model=stores[c].path))
        results.sort(key=lambda r: r["obj"])
        if sck is not None:
            sck.cleanup()
        elif primary and os.path.exists(ckpt_path):
            os.remove(ckpt_path)
        return results
    finally:
        for st in stores.values():
            st.close()
        log.close()


def run_pj_sweep(ws, unproj_path: str, grid: PJSweepGrid,
                 base: PJLearnConfig,
                 run_label: Optional[str] = None,
                 _stop_after_logs: Optional[int] = None,
                 ckpt_every: int = 1) -> List[dict]:
    """PJ grid sweep as ONE vmapped program.

    All S = |grid| solver states train together over the shared resident
    dataset; each step's S eigendecompositions run as one batched eigh
    (models/pj_rda.pj_train_chunk_batch). Objective-best iterates are
    tracked on device; full-dataset FPR95/AUC stats are evaluated once per
    entry at the end and each entry writes the same
    pj-learn/{label}-{mu}-{gamma}-pj.h5 artifact Workspace.pjlearn would.

    ``ckpt_every``: checkpoint cadence in log periods (the stacked PJ
    state is S x F x F — raw-written, but still worth batching for large
    grids).
    """
    from ..models.pj_rda import PJState, pj_init_batch, pj_train_chunk_batch

    combos = [(m, g) for m in grid.mus for g in grid.gammas]
    s = len(combos)
    mus = jnp.asarray([c[0] for c in combos], jnp.float32)
    gammas = jnp.asarray([c[1] for c in combos], jnp.float32)

    if run_label is None:
        run_label = os.path.basename(unproj_path).replace("-unproj.h5", "")
    done = _completed_sweep_results(
        ws, "pj-learn", [f"{run_label}-{m}-{g}-pj" for m, g in combos],
        combos, base.n_iter,
        sidecar=ws.path("pj-learn", f"{run_label}-sweep-ckpt.h5"))
    if done is not None:
        done.sort(key=lambda r: r.get("fpr95", np.inf))
        return done
    data = ws._load_split(unproj_path, base.train_frac, base.seed)
    n_feat = data["pos_trn"].shape[1]
    check_device_budget(
        {**{k: nbytes(v) for k, v in data.items()},
         "sweep_state": 4 * s * n_feat * n_feat * 4,
         "best_iterates": 2 * s * n_feat * n_feat * 4},
        f"pj_sweep[{run_label}]")
    splits = {k: jnp.asarray(v) for k, v in data.items()}
    del data
    pos_trn, neg_trn = splits["pos_trn"], splits["neg_trn"]
    pos_val, neg_val = splits["pos_val"], splits["neg_val"]

    rank_cap = base.rank_cap or n_feat
    n_logs = max(1, base.n_iter // base.log_step)
    signature = _sweep_signature(combos, base, n_feat,
                                 {"eigh_mode": base.eigh_mode,
                                  "rank_cap": rank_cap})
    from ..parallel.distributed import is_primary

    primary = is_primary()
    ckpt_path = ws.path("pj-learn", f"{run_label}-sweep-ckpt.h5")
    done_logs = 0
    resume = None
    sck = None
    if jax.process_count() > 1:  # see run_pr_sweep note: sharded sidecars
        sck = ShardedSweepCheckpoint(
            ws.path("pj-learn", f"{run_label}-sweep-ckpt"),
            jax.process_index(), jax.process_count(), s)
        loaded = sck.load(PJState, signature)
        if loaded is not None:
            st_l, key_l, arrs, done_logs = loaded
            resume = (st_l, key_l)
            best_obj = jnp.asarray(arrs["best_obj"])
            best_w = jnp.asarray(arrs["best_w"])
            best_a = jnp.asarray(arrs["best_a"])
    elif primary and os.path.exists(ckpt_path):
        with ArtifactStore(ckpt_path, "r") as ck:
            if ck.get_meta("signature") == signature:
                resume = load_solver_state(ck, PJState)
                meta = ck.get_meta("solver_state_meta") or {}
                done_logs = int(meta.get("completed_logs", 0))
                best_obj = jnp.asarray(ck.read("best_obj"))
                best_w = jnp.asarray(ck.read("best_w"))
                best_a = jnp.asarray(ck.read("best_a"))
        if resume is None and primary:
            os.remove(ckpt_path)

    if resume is not None:
        states, key = resume
    else:
        states = pj_init_batch(n_feat, s, base.rank_cap)
        key = jax.random.PRNGKey(base.seed)
        best_obj = jnp.full((s,), jnp.inf, jnp.float32)
        best_w = jnp.zeros((s, rank_cap, n_feat), jnp.float32)
        best_a = jnp.zeros((s, n_feat, n_feat), jnp.float32)

    validate_b = jax.jit(jax.vmap(pj_validate, in_axes=(None, None, 0, 0)))

    @jax.jit
    def track(obj, best_obj, w, a, best_w, best_a):
        improved = obj < best_obj
        return (jnp.where(improved, obj, best_obj),
                jnp.where(improved[:, None, None], w, best_w),
                jnp.where(improved[:, None, None], a, best_a))

    log = MetricLogger(jsonl_path=ws.path("pj-learn", "logging",
                                          f"{run_label}-sweep.jsonl")
                       if primary else None)
    t0 = time.perf_counter()

    def save_ckpt(li):
        if sck is not None:
            sck.save(states, key,
                     {"best_obj": np.asarray(best_obj),
                      "best_w": np.asarray(best_w),
                      "best_a": np.asarray(best_a)},
                     signature, li + 1)
            return
        with writer_store(ckpt_path, "a") as ck:
            save_solver_state(ck, states, key,
                              extra={"completed_logs": li + 1},
                              compression=0)
            ck.write("best_obj", np.asarray(best_obj), compression=0)
            ck.write("best_w", np.asarray(best_w), compression=0)
            ck.write("best_a", np.asarray(best_a), compression=0)
            ck.set_meta("signature", signature)

    try:
        for li in range(done_logs, n_logs):
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, s)
            states = pj_train_chunk_batch(pos_trn, neg_trn, mus, gammas,
                                          states, keys, batch=base.batch,
                                          n_steps=base.log_step,
                                          eigh_mode=base.eigh_mode,
                                          subspace_steps=base.subspace_steps,
                                          ns_iters=base.ns_iters)
            loss, regul, obj, rank = validate_b(pos_val, neg_val, mus, states)
            _check_finite(obj, f"pj_sweep[{run_label}]", int(states.t[0]))
            best_obj, best_w, best_a = track(obj, best_obj, states.w,
                                             states.a, best_w, best_a)
            log.record(
                "pj_sweep_step",
                f"PJSweepStep: iter {int(states.t[0])} x {s} combos  "
                f"medObj: {float(jnp.median(obj)):.6f}  "
                f"t: {time.perf_counter() - t0:.1f}s",
                t=int(states.t[0]), med_obj=float(jnp.median(obj)),
            )
            if (li + 1) % ckpt_every == 0 or li + 1 == n_logs:
                save_ckpt(li)
            if _stop_after_logs is not None and li + 1 >= _stop_after_logs:
                if (li + 1) % ckpt_every != 0:
                    save_ckpt(li)
                raise SweepInterrupted(f"stopped after log {li + 1}")
        results = []
        best_w_np = np.asarray(best_w)
        best_a_np = np.asarray(best_a)
        for si, (mu, gamma) in enumerate(combos):
            w_np = best_w_np[si]
            stats = compute_pj_stats_splits(splits, w_np)
            out = ws.path("pj-learn", f"{run_label}-{mu}-{gamma}-pj.h5")
            with writer_store(out, "w") as st:
                st.write("W", w_np[np.any(w_np != 0.0, axis=1)])
                st.write("A", best_a_np[si])
                st.set_meta("done_iters", f"{base.n_iter}")
                st.set_meta("config", {"mu": mu, "gamma": gamma,
                                       "sweep": True})
                st.set_meta("best", {"auc": stats["auc"],
                                     "fpr95": stats["fpr95"]})
            results.append(dict(mu=mu, gamma=gamma, model=out,
                                dim=stats["dim"], **{
                                    "auc": stats["auc"],
                                    "fpr95": stats["fpr95"]}))
        results.sort(key=lambda r: r.get("fpr95", np.inf))
        if sck is not None:
            sck.cleanup()
        elif primary and os.path.exists(ckpt_path):
            os.remove(ckpt_path)
        return results
    finally:
        log.close()
