"""The 11-stage DLCO workflow as an idempotent, TPU-batched pipeline.

Replaces the reference's bash orchestration layer (workspace/01-export.sh ..
11-opencv-export.sh): every stage is a Python function over a Workspace
directory with the same artifact layout, the same resume contract (a stage
is skipped iff its output artifact is complete), structured JSONL metrics
instead of grepped logs, and device-batched compute instead of per-pair
OpenMP threads.

Workspace layout (mirrors reference workspace/):
    dataset/{ds}.h5                  Indices + Patches        (stage 1)
    filters.h5                       Ring/PR params + filters (stage 2)
    distances/{ds}-dist.h5           Label + Distance 500k x 5120 (stage 3)
    pr-learn/{run}.h5 + logging/     w histories + metrics    (stage 4)
    distances/{ds}-{pr}-unproj.h5    signed diff vectors      (stage 7)
    pj-learn/{run}.h5 + logging/     W, A + metrics           (stage 8)
    opencv/*.i                       exported headers         (stage 11)
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..data.brown import convert_brown_patches, pair_labels
from ..data.store import ArtifactStore, parse_model_ref, writer_store
from ..parallel.distributed import is_primary
from ..models.pr_rda import PRState, pr_init, pr_train_chunk, pr_validate
from ..models.pj_rda import pj_init, pj_train_chunk, pj_validate
from ..models.select import (
    compute_pj_stats,
    compute_pj_stats_splits,
    compute_pr_stats_rows,
    compute_pr_stats_splits,
    select_pr_filters,
    selected_pr_geometry,
)
from ..ops.pair_distance import ring_distances, unprojected_diffs
from ..ops.patch_transform import batch_patch_transform
from ..ops.pool_regions import build_filter_bank
from ..utils.configs import (
    DescriptorConfig,
    PJLearnConfig,
    PoolRegionConfig,
    PRLearnConfig,
)
from ..utils.logs import MetricLogger
from ..utils.memory import check_device_budget, nbytes
from ..utils.progress import TermProgress


def _open_if_sound(path: str):
    """ArtifactStore(path, "r") or None for a truncated/corrupt file.

    Idempotence probes must treat an HDF5 a killed run left mid-write
    ("bad object header version number") exactly like an incomplete
    marker — regenerate, don't crash. Found live when restarting the
    reference-scale e2e over a half-written dataset."""
    try:
        return ArtifactStore(path, "r")
    except OSError:
        return None


@dataclass
class Workspace:
    """A pipeline working directory with reference-compatible layout."""

    root: str
    desc_cfg: DescriptorConfig = DescriptorConfig()
    pool_cfg: PoolRegionConfig = PoolRegionConfig()
    pair_block: int = 256  # pairs per device batch in distance stages
    progress: bool = True
    # gzip level for the big streamed matrices (Distance/unproj). The
    # reference's artifacts are gzip-chunked HDF5 (schema parity = gzip
    # chunking, not a level); ring distances are high-entropy float32
    # (published ratio ~1.16), so level 1 keeps the format at ~10x the
    # write speed of level 9 — at Brown scale a level-9 stage 3 would
    # spend hours in deflate on a 2-core host. 0 = stored deflate blocks.
    dist_compression: int = 1

    def path(self, *parts: str) -> str:
        p = os.path.join(self.root, *parts)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        return p

    def _bar(self) -> Optional[TermProgress]:
        return TermProgress() if self.progress else None

    # -- stage 1: dataset conversion -------------------------------------

    def convert(self, patch_dir: str, ds: str,
                max_pairs: Optional[int] = None) -> str:
        """Brown patch dir -> dataset/{ds}.h5 (reference: 01-export.sh)."""
        out = self.path("dataset", f"{ds}.h5")
        convert_brown_patches(patch_dir, out, max_pairs=max_pairs,
                              progress=self.progress)
        return out

    # -- stage 2: pooling-region bank -------------------------------------

    def genpr(self) -> str:
        """Generate the candidate filter bank (reference: 02-genpoolregs.sh)."""
        out = self.path("filters.h5")
        if os.path.exists(out):
            st = _open_if_sound(out)
            if st is not None:
                with st:
                    if st.exists("PRFilters"):
                        return out
        rings, params, filters = build_filter_bank(self.pool_cfg)
        p = self.pool_cfg.patch_size
        with ArtifactStore(out, "w") as st:
            st.write("RingParams", rings)
            st.write("PRParams", params)
            st.write("PRFilters",
                     filters.reshape(-1, p, p), chunk_rows=128)
            st.set_meta("pool_cfg", vars(self.pool_cfg))
        return out

    def load_filters(self) -> np.ndarray:
        with ArtifactStore(self.genpr(), "r") as st:
            f = st.read("PRFilters")
        return f.reshape(f.shape[0], -1)

    def load_pr_params(self) -> np.ndarray:
        with ArtifactStore(self.genpr(), "r") as st:
            return st.read("PRParams")

    def dist_path(self, ds: str) -> str:
        """Stage-3 output for ``ds``: the single-writer .h5 if present,
        else the multi-writer sharded .zarr (whichever compdist produced
        under the current process topology — readers are format-agnostic
        via data/shard_store.open_for_read)."""
        h5 = os.path.join(self.root, "distances", f"{ds}-dist.h5")
        if os.path.exists(h5):
            return h5
        zarr = os.path.join(self.root, "distances", f"{ds}-dist.zarr")
        if os.path.isdir(zarr):
            return zarr
        return h5   # canonical (error surfaces at open, as before)

    # -- stage 3: full ring-distance precompute ---------------------------

    def compdist(self, ds: str, sharded: Optional[bool] = None) -> str:
        """Per-pair 5120-D ring distances (reference: 03-compdist.sh,
        src/comp-fulldists.cpp). Batched device pipeline; streams the
        (n_pairs, n_rings) matrix to disk tile-by-tile.

        ``sharded`` (default: auto — on iff process_count > 1) switches to
        the multi-writer zarr store (data/shard_store.py): every process
        computes and writes ITS OWN chunk-aligned row range of the
        distance matrix concurrently — the distributed stage-3 SURVEY §5
        calls for, impossible over single-writer HDF5. Downstream readers
        are format-agnostic via open_for_read."""
        from ..parallel.distributed import host_info

        info = host_info()
        if sharded is None:
            sharded = info["process_count"] > 1
        n_rings = self.pool_cfg.n_rings
        with ArtifactStore(self.path("dataset", f"{ds}.h5"), "r") as st:
            indices = st.read("Indices")
            patches = st.read("Patches")
        n_pairs = indices.shape[0]

        if sharded:
            return self._compdist_sharded(ds, indices, patches, n_pairs,
                                          n_rings, info)

        out = self.path("distances", f"{ds}-dist.h5")
        if os.path.exists(out):
            st = _open_if_sound(out)
            if st is not None:
                with st:
                    if (st.exists("Distance")
                            and st.shape("Distance") == (n_pairs, n_rings)
                            and st.get_meta("complete", False)):
                        return out

        bar = self._bar()
        with ArtifactStore(out, "w") as st:
            st.write("Label", pair_labels(indices).reshape(-1, 1))
            st.create("Distance", (n_pairs, n_rings), np.float32,
                      compression=self.dist_compression)
            self._dist_rows(st, indices, patches, 0, n_pairs, bar)
            if bar:
                bar.done()
            st.set_meta("complete", True)
        return out

    def _dist_rows(self, st, indices, patches, lo: int, hi: int, bar=None):
        """Compute + write distance rows [lo, hi) into ``st`` (H5 or zarr).

        Implementation choice: reference-parity runs (precision="highest")
        go through the XLA path; bf16-opted runs take the fused Pallas
        kernel on TPU (hardware-measured: 13.2k pairs/s vs 4.4k XLA-f32,
        end-metric dFPR95 = 0.0 — see ops/pair_distance_pallas.py)."""
        filters = jnp.asarray(self.load_filters())
        blk = self.pair_block
        use_fused = (jax.default_backend() == "tpu"
                     and self.desc_cfg.matmul_precision != "highest"
                     and int(filters.shape[0]) % 1024 == 0)
        if use_fused:
            from ..ops.pair_distance_pallas import ring_distances_fused
        for s in range(lo, hi, blk):
            e = min(s + blk, hi)
            p1 = jnp.asarray(patches[indices[s:e, 0]])
            p2 = jnp.asarray(patches[indices[s:e, 2]])
            pt1 = batch_patch_transform(p1, self.desc_cfg)
            pt2 = batch_patch_transform(p2, self.desc_cfg)
            if use_fused:
                d = np.asarray(ring_distances_fused(
                    filters, pt1, pt2, bf16=True))
            else:
                d = np.asarray(ring_distances(
                    filters, pt1, pt2,
                    precision=self.desc_cfg.precision))
            if not np.all(np.isfinite(d)):
                raise FloatingPointError(
                    f"Distance contains NaN/Inf in rows [{s}, {e})"
                )  # reference: src/comp-fulldists.cpp:362-366
            st.write_rows("Distance", s, d)
            if bar:
                bar.update((e - lo) / max(hi - lo, 1))

    def _compdist_sharded(self, ds: str, indices, patches, n_pairs: int,
                          n_rings: int, info) -> str:
        """Multi-writer stage 3: each process owns a chunk-aligned row
        range; writes land concurrently in the zarr store with no
        primary-writer funnel. Completion = every writer's done marker."""
        import time as _time

        from ..data.shard_store import (ShardedArrayStore, shard_rows)

        out = self.path("distances", f"{ds}-dist.zarr")
        pid, n_proc = info["process_index"], info["process_count"]
        st = ShardedArrayStore(out)
        if (st.exists("Distance") and st.shape("Distance") ==
                (n_pairs, n_rings) and st.all_done(n_proc)):
            return out
        st.create("Label", (n_pairs, 1), np.int32, self.pair_block)
        st.create("Distance", (n_pairs, n_rings), np.float32,
                  self.pair_block)
        lo, hi = shard_rows(n_pairs, self.pair_block, pid, n_proc)
        labels = pair_labels(indices).reshape(-1, 1).astype(np.int32)
        st.write_rows("Label", lo, labels[lo:hi])
        self._dist_rows(st, indices, patches, lo, hi,
                        self._bar() if pid == 0 else None)
        st.mark_done(pid, {"rows": [int(lo), int(hi)]})
        # filesystem barrier: stage output is only usable when every
        # writer has landed (shared-filesystem contract, same as the
        # reference's per-stage file-existence resume)
        deadline = _time.time() + 600.0
        while not st.all_done(n_proc):
            if _time.time() > deadline:
                missing = [w for w in range(n_proc)
                           if not os.path.exists(os.path.join(
                               out, "_meta", f"done-{w}.json"))]
                raise TimeoutError(
                    f"compdist shards incomplete after 600s: {missing}")
            _time.sleep(0.2)
        return out

    # -- shared loading for the learners ----------------------------------

    def _load_split(self, dist_path: str, train_frac: float, seed: int):
        """Split pos/neg, shuffle, 80/20 (reference: src/pr-learn.cpp:230-273).

        The Distance matrix streams from HDF5 in row chunks and scatters
        directly into the four preallocated split arrays — the full matrix
        is never materialised as a second host copy, and it never goes to
        the device at all (full-dataset stats are recomputed from the
        splits; see models/select.compute_pr_stats_splits and the residency
        note in utils/memory.py).
        """
        from ..data.shard_store import open_for_read

        with open_for_read(dist_path) as st:
            labels = st.read("Label").reshape(-1)
            n_rows, n_feat = st.shape("Distance")
            pos_idx = np.flatnonzero(labels == 1)
            neg_idx = np.flatnonzero(labels == 0)
            rng = np.random.default_rng(seed)
            rng.shuffle(pos_idx)
            rng.shuffle(neg_idx)
            n_pos_trn = int(len(pos_idx) * train_frac)
            n_neg_trn = int(len(neg_idx) * train_frac)
            if min(n_pos_trn, n_neg_trn) == 0 or (
                    len(pos_idx) == n_pos_trn or len(neg_idx) == n_neg_trn):
                raise ValueError(
                    f"degenerate split for {dist_path}: "
                    f"{len(pos_idx)} positive / {len(neg_idx)} negative "
                    f"pairs at train_frac={train_frac} leave an empty train "
                    f"or validation side")
            split_idx = [pos_idx[:n_pos_trn], neg_idx[:n_neg_trn],
                         pos_idx[n_pos_trn:], neg_idx[n_neg_trn:]]
            arrs = [np.empty((len(ix), n_feat), np.float32)
                    for ix in split_idx]
            dest_split = np.empty(n_rows, np.int8)
            dest_row = np.empty(n_rows, np.int64)
            for si, ix in enumerate(split_idx):
                dest_split[ix] = si
                dest_row[ix] = np.arange(len(ix))
            for s, block in st.iter_rows("Distance"):
                ds_blk = dest_split[s:s + block.shape[0]]
                dr_blk = dest_row[s:s + block.shape[0]]
                for si in range(4):
                    m = ds_blk == si
                    if m.any():
                        arrs[si][dr_blk[m]] = block[m]
        return dict(pos_trn=arrs[0], neg_trn=arrs[1],
                    pos_val=arrs[2], neg_val=arrs[3])

    # -- stage 4: PR learning ---------------------------------------------

    def prlearn(self, ds: str, cfg: PRLearnConfig,
                dist_path: Optional[str] = None,
                _stop_after_logs: Optional[int] = None) -> str:
        """One PR RDA run -> pr-learn/{ds}-{mu}-{gamma}-pr.h5 with the
        improving-w history (reference: 04-prlearn.sh, src/pr-learn.cpp)."""
        from ..utils.checkpoint import load_solver_state, save_solver_state

        run = f"{ds}-{cfg.mu}-{cfg.gamma}-pr"
        out = self.path("pr-learn", f"{run}.h5")
        log_path = self.path("pr-learn", "logging", f"{run}.jsonl")
        marker = f"{cfg.n_iter}"
        resume = None
        # resume reads are primary-only: non-primary output is discarded
        # (NullStore below), and reading the HDF5 the primary holds open
        # for append is not safe without SWMR
        if is_primary() and os.path.exists(out):
            st = _open_if_sound(out)
            if st is not None:
                with st:
                    if st.get_meta("done_iters") == marker:
                        return out
                    # mid-run snapshot? resume from it instead of
                    # restarting (improves on the reference's
                    # stage-level-only resume, 04-prlearn.sh:19-22)
                    resume = load_solver_state(st, PRState)
                    resume_meta = st.get_meta("solver_state_meta") or {}
            if resume is None:
                os.remove(out)

        data = self._load_split(dist_path or self.dist_path(ds),
                                cfg.train_frac, cfg.seed)
        params = self.load_pr_params()
        check_device_budget(
            {k: nbytes(v) for k, v in data.items()}, f"prlearn[{run}]")
        splits = {k: jnp.asarray(v) for k, v in data.items()}
        del data
        split_dt = (jnp.bfloat16 if cfg.split_dtype == "bf16"
                    else jnp.float32)
        pos_trn = splits["pos_trn"].astype(split_dt)
        neg_trn = splits["neg_trn"].astype(split_dt)
        pos_val, neg_val = splits["pos_val"], splits["neg_val"]

        mu = jnp.asarray([cfg.mu], jnp.float32)
        gamma = jnp.asarray([cfg.gamma], jnp.float32)
        steps_per_log = max(1, cfg.log_step // cfg.batch)
        n_logs = max(1, cfg.n_iter // (steps_per_log * cfg.batch))
        done_logs = 0
        obj_best = np.inf
        if resume is not None:
            state, key = resume
            done_logs = int(resume_meta.get("completed_logs", 0))
            obj_best = float(resume_meta.get("obj_best", np.inf))
        else:
            state = pr_init(pos_trn.shape[1], 1)
            key = jax.random.PRNGKey(cfg.seed)

        # multi-host write discipline: only process 0 appends/logs (the
        # compute below is process-local, so skipping writes elsewhere
        # cannot desynchronise anything)
        with MetricLogger(jsonl_path=log_path if is_primary() else None) \
                as log, writer_store(out, "a") as st:
            if resume is not None and resume_meta.get("w_rows") is not None:
                # drop any w row appended after the snapshot was taken (a
                # crash in the append->snapshot window would otherwise
                # duplicate it on replay)
                st.truncate_rows("w", int(resume_meta["w_rows"]))
            n_w_rows = st.shape("w")[0] if st.exists("w") else 0
            t_train0 = time.perf_counter()
            for li in range(done_logs, n_logs):
                key, sub = jax.random.split(key)
                state = pr_train_chunk(pos_trn, neg_trn, mu, gamma, state,
                                       sub, batch=cfg.batch,
                                       n_steps=steps_per_log,
                                       sampling=cfg.sampling,
                                       precision=cfg.precision)
                jax.block_until_ready(state.w)
                t_train = time.perf_counter() - t_train0
                t_val0 = time.perf_counter()
                loss, regul, obj, nnz = pr_validate(pos_val, neg_val, mu, state)
                obj0 = float(obj[0])
                if not np.isfinite(obj0):
                    # crash-fast on solver divergence, the role feenableexcept
                    # plays in the reference's loop (src/pr-learn.cpp:57): a
                    # non-finite objective means w/df_avg are already poisoned
                    raise FloatingPointError(
                        f"prlearn[{run}]: non-finite objective {obj0} at "
                        f"t={int(state.t)} (loss={float(loss[0])}, "
                        f"regul={float(regul[0])})")
                t_val = time.perf_counter() - t_val0
                improved = obj0 < obj_best
                if improved:
                    obj_best = obj0
                log.pr_step(best=improved, t=int(state.t),
                            loss=float(loss[0]), regul=float(regul[0]),
                            obj=obj0, obj_best=obj_best, nnz=int(nnz[0]),
                            nnz_best=int(nnz[0]), ttime=t_train, vtime=t_val)
                if improved:
                    w_np = np.asarray(state.w[0])
                    stats = compute_pr_stats_splits(params, splits, w_np,
                                                    max_dim=cfg.max_dim)
                    saved = stats["dim"] <= cfg.max_dim
                    if saved:
                        st.append_row("w", w_np)
                        n_w_rows += 1
                    log.pr_stat(n_pr=stats["n_pr"], nz_dim=stats["nz_dim"],
                                dim=stats["dim"], max_dim=cfg.max_dim,
                                auc=stats["auc"] or 0.0,
                                fpr95=stats["fpr95"] if stats["fpr95"] is not None else -1.0,
                                saved=saved)
                save_solver_state(st, state, key,
                                  extra={"completed_logs": li + 1,
                                         "obj_best": obj_best,
                                         "w_rows": n_w_rows})
                if _stop_after_logs is not None and li + 1 >= _stop_after_logs:
                    from ..utils.checkpoint import RunInterrupted

                    raise RunInterrupted(f"stopped after log {li + 1}")
                t_train0 = time.perf_counter()
            st.set_meta("done_iters", marker)
            st.set_meta("config", vars(cfg))
        return out

    # -- stage 5/6: PR cross-dataset stats + ranking ----------------------

    def prstats(self, model_paths: Sequence[str],
                dist_paths: Dict[str, str],
                jsonl_path: Optional[str] = None) -> List[dict]:
        """Cross-evaluate every saved w of every model on every dataset
        (reference: 05-prstats.sh, src/pr-stats.cpp:196-252)."""
        params = self.load_pr_params()
        records = []
        with MetricLogger(jsonl_path=jsonl_path) as log:
            for ds, dpath in dist_paths.items():
                # the stats pass holds ONLY the one matrix (nothing else is
                # resident), so at Brown scale this is 10.2 GiB of 16 —
                # verified up front instead of OOMing mid-eval
                with ArtifactStore(dpath, "r") as st:
                    labels = st.read("Label").reshape(-1)
                    n_rows, n_feat = st.shape("Distance")
                    check_device_budget(
                        {"Distance": n_rows * n_feat * 4},
                        f"prstats[{ds}]")
                    dists = st.read("Distance")
                dists_j = jnp.asarray(dists)
                del dists
                labels_j = jnp.asarray(labels)
                for mpath in model_paths:
                    with ArtifactStore(mpath, "r") as st:
                        if not st.exists("w"):
                            # a sweep entry that never saved an iterate
                            # under the MaxDim gate — the reference's
                            # pr-stats likewise only sees runs that
                            # checkpointed at least one w
                            continue
                        hist = st.read("w")
                    # all rows of the history share one GEMM + one batched
                    # argsort (vs the reference's per-row GEMM + scalar ROC
                    # loop, src/pr-stats.cpp:221)
                    all_stats = compute_pr_stats_rows(params, dists_j,
                                                      labels_j, hist)
                    for row, stats in enumerate(all_stats):
                        rec = dict(model=mpath, row=row, dataset=ds, **stats)
                        records.append(rec)
                        log.model_stat(model=mpath, row=row, dataset=ds,
                                       dim=stats["dim"],
                                       fpr95=stats["fpr95"],
                                       auc=stats["auc"])
        return records

    @staticmethod
    def pr_rank(records: List[dict], top_k: int = 10) -> List[dict]:
        """Rank models by mean FPR95 over datasets, requiring presence on
        all datasets (reference: 06-pr-top.sh:20-46) — programmatic instead
        of sed/awk, and no by-hand final pick."""
        datasets = sorted({r["dataset"] for r in records})
        by_model: Dict[Tuple[str, int], Dict[str, dict]] = {}
        for r in records:
            by_model.setdefault((r["model"], r["row"]), {})[r["dataset"]] = r
        ranked = []
        for (model, row), per_ds in by_model.items():
            if set(per_ds) != set(datasets):
                continue
            fprs = [per_ds[d]["fpr95"] for d in datasets]
            ranked.append(dict(
                model=model, row=row,
                mean_fpr95=float(np.mean(fprs)),
                per_dataset={d: per_ds[d]["fpr95"] for d in datasets},
                dim=per_ds[datasets[0]]["dim"],
            ))
        ranked.sort(key=lambda r: r["mean_fpr95"])
        return ranked[:top_k]

    # -- stage 7: unprojected difference vectors --------------------------

    def compunproj(self, ds: str, pr_ref: str) -> str:
        """Signed truncated-descriptor differences for the selected filters
        (reference: 07-compunproj.sh, src/comp-uprjdists.cpp)."""
        pr_path, row = parse_model_ref(pr_ref)
        with ArtifactStore(pr_path, "r") as st:
            hist = st.read("w")
        row = row if row >= 0 else hist.shape[0] - 1
        w = hist[row]
        pr_label = os.path.basename(pr_path).replace(".h5", "")
        out = self.path("distances", f"{ds}-{pr_label}#{row}-unproj.h5")
        sel = select_pr_filters(self.load_filters(), w)
        n_dim = sel.shape[0] * self.desc_cfg.n_angle_bins

        with ArtifactStore(self.path("dataset", f"{ds}.h5"), "r") as st:
            indices = st.read("Indices")
            patches = st.read("Patches")
        n_pairs = indices.shape[0]
        if os.path.exists(out):
            st = _open_if_sound(out)
            if st is not None:
                with st:
                    if (st.exists("Distance")
                            and st.shape("Distance") == (n_pairs, n_dim)
                            and st.get_meta("complete", False)):
                        return out

        sel_j = jnp.asarray(sel)
        labels = pair_labels(indices)
        bar = self._bar()
        blk = self.pair_block
        with ArtifactStore(out, "w") as st:
            st.write("Label", labels.reshape(-1, 1))
            st.create("Distance", (n_pairs, n_dim), np.float32,
                      compression=self.dist_compression)
            for s in range(0, n_pairs, blk):
                e = min(s + blk, n_pairs)
                pt1 = batch_patch_transform(
                    jnp.asarray(patches[indices[s:e, 0]]), self.desc_cfg)
                pt2 = batch_patch_transform(
                    jnp.asarray(patches[indices[s:e, 2]]), self.desc_cfg)
                d = np.asarray(unprojected_diffs(
                    sel_j, pt1, pt2, precision=self.desc_cfg.precision))
                if not np.all(np.isfinite(d)):
                    raise FloatingPointError(
                        f"unproj Distance NaN/Inf in rows [{s}, {e})"
                    )  # reference: src/comp-uprjdists.cpp:341-345
                st.write_rows("Distance", s, d)
                if bar:
                    bar.update(e / n_pairs)
            if bar:
                bar.done()
            st.set_meta("pr_ref", f"{pr_path}#{row}")
            st.set_meta("complete", True)
        return out

    # -- stage 8: PJ learning ---------------------------------------------

    def pjlearn(self, unproj_path: str, cfg: PJLearnConfig,
                run_label: Optional[str] = None,
                _stop_after_logs: Optional[int] = None) -> str:
        """One PJ RDA run -> pj-learn/{label}-{mu}-{gamma}-pj.h5 holding the
        best W, A (reference: 08-pjlearn.sh, src/pj-learn.cpp)."""
        if run_label is None:
            run_label = os.path.basename(unproj_path).replace("-unproj.h5", "")
        from ..models.pj_rda import PJState
        from ..utils.checkpoint import load_solver_state, save_solver_state

        run = f"{run_label}-{cfg.mu}-{cfg.gamma}-pj"
        out = self.path("pj-learn", f"{run}.h5")
        log_path = self.path("pj-learn", "logging", f"{run}.jsonl")
        marker = f"{cfg.n_iter}"
        resume = None
        resume_meta = {}
        if is_primary() and os.path.exists(out):  # see prlearn note
            st = _open_if_sound(out)
            if st is not None:
                with st:
                    if st.get_meta("done_iters") == marker:
                        return out
                    # mid-run snapshot? resume instead of restarting (the
                    # reference restarts a crashed pj-learn from zero,
                    # 08-pjlearn.sh:18-21)
                    resume = load_solver_state(st, PJState)
                    resume_meta = st.get_meta("solver_state_meta") or {}
            if resume is None:
                os.remove(out)

        data = self._load_split(unproj_path, cfg.train_frac, cfg.seed)
        check_device_budget(
            {k: nbytes(v) for k, v in data.items()}, f"pjlearn[{run}]")
        splits = {k: jnp.asarray(v) for k, v in data.items()}
        del data
        pos_trn, neg_trn = splits["pos_trn"], splits["neg_trn"]
        pos_val, neg_val = splits["pos_val"], splits["neg_val"]

        mu_j = jnp.float32(cfg.mu)
        n_logs = max(1, cfg.n_iter // cfg.log_step)
        done_logs = 0
        obj_best, auc_best, fpr95_best = np.inf, 0.0, np.inf
        w_save = a_save = None
        if resume is not None:
            state, key = resume
            done_logs = int(resume_meta.get("completed_logs", 0))
            obj_best = float(resume_meta.get("obj_best", np.inf))
            auc_best = float(resume_meta.get("auc_best", 0.0))
            fpr95_best = float(resume_meta.get("fpr95_best", np.inf))
        else:
            state = pj_init(pos_trn.shape[1], cfg.rank_cap)
            key = jax.random.PRNGKey(cfg.seed)

        with MetricLogger(jsonl_path=log_path if is_primary() else None) \
                as log, writer_store(out, "a") as st:
            if resume is not None and st.exists("best_W"):
                w_save = st.read("best_W")
                a_save = st.read("best_A")
            t_train0 = time.perf_counter()
            for li in range(done_logs, n_logs):
                key, sub = jax.random.split(key)
                state = pj_train_chunk(pos_trn, neg_trn, cfg.mu, cfg.gamma,
                                       state, sub, batch=cfg.batch,
                                       n_steps=cfg.log_step,
                                       eigh_mode=cfg.eigh_mode,
                                       subspace_steps=cfg.subspace_steps,
                                       ns_iters=cfg.ns_iters)
                jax.block_until_ready(state.w)
                t_train = time.perf_counter() - t_train0
                t_val0 = time.perf_counter()
                loss, regul, obj, rank = pj_validate(pos_val, neg_val, mu_j,
                                                     state)
                obj0 = float(obj)
                if not np.isfinite(obj0):
                    raise FloatingPointError(
                        f"pjlearn[{run}]: non-finite objective {obj0} at "
                        f"iter {int(state.t)} (loss={float(loss)}, "
                        f"regul={float(regul)})")
                t_val = time.perf_counter() - t_val0
                improved = obj0 < obj_best
                if improved:
                    obj_best = obj0
                log.pj_step(best=improved, t=int(state.t), loss=float(loss),
                            regul=float(regul), obj=obj0, obj_best=obj_best,
                            rank=int(rank), rank_best=int(rank),
                            ttime=t_train, vtime=t_val)
                if improved:
                    # full-dataset stats + dual best criterion
                    # (reference: src/pj-learn.cpp:551-566)
                    w_np = np.asarray(state.w)
                    stats = compute_pj_stats_splits(splits, w_np)
                    saved = (auc_best <= stats["auc"]
                             and fpr95_best >= stats["fpr95"])
                    if saved:
                        auc_best = stats["auc"]
                        fpr95_best = stats["fpr95"]
                        w_save = w_np[np.any(w_np != 0.0, axis=1)]
                        a_save = np.asarray(state.a)
                        st.write("best_W", w_save)
                        st.write("best_A", a_save)
                    log.pj_stat(dim=stats["dim"], auc=stats["auc"],
                                auc_best=auc_best, fpr95=stats["fpr95"],
                                fpr95_best=fpr95_best, saved=saved)
                save_solver_state(st, state, key,
                                  extra={"completed_logs": li + 1,
                                         "obj_best": obj_best,
                                         "auc_best": auc_best,
                                         "fpr95_best": fpr95_best})
                if _stop_after_logs is not None and li + 1 >= _stop_after_logs:
                    from ..utils.checkpoint import RunInterrupted

                    raise RunInterrupted(f"stopped after log {li + 1}")
                t_train0 = time.perf_counter()
            if w_save is None:
                w_save = np.asarray(state.w)[
                    np.any(np.asarray(state.w) != 0.0, axis=1)]
                a_save = np.asarray(state.a)
            st.write("W", w_save)
            st.write("A", a_save)
            st.set_meta("done_iters", marker)
            st.set_meta("config", vars(cfg))
            st.set_meta("best", {"auc": float(auc_best),
                                 "fpr95": float(fpr95_best)})
        return out

    # -- stage 9/10: PJ model selection -----------------------------------

    def pjstats(self, model_paths: Sequence[str],
                unproj_paths: Dict[str, str],
                jsonl_path: Optional[str] = None) -> List[dict]:
        """Cross-evaluate every PJ model on every dataset's unprojected
        diff matrix (the evaluation 09-pjstats.sh only approximates by
        scraping per-run train logs; this is the real train-on-A/test-on-B
        pass, mirroring prstats)."""
        records = []
        with MetricLogger(jsonl_path=jsonl_path) as log:
            for ds, upath in unproj_paths.items():
                with ArtifactStore(upath, "r") as st:
                    labels = st.read("Label").reshape(-1)
                    diffs = st.read("Distance")
                diffs_j = jnp.asarray(diffs)
                labels_j = jnp.asarray(labels)
                for mpath in model_paths:
                    with ArtifactStore(mpath, "r") as st:
                        w_proj = st.read("W")
                    if w_proj.shape[1] != diffs.shape[1]:
                        continue  # different PR selection; not comparable
                    stats = compute_pj_stats(diffs_j, labels_j, w_proj)
                    rec = dict(model=mpath, dataset=ds, **stats)
                    records.append(rec)
                    log.model_stat(model=mpath, row=0, dataset=ds,
                                   dim=stats["dim"], fpr95=stats["fpr95"],
                                   auc=stats["auc"])
        return records

    @staticmethod
    def pj_rank_cross(records: List[dict], max_dim: int,
                      top_k: int = 10) -> List[dict]:
        """Rank PJ models by mean FPR95 across datasets under a dim cap
        (the programmatic replacement of 10-pj-top.sh)."""
        datasets = sorted({r["dataset"] for r in records})
        by_model: Dict[str, Dict[str, dict]] = {}
        for r in records:
            by_model.setdefault(r["model"], {})[r["dataset"]] = r
        ranked = []
        for model, per_ds in by_model.items():
            if set(per_ds) != set(datasets):
                continue
            if any(p["dim"] > max_dim or p["dim"] == 0
                   for p in per_ds.values()):
                continue
            fprs = [per_ds[d]["fpr95"] for d in datasets]
            ranked.append(dict(
                model=model, mean_fpr95=float(np.mean(fprs)),
                per_dataset={d: per_ds[d]["fpr95"] for d in datasets},
                dim=max(p["dim"] for p in per_ds.values())))
        ranked.sort(key=lambda r: r["mean_fpr95"])
        return ranked[:top_k]

    @staticmethod
    def pj_rank(model_paths: Sequence[str], max_dim: int,
                top_k: int = 10) -> List[dict]:
        """Rank PJ runs by saved best FPR95 under a dim cap
        (reference: 09-pjstats.sh / 10-pj-top.sh log scraping)."""
        rows = []
        for p in model_paths:
            with ArtifactStore(p, "r") as st:
                best = st.get_meta("best", {})
                dim = st.shape("W")[0] if st.exists("W") else 0
            if dim and dim <= max_dim and best:
                rows.append(dict(model=p, dim=dim, **best))
        rows.sort(key=lambda r: r["fpr95"])
        return rows[:top_k]

    # -- stage 11: export --------------------------------------------------

    def export(self, pr_ref: str, pj_path: str, out_name: str) -> str:
        from .export import export_opencv

        return export_opencv(self.genpr(), pr_ref, pj_path,
                             self.path("opencv", out_name))

    # -- the whole workflow in one call ------------------------------------

    def run_full(self, datasets: Sequence[str],
                 pr_cfg: Optional["PRLearnConfig"] = None,
                 pj_cfg: Optional[PJLearnConfig] = None,
                 pr_grid=None, pj_grid=None,
                 export_dims: Sequence[int] = (48, 64, 80, 120),
                 pj_datasets: Optional[Sequence[str]] = None,
                 pr_ckpt_every: int = 1,
                 pj_ckpt_every: int = 1) -> dict:
        """Stages 2-11 end-to-end with automatic model selection.

        Replaces the reference's 11-script chain *including* the by-hand
        winner pick (workspace/README.md:25-27): PR sweep per dataset ->
        cross-dataset ranking -> unprojected diffs for the winner on
        EVERY dataset -> PJ sweep -> cross-dataset PJ ranking
        (pjstats + pj_rank_cross, the real train-on-A/test-on-B pass the
        reference's 09-pjstats.sh only approximates by log scraping) ->
        per-dim-cap export. Datasets must already be converted (stage 1
        needs the raw patch directories).

        ``pj_datasets``: subset whose unproj sets train the PJ grid
        (default: all). Every dataset still gets unproj diffs and enters
        the cross-dataset PJ evaluation — the trained-on subset only
        bounds sweep cost (reference scale: one 45-combo grid is ~47 min
        of chip; the reference's own published exports train each PJ on
        ONE unproj set and rank across datasets, 08-pjlearn.sh).

        Returns per-stage wall-clock in ``stage_seconds`` alongside the
        selection results.
        """
        from ..parallel.sweep import run_pj_sweep, run_pr_sweep
        from ..utils.configs import PJSweepGrid, PRSweepGrid

        pr_cfg = pr_cfg or PRLearnConfig()
        # grid default is psd_ns since the round-4 reference-budget soak
        # (bench pj_soak: per-combo rank/FPR95/AUC parity vs exact over
        # the full 50k iterations); single runs (Workspace.pjlearn) keep
        # the reference-semantics "exact" default
        pj_cfg = pj_cfg or PJLearnConfig(eigh_mode="psd_ns")
        pr_grid = pr_grid or PRSweepGrid()
        pj_grid = pj_grid or PJSweepGrid()
        pj_datasets = list(pj_datasets or datasets)

        stage_seconds: Dict[str, float] = {}

        def timed(name, fn, *args, **kw):
            t0 = time.perf_counter()
            out = fn(*args, **kw)
            stage_seconds[name] = round(
                stage_seconds.get(name, 0.0)
                + time.perf_counter() - t0, 3)
            return out

        timed("02_genpr", self.genpr)
        dist_paths = {ds: timed(f"03_compdist[{ds}]", self.compdist, ds)
                      for ds in datasets}

        models = []
        for ds in datasets:
            timed(f"04_prsweep[{ds}]", run_pr_sweep, self, ds,
                  pr_grid, pr_cfg, ckpt_every=pr_ckpt_every)
            models.extend(
                sorted(set(
                    os.path.join(self.root, "pr-learn", f)
                    for f in os.listdir(os.path.join(self.root, "pr-learn"))
                    if f.startswith(f"{ds}-") and f.endswith("-pr.h5"))))
        records = timed("05_prstats", self.prstats, models, dist_paths,
                        jsonl_path=self.path("pr-select.jsonl"))
        ranked = self.pr_rank(records)
        if not ranked:
            raise RuntimeError("no PR model ranked on all datasets")
        best_pr = ranked[0]
        pr_ref = f"{best_pr['model']}#{best_pr['row']}"

        unproj_paths = {ds: timed(f"07_compunproj[{ds}]",
                                  self.compunproj, ds, pr_ref)
                        for ds in datasets}
        pj_models = []
        for ds in pj_datasets:
            pj_models.extend(
                timed(f"08_pjsweep[{ds}]", run_pj_sweep, self,
                      unproj_paths[ds], pj_grid, pj_cfg,
                      ckpt_every=pj_ckpt_every))

        pj_records = timed(
            "09_pjstats", self.pjstats,
            [m["model"] for m in pj_models], unproj_paths,
            jsonl_path=self.path("pj-select.jsonl"))

        exports = {}
        pj_ranked = {}
        for dim in export_dims:
            ranked_dim = self.pj_rank_cross(pj_records, max_dim=dim)
            if not ranked_dim:
                continue
            winner = ranked_dim[0]
            pj_ranked[dim] = winner
            exports[dim] = timed(
                f"11_export[{dim}]", self.export,
                pr_ref, winner["model"], f"vgg_generated_{dim}.i")
        return dict(best_pr=best_pr, pr_ref=pr_ref, pj_models=pj_models,
                    pj_records=pj_records, pj_ranked=pj_ranked,
                    exports=exports, stage_seconds=stage_seconds)
