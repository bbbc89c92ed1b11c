"""One-call full workflow: stages 2-11 with automatic model selection."""

import os

import numpy as np
import pytest

from opencv_dlco_tpu.data.store import ArtifactStore
from opencv_dlco_tpu.data.synthetic import synth_patch_pairs
from opencv_dlco_tpu.pipeline.export import parse_vgg_header
from opencv_dlco_tpu.pipeline.stages import Workspace
from opencv_dlco_tpu.utils.configs import (
    PJLearnConfig,
    PJSweepGrid,
    PoolRegionConfig,
    PRLearnConfig,
    PRSweepGrid,
)


def _make_dataset(ws, name, seed):
    rng = np.random.default_rng(seed)
    p1, p2, labels = synth_patch_pairs(rng, n_pairs=160)
    n = len(labels)
    patches = np.concatenate([p1, p2])
    indices = np.zeros((n, 4), np.int32)
    indices[:, 0] = np.arange(n)
    indices[:, 2] = np.arange(n) + n
    indices[:, 1] = np.arange(n)
    indices[:, 3] = np.where(labels == 1, np.arange(n), np.arange(n) + n)
    with ArtifactStore(ws.path("dataset", f"{name}.h5"), "w") as st:
        st.write("Indices", indices)
        st.write("Patches", patches, chunk_rows=256)


def test_run_full_two_datasets(tmp_path):
    ws = Workspace(str(tmp_path),
                   pool_cfg=PoolRegionConfig(nr=6, nphi=2, nsigma=3),
                   pair_block=64, progress=False)
    _make_dataset(ws, "alpha", 1)
    _make_dataset(ws, "beta", 2)

    out = ws.run_full(
        ["alpha", "beta"],
        pr_cfg=PRLearnConfig(n_iter=4000, log_step=2000, batch=128,
                             max_dim=10_000),
        pj_cfg=PJLearnConfig(n_iter=40, log_step=20, batch=64),
        pr_grid=PRSweepGrid(mus=(0.005, 0.02), gammas=(0.05, 0.2)),
        pj_grid=PJSweepGrid(mus=(0.001,), gammas=(0.25, 0.5)),
        export_dims=(2048,),
    )
    assert out["best_pr"]["mean_fpr95"] <= 1.0
    assert "#" in out["pr_ref"]
    assert len(out["pj_models"]) == 4  # 2 datasets x 2 combos
    assert out["exports"], "no export produced"
    header = open(next(iter(out["exports"].values()))).read()
    mats = parse_vgg_header(header)
    assert mats["PJ"].shape[1] == mats["PR"].shape[0] * 8


def test_run_reference_scale_toy(tmp_path):
    """The one-command e2e driver (pipeline/e2e.py) at toy scale: dataset
    generation is chunked + idempotent, every stage is timed, winners are
    cross-dataset-ranked, exports round-trip, and the summary carries the
    synthetic-data honesty marker. The committed reference-scale artifact
    is pinned separately by tests/test_e2e_artifact.py."""
    from opencv_dlco_tpu.pipeline.e2e import (generate_synthetic_dataset,
                                              run_reference_scale)
    from opencv_dlco_tpu.utils.configs import PoolRegionConfig

    out = run_reference_scale(
        str(tmp_path), n_pairs=192,
        datasets={"tiny-a": 5, "tiny-b": 6},
        pr_iters=4000, pj_iters=40,
        pool_cfg=PoolRegionConfig(nr=6, nphi=2, nsigma=3),
        pr_overrides=dict(batch=128, log_step=2000, max_dim=10_000,
                          sampling="block", split_dtype="f32",
                          matmul_precision="highest"),
        pj_overrides=dict(log_step=20, batch=64),
        pr_grid=PRSweepGrid(mus=(0.005, 0.02), gammas=(0.05,)),
        pj_grid=PJSweepGrid(mus=(0.001,), gammas=(0.25, 0.5)),
        export_dims=(2048,),
        out_json=str(tmp_path / "E2E_FULL.json"),
        progress=False)
    assert out["synthetic"] is True
    assert set(out["best_pr"]["per_dataset"]) == {"tiny-a", "tiny-b"}
    times = out["stage_seconds"]
    assert times["01_generate[tiny-a]"] >= 0
    assert any(k.startswith("04_prsweep[") for k in times)
    assert any(k.startswith("08_pjsweep[") for k in times)
    assert out["exports"], "no export produced"
    for rec in out["exports"].values():
        assert rec["ok"]
    # cross-dataset PJ ranking: winner carries per-dataset FPR95
    for w in out["pj_winners"].values():
        assert set(w["per_dataset"]) == {"tiny-a", "tiny-b"}
    # dataset generation is idempotent: second call is a no-op skip
    ws_dataset = os.path.join(str(tmp_path), "dataset", "tiny-a.h5")
    mtime = os.path.getmtime(ws_dataset)
    from opencv_dlco_tpu.pipeline.stages import Workspace
    generate_synthetic_dataset(
        Workspace(str(tmp_path),
                  pool_cfg=PoolRegionConfig(nr=6, nphi=2, nsigma=3),
                  progress=False),
        "tiny-a", 5, n_pairs=192)
    assert os.path.getmtime(ws_dataset) == mtime
