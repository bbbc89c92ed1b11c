"""End-to-end pipeline on a tiny synthetic workspace.

Runs every stage of the 11-stage workflow (convert -> genpr -> compdist ->
prlearn -> prstats/rank -> compunproj -> pjlearn -> rank -> export) on a
small generated dataset — the small-N integration test SURVEY.md §4 calls
for, standing in for the absent Brown data.
"""

import os

import numpy as np
import pytest

from opencv_dlco_tpu.data.store import ArtifactStore
from opencv_dlco_tpu.data.synthetic import synth_patch_pairs
from opencv_dlco_tpu.pipeline.export import parse_vgg_header
from opencv_dlco_tpu.pipeline.stages import Workspace
from opencv_dlco_tpu.utils.configs import (
    PJLearnConfig,
    PoolRegionConfig,
    PRLearnConfig,
)


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ws"))
    w = Workspace(
        root,
        pool_cfg=PoolRegionConfig(patch_size=64, nr=6, nphi=2, nsigma=3),
        pair_block=64,
        progress=False,
    )
    # synthetic "Brown" dataset: pairs of patches + labels via 3D point ids
    rng = np.random.default_rng(99)
    p1, p2, labels = synth_patch_pairs(rng, n_pairs=192)
    n = len(labels)
    patches = np.concatenate([p1, p2])
    indices = np.zeros((n, 4), np.int32)
    indices[:, 0] = np.arange(n)
    indices[:, 2] = np.arange(n) + n
    indices[:, 1] = np.arange(n)
    # same point id iff positive pair
    indices[:, 3] = np.where(labels == 1, np.arange(n), np.arange(n) + n)
    with ArtifactStore(w.path("dataset", "synth.h5"), "w") as st:
        st.write("Indices", indices)
        st.write("Patches", patches, chunk_rows=256)
    return w


def test_stage2_genpr(ws):
    path = ws.genpr()
    with ArtifactStore(path, "r") as st:
        assert st.shape("PRFilters") == (ws.pool_cfg.n_filters, 64, 64)
        assert st.shape("RingParams") == (ws.pool_cfg.n_rings, 3)
    # idempotent
    assert ws.genpr() == path


def test_stage3_compdist(ws):
    path = ws.compdist("synth")
    with ArtifactStore(path, "r") as st:
        d = st.read("Distance")
        lab = st.read("Label").reshape(-1)
    assert d.shape == (192, ws.pool_cfg.n_rings)
    assert np.all(np.isfinite(d))
    assert d.min() >= 0
    # positives (shifted copies) should have smaller ring distances on average
    assert d[lab == 1].mean() < d[lab == 0].mean()
    # resume is a no-op
    assert ws.compdist("synth") == path


def test_stage4_prlearn_and_ranking(ws):
    ws.compdist("synth")
    cfg = PRLearnConfig(mu=0.01, gamma=0.1, n_iter=6000, log_step=2000,
                        batch=128, max_dim=10_000)
    path = ws.prlearn("synth", cfg)
    with ArtifactStore(path, "r") as st:
        hist = st.read("w")
        assert st.get_meta("done_iters") == "6000"
    assert hist.shape[0] >= 1
    assert hist.shape[1] == ws.pool_cfg.n_rings
    assert np.all(hist >= 0)
    # resume skips
    assert ws.prlearn("synth", cfg) == path

    records = ws.prstats([path], {"synth": ws.path("distances", "synth-dist.h5")})
    assert len(records) == hist.shape[0]
    assert all(r["fpr95"] is not None for r in records)
    ranked = Workspace.pr_rank(records)
    assert ranked and ranked[0]["mean_fpr95"] <= ranked[-1]["mean_fpr95"]


def test_stage7_to_11_pj_and_export(ws):
    ws.compdist("synth")
    cfg = PRLearnConfig(mu=0.01, gamma=0.1, n_iter=6000, log_step=2000,
                        batch=128, max_dim=10_000)
    pr_path = ws.prlearn("synth", cfg)
    unproj = ws.compunproj("synth", f"{pr_path}#-1")
    with ArtifactStore(unproj, "r") as st:
        d = st.read("Distance")
        assert st.get_meta("complete")
    assert d.shape[0] == 192 and d.shape[1] % 8 == 0

    pj_cfg = PJLearnConfig(mu=0.001, gamma=0.5, n_iter=60, log_step=20,
                           batch=64)
    pj_path = ws.pjlearn(unproj, pj_cfg)
    with ArtifactStore(pj_path, "r") as st:
        w_proj = st.read("W")
        a = st.read("A")
    assert w_proj.shape[1] == d.shape[1]
    assert a.shape == (d.shape[1], d.shape[1])
    assert np.all(np.any(w_proj != 0.0, axis=1))  # only nonzero rows saved
    # resume skips
    assert ws.pjlearn(unproj, pj_cfg) == pj_path

    ranked = Workspace.pj_rank([pj_path], max_dim=d.shape[1])
    assert ranked and ranked[0]["model"] == pj_path

    out = ws.export(f"{pr_path}#-1", pj_path, "synth_generated.i")
    assert os.path.exists(out)
    mats = parse_vgg_header(open(out).read())
    assert mats["PJ"].shape == w_proj.shape
    sel_rows = mats["PR"].shape[0]
    assert mats["PJ"].shape[1] == sel_rows * 8


def test_pjstats_cross_eval(ws):
    """PJ cross-dataset stats + ranking (stage 9/10 full evaluation)."""
    from opencv_dlco_tpu.utils.configs import PJLearnConfig, PRLearnConfig

    cfg = PRLearnConfig(mu=0.01, gamma=0.1, n_iter=6000, log_step=2000,
                        batch=128, max_dim=10_000)
    pr_path = ws.prlearn("synth", cfg)
    unproj = ws.compunproj("synth", f"{pr_path}#-1")
    pj_cfg = PJLearnConfig(mu=0.001, gamma=0.5, n_iter=60, log_step=20,
                           batch=64)
    pj_path = ws.pjlearn(unproj, pj_cfg)
    records = ws.pjstats([pj_path], {"synth": unproj})
    assert len(records) == 1
    assert 0 <= records[0]["fpr95"] <= 1
    ranked = ws.pj_rank_cross(records, max_dim=10_000)
    assert ranked and ranked[0]["model"] == pj_path
