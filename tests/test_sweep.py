"""Sweep engine: grid-as-one-program equivalence and artifact layout."""

import numpy as np
import pytest

from opencv_dlco_tpu.data.store import ArtifactStore
from opencv_dlco_tpu.data.synthetic import synth_patch_pairs
from opencv_dlco_tpu.parallel.sweep import run_pr_sweep
from opencv_dlco_tpu.pipeline.stages import Workspace
from opencv_dlco_tpu.utils.configs import PoolRegionConfig, PRLearnConfig, PRSweepGrid


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sweep_ws"))
    w = Workspace(root,
                  pool_cfg=PoolRegionConfig(nr=6, nphi=2, nsigma=3),
                  pair_block=64, progress=False)
    rng = np.random.default_rng(123)
    p1, p2, labels = synth_patch_pairs(rng, n_pairs=160)
    n = len(labels)
    patches = np.concatenate([p1, p2])
    indices = np.zeros((n, 4), np.int32)
    indices[:, 0] = np.arange(n)
    indices[:, 2] = np.arange(n) + n
    indices[:, 1] = np.arange(n)
    indices[:, 3] = np.where(labels == 1, np.arange(n), np.arange(n) + n)
    with ArtifactStore(w.path("dataset", "sy.h5"), "w") as st:
        st.write("Indices", indices)
        st.write("Patches", patches, chunk_rows=256)
    w.compdist("sy")
    return w


def test_pr_sweep_grid(ws):
    grid = PRSweepGrid(mus=(0.005, 0.02), gammas=(0.05, 0.2))
    base = PRLearnConfig(n_iter=4000, log_step=2000, batch=128,
                         max_dim=10_000)
    results = run_pr_sweep(ws, "sy", grid, base)
    assert len(results) == 4
    assert results[0]["obj"] <= results[-1]["obj"]
    # every combo produced its own artifact with a w history
    for r in results:
        with ArtifactStore(r["model"], "r") as st:
            assert st.get_meta("done_iters") == "4000"
            if st.exists("w"):
                hist = st.read("w")
                assert hist.shape[1] == ws.pool_cfg.n_rings
                assert np.all(hist >= 0)


def test_sweep_entry_matches_single_run(ws):
    """A sweep containing one combo == a single-run prlearn trajectory in
    objective terms (same data, same seed, same batch schedule)."""
    import jax
    import jax.numpy as jnp

    from opencv_dlco_tpu.models.pr_rda import pr_init, pr_train_chunk

    data = ws._load_split(ws.path("distances", "sy-dist.h5"), 0.8, 2215)
    pos = jnp.asarray(data["pos_trn"])
    neg = jnp.asarray(data["neg_trn"])
    key = jax.random.PRNGKey(2215)
    single = pr_train_chunk(pos, neg,
                            jnp.asarray([0.01], jnp.float32),
                            jnp.asarray([0.1], jnp.float32),
                            pr_init(pos.shape[1], 1), key,
                            batch=128, n_steps=10)
    multi = pr_train_chunk(pos, neg,
                           jnp.asarray([0.02, 0.01], jnp.float32),
                           jnp.asarray([0.3, 0.1], jnp.float32),
                           pr_init(pos.shape[1], 2), key,
                           batch=128, n_steps=10)
    np.testing.assert_allclose(np.asarray(single.w[0]),
                               np.asarray(multi.w[1]), rtol=1e-5, atol=1e-7)


def test_pj_sweep_batched(ws):
    """The vmapped PJ grid produces per-combo artifacts with stats."""
    from opencv_dlco_tpu.parallel.sweep import run_pj_sweep
    from opencv_dlco_tpu.pipeline.stages import Workspace
    from opencv_dlco_tpu.utils.configs import (
        PJLearnConfig,
        PJSweepGrid,
        PRLearnConfig,
    )
    from opencv_dlco_tpu.data.store import ArtifactStore

    cfg = PRLearnConfig(mu=0.01, gamma=0.1, n_iter=4000, log_step=2000,
                        batch=128, max_dim=10_000)
    pr = ws.prlearn("sy", cfg)
    unproj = ws.compunproj("sy", f"{pr}#-1")
    grid = PJSweepGrid(mus=(0.001, 0.002), gammas=(0.25, 0.5))
    base = PJLearnConfig(n_iter=40, log_step=20, batch=64)
    results = run_pj_sweep(ws, unproj, grid, base)
    assert len(results) == 4
    for r in results:
        assert 0 <= r["fpr95"] <= 1
        with ArtifactStore(r["model"], "r") as st:
            w = st.read("W")
            assert w.shape[0] == r["dim"]
            assert st.get_meta("best")["fpr95"] == r["fpr95"]
    # sorted ascending by fpr95
    fprs = [r["fpr95"] for r in results]
    assert fprs == sorted(fprs)
