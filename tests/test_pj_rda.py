"""PJ RDA solver: PSD projection invariants + convergence on synthetic data."""

import numpy as np

import jax
import jax.numpy as jnp

from opencv_dlco_tpu.models.pj_rda import (
    pj_init,
    pj_train,
    pj_train_chunk,
    pj_validate,
)
from opencv_dlco_tpu.models.select import pj_model_distances
from opencv_dlco_tpu.ops.roc import roc_stats
from opencv_dlco_tpu.utils.configs import PJLearnConfig

from synth import split_train_val, synth_pj_dataset


def test_psd_invariants(rng):
    pos, neg, _ = synth_pj_dataset(rng, n_pos=300, n_neg=300, n_feat=32)
    state = pj_train_chunk(jnp.asarray(pos), jnp.asarray(neg), 0.001, 0.5,
                           pj_init(32), jax.random.PRNGKey(0),
                           batch=64, n_steps=5)
    a = np.asarray(state.a)
    w = np.asarray(state.w)
    # A symmetric PSD
    np.testing.assert_allclose(a, a.T, atol=1e-5)
    evs = np.linalg.eigvalsh(a.astype(np.float64))
    assert evs.min() > -1e-4
    # A == W^T W (the PSD projection identity)
    np.testing.assert_allclose(a, w.T @ w, atol=5e-4)


def test_convergence_on_synthetic(rng):
    pos, neg, _ = synth_pj_dataset(rng)
    pos_trn, pos_val = split_train_val(pos)
    neg_trn, neg_val = split_train_val(neg)
    cfg = PJLearnConfig(mu=0.002, gamma=0.5, n_iter=200, log_step=50, batch=100)
    w_best, history = pj_train(
        jnp.asarray(pos_trn), jnp.asarray(neg_trn),
        jnp.asarray(pos_val), jnp.asarray(neg_val), cfg,
    )
    assert history[-1]["obj_best"] < history[0]["obj"]
    rank = int(np.sum(np.any(w_best != 0.0, axis=1)))
    assert 0 < rank < pos.shape[1], f"rank {rank} not low"
    # learned metric separates validation pairs
    dists = np.asarray(
        pj_model_distances(
            jnp.asarray(w_best),
            jnp.asarray(np.concatenate([pos_val, neg_val])),
        )
    )
    labels = np.concatenate([np.ones(len(pos_val)), np.zeros(len(neg_val))])
    fpr95, auc = roc_stats(jnp.asarray(dists), jnp.asarray(labels))
    assert float(auc) > 0.9
    assert float(fpr95) < 0.5


def test_subspace_mode_tracks_exact(rng):
    pos, neg, _ = synth_pj_dataset(rng, n_pos=400, n_neg=400, n_feat=32)
    key = jax.random.PRNGKey(7)
    exact = pj_train_chunk(jnp.asarray(pos), jnp.asarray(neg), 0.002, 0.5,
                           pj_init(32), key, batch=64, n_steps=30,
                           eigh_mode="exact")
    sub = pj_train_chunk(jnp.asarray(pos), jnp.asarray(neg), 0.002, 0.5,
                         pj_init(32), key, batch=64, n_steps=30,
                         eigh_mode="subspace", subspace_steps=6)
    # the PSD-projected metric should be close in the quadratic-form sense
    a1 = np.asarray(exact.a, dtype=np.float64)
    a2 = np.asarray(sub.a, dtype=np.float64)
    rel = np.linalg.norm(a1 - a2) / (np.linalg.norm(a1) + 1e-12)
    assert rel < 0.15, f"subspace drifted {rel:.3f} from exact"


def test_psd_ns_tracks_exact(rng):
    """Newton-Schulz PSD-projection mode vs exact eigh (VERDICT r2 next #6).

    Same key -> same sampled batches; the ONLY divergence channel is
    violator masks computed from the NS-projected metric instead of the
    eigh-projected one. The chunk-boundary state must be near-identical in
    the quadratic-form sense AND satisfy every exact-mode invariant
    (A = W^T W, PSD), because pj_train_chunk re-factorises from df_avg."""
    pos, neg, _ = synth_pj_dataset(rng, n_pos=400, n_neg=400, n_feat=32)
    key = jax.random.PRNGKey(7)
    exact = pj_train_chunk(jnp.asarray(pos), jnp.asarray(neg), 0.002, 0.5,
                           pj_init(32), key, batch=64, n_steps=30,
                           eigh_mode="exact")
    ns = pj_train_chunk(jnp.asarray(pos), jnp.asarray(neg), 0.002, 0.5,
                        pj_init(32), key, batch=64, n_steps=30,
                        eigh_mode="psd_ns")
    a1 = np.asarray(exact.a, dtype=np.float64)
    a2 = np.asarray(ns.a, dtype=np.float64)
    rel = np.linalg.norm(a1 - a2) / (np.linalg.norm(a1) + 1e-12)
    assert rel < 0.05, f"psd_ns drifted {rel:.4f} from exact"
    # chunk-boundary invariants: true factorisation, PSD, symmetric
    a = np.asarray(ns.a)
    w = np.asarray(ns.w)
    np.testing.assert_allclose(a, a.T, atol=1e-5)
    np.testing.assert_allclose(a, w.T @ w, atol=5e-4)
    assert np.linalg.eigvalsh(a.astype(np.float64)).min() > -1e-4
    assert int(ns.t) == int(exact.t)


def test_psd_ns_projection_accuracy(rng):
    """The NS projection itself: A+ from Newton-Schulz vs eigh clamp, on a
    matrix with a realistic RDA spectrum (large negatives, few positives,
    a near-zero cluster)."""
    from opencv_dlco_tpu.models.pj_rda import _psd_newton_schulz

    f = 96
    q, _ = np.linalg.qr(rng.normal(size=(f, f)))
    lam = np.concatenate([
        rng.uniform(0.5, 3.0, 8),            # the surviving rank
        rng.uniform(-4.0, -0.2, f - 16),     # trace-norm-killed directions
        rng.uniform(-1e-4, 1e-4, 8),         # the hard near-zero cluster
    ])
    a = (q * lam) @ q.T
    a = 0.5 * (a + a.T)
    ref = (q * np.maximum(lam, 0.0)) @ q.T
    got = np.asarray(_psd_newton_schulz(jnp.asarray(a, jnp.float32), 24),
                     dtype=np.float64)
    err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert err < 1e-3, f"NS projection rel err {err:.2e}"


def test_psd_ns_full_run_quality_parity(rng):
    """psd_ns end-to-end at the full reference iteration count: final rank
    and validation quality must match exact (same acceptance as the
    rank-cap study below)."""
    pos, neg, _ = synth_pj_dataset(rng, n_pos=1500, n_neg=1500, n_feat=64)
    pos_trn, pos_val = split_train_val(pos)
    neg_trn, neg_val = split_train_val(neg)
    args = (jnp.asarray(pos_trn), jnp.asarray(neg_trn),
            jnp.asarray(pos_val), jnp.asarray(neg_val))

    results = {}
    for mode in ("exact", "psd_ns"):
        cfg = PJLearnConfig(mu=0.002, gamma=0.5, n_iter=50_000,
                            log_step=10_000, batch=64, eigh_mode=mode)
        w_best, history = pj_train(*args, cfg)
        rank = int(np.sum(np.any(w_best != 0.0, axis=1)))
        dists = np.asarray(pj_model_distances(
            jnp.asarray(w_best),
            jnp.asarray(np.concatenate([pos_val, neg_val]))))
        labels = np.concatenate([np.ones(len(pos_val)),
                                 np.zeros(len(neg_val))])
        fpr95, auc = roc_stats(jnp.asarray(dists), jnp.asarray(labels))
        results[mode] = dict(rank=rank, fpr95=float(fpr95), auc=float(auc),
                             obj=history[-1]["obj_best"])

    ex, ns = results["exact"], results["psd_ns"]
    assert abs(ex["rank"] - ns["rank"]) <= 2, results
    assert abs(ex["fpr95"] - ns["fpr95"]) <= 0.02, results
    assert abs(ex["auc"] - ns["auc"]) <= 0.005, results
    assert abs(ex["obj"] - ns["obj"]) / max(ex["obj"], 1e-9) < 0.05, results


def test_rank_cap_full_run_quality_parity(rng):
    """Low-rank tracking end-to-end at the FULL reference iteration count.

    VERDICT r1 next-step #6: run the complete n_iter=50,000 schedule (the
    reference's pj-learn budget, src/pj-learn.cpp) exact vs rank-capped
    subspace and require the final model quality to agree — final rank
    equal (to +-2) and validation FPR95/AUC within noise. Dimension is
    reduced (F=64) so the exact-eigh arm stays CPU-feasible; the cap/rank
    ratio (24/64) is HARSHER than production (192/544 vs true rank <=168).
    """
    pos, neg, _ = synth_pj_dataset(rng, n_pos=1500, n_neg=1500, n_feat=64)
    pos_trn, pos_val = split_train_val(pos)
    neg_trn, neg_val = split_train_val(neg)
    args = (jnp.asarray(pos_trn), jnp.asarray(neg_trn),
            jnp.asarray(pos_val), jnp.asarray(neg_val))

    results = {}
    for mode, cap in (("exact", None), ("subspace", 24)):
        cfg = PJLearnConfig(mu=0.002, gamma=0.5, n_iter=50_000,
                            log_step=10_000, batch=64, eigh_mode=mode,
                            subspace_steps=4, rank_cap=cap)
        w_best, history = pj_train(*args, cfg)
        rank = int(np.sum(np.any(w_best != 0.0, axis=1)))
        dists = np.asarray(pj_model_distances(
            jnp.asarray(w_best),
            jnp.asarray(np.concatenate([pos_val, neg_val]))))
        labels = np.concatenate([np.ones(len(pos_val)),
                                 np.zeros(len(neg_val))])
        fpr95, auc = roc_stats(jnp.asarray(dists), jnp.asarray(labels))
        results[mode] = dict(rank=rank, fpr95=float(fpr95), auc=float(auc),
                             obj=history[-1]["obj_best"])

    ex, sub = results["exact"], results["subspace"]
    assert sub["rank"] <= 24, sub
    assert abs(ex["rank"] - sub["rank"]) <= 2, results
    assert abs(ex["fpr95"] - sub["fpr95"]) <= 0.02, results
    assert abs(ex["auc"] - sub["auc"]) <= 0.005, results
    assert abs(ex["obj"] - sub["obj"]) / max(ex["obj"], 1e-9) < 0.05, results


def test_validate_metrics(rng):
    pos, neg, _ = synth_pj_dataset(rng, n_pos=200, n_neg=200, n_feat=16)
    w = np.eye(16, dtype=np.float32)
    state = pj_init(16)._replace(w=jnp.asarray(w), a=jnp.asarray(w @ w.T))
    loss, regul, obj, rank = pj_validate(jnp.asarray(pos), jnp.asarray(neg),
                                         jnp.float32(0.01), state)
    np.testing.assert_allclose(float(regul), 0.01 * 16, rtol=1e-6)
    assert int(rank) == 16
    # identity projection distances == raw squared norms; check hinge by hand
    pd = (pos.astype(np.float64) ** 2).sum(1)
    nd = (neg.astype(np.float64) ** 2).sum(1)
    ref = np.maximum(pd[:, None] + 1 - nd[None, :], 0).sum() / (200 * 200)
    np.testing.assert_allclose(float(loss), ref, rtol=1e-4)
