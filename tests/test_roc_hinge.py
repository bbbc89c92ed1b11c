"""ROC stats and hinge-loss kernels vs numpy/cv2 oracles."""

import numpy as np

import jax.numpy as jnp

from opencv_dlco_tpu.ops.hinge import (
    hinge_sum_blockwise,
    hinge_sum_sorted,
)
from opencv_dlco_tpu.ops.roc import roc_stats

from oracles import hinge_oracle, roc_oracle


def _fake_scores(rng, n=5000, sep=1.0):
    labels = (rng.random(n) < 0.5).astype(np.uint8)
    dists = rng.normal(size=n).astype(np.float32) + sep * (1 - labels)
    return dists, labels


def test_roc_stats_vs_oracle(rng):
    dists, labels = _fake_scores(rng)
    fpr95, auc = roc_stats(jnp.asarray(dists), jnp.asarray(labels))
    ref_fpr95, ref_auc = roc_oracle(dists, labels)
    assert abs(float(fpr95) - ref_fpr95) < 2e-4
    assert abs(float(auc) - ref_auc) < 2e-4


def test_roc_stats_perfect_separation():
    dists = jnp.concatenate([jnp.zeros(100), jnp.ones(100)])
    labels = jnp.concatenate([jnp.ones(100, jnp.uint8), jnp.zeros(100, jnp.uint8)])
    fpr95, auc = roc_stats(dists, labels)
    assert float(fpr95) == 0.0
    assert abs(float(auc) - 1.0) < 1e-2  # polygon AUC of a step ROC


def test_hinge_sorted_vs_oracle(rng):
    pos = rng.normal(size=701).astype(np.float32)
    neg = rng.normal(size=1203).astype(np.float32) + 0.7
    ref = hinge_oracle(pos.astype(np.float64), neg.astype(np.float64))
    ours = float(hinge_sum_sorted(jnp.asarray(pos), jnp.asarray(neg)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_hinge_blockwise_vs_oracle(rng):
    pos = rng.normal(size=700).astype(np.float32)
    neg = rng.normal(size=4096).astype(np.float32) + 0.5
    ref = hinge_oracle(pos.astype(np.float64), neg.astype(np.float64))
    ours = float(
        hinge_sum_blockwise(jnp.asarray(pos), jnp.asarray(neg),
                            tile_p=256, tile_n=1024, interpret=True)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_hinge_methods_agree(rng):
    pos = (rng.normal(size=333) * 2).astype(np.float32)
    neg = (rng.normal(size=517) * 2).astype(np.float32)
    a = float(hinge_sum_sorted(jnp.asarray(pos), jnp.asarray(neg)))
    b = float(
        hinge_sum_blockwise(jnp.asarray(pos), jnp.asarray(neg),
                            tile_p=128, tile_n=256, interpret=True)
    )
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_hinge_zero_when_all_satisfied():
    pos = jnp.full((10,), -3.0)
    neg = jnp.zeros((10,))
    assert float(hinge_sum_sorted(pos, neg)) == 0.0
