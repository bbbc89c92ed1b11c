"""Blockwise kNN matcher vs a dense numpy oracle."""

import numpy as np

import jax.numpy as jnp

from opencv_dlco_tpu.ops.knn import (
    knn_match,
    mutual_nearest,
    pairwise_sq_dists,
    ratio_test,
)


def _dense_knn(q, t, k):
    d = ((q[:, None, :] - t[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=1)[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def test_pairwise_matches_dense(rng):
    q = rng.normal(size=(50, 16)).astype(np.float32)
    t = rng.normal(size=(70, 16)).astype(np.float32)
    d = np.asarray(pairwise_sq_dists(jnp.asarray(q), jnp.asarray(t)))
    ref = ((q[:, None, :] - t[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, ref, rtol=1e-4, atol=1e-4)


def test_knn_blockwise_matches_dense(rng):
    q = rng.normal(size=(128, 32)).astype(np.float32)
    t = rng.normal(size=(1000, 32)).astype(np.float32)  # not block-multiple
    d, i = knn_match(jnp.asarray(q), jnp.asarray(t), k=3, block=256)
    ref_d, ref_i = _dense_knn(q, t, 3)
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(d), ref_d, rtol=1e-3, atol=1e-3)


def test_knn_exact_padding_edge(rng):
    q = rng.normal(size=(16, 8)).astype(np.float32)
    t = rng.normal(size=(256, 8)).astype(np.float32)  # exact multiple
    d, i = knn_match(jnp.asarray(q), jnp.asarray(t), k=2, block=128)
    _, ref_i = _dense_knn(q, t, 2)
    np.testing.assert_array_equal(np.asarray(i), ref_i)


def test_ratio_test(rng):
    dists = jnp.asarray([[1.0, 10.0], [9.0, 10.0]])
    idx = jnp.asarray([[3, 4], [5, 6]], dtype=jnp.int32)
    m, ok = ratio_test(dists, idx, ratio=0.8)
    assert list(np.asarray(m)) == [3, -1]
    assert list(np.asarray(ok)) == [True, False]


def test_mutual_nearest(rng):
    t = rng.normal(size=(64, 16)).astype(np.float32)
    perm = rng.permutation(64)
    q = t[perm] + 0.001 * rng.normal(size=(64, 16)).astype(np.float32)
    m, ok = mutual_nearest(jnp.asarray(q), jnp.asarray(t), block=32)
    assert np.all(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(m), perm)
