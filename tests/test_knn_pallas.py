"""Fused Pallas 2-NN kernel vs the XLA HIGHEST-precision oracle.

Interpret-mode on CPU (conftest pins the platform); the same comparisons
re-run compiled on hardware under ``-m tpu_smoke`` (test_tpu_smoke.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opencv_dlco_tpu.ops.knn import knn_match, ratio_test
from opencv_dlco_tpu.ops.knn_pallas import knn2_fused


@pytest.fixture(scope="module")
def descs(session_rng=None):
    rng = np.random.default_rng(11)
    # realistic-margin descriptors: cluster centres + small perturbations,
    # so true matches have clear margins (gaussian clouds are the
    # worst case for precision identity — tested separately below)
    centres = rng.normal(size=(800, 64)).astype(np.float32)
    q = centres[:500] + 0.05 * rng.normal(size=(500, 64)).astype(np.float32)
    t = np.concatenate([centres,
                        rng.normal(size=(2200, 64)).astype(np.float32)])
    perm = rng.permutation(len(t))
    return (jnp.asarray(q), jnp.asarray(t[perm].astype(np.float32)))


def test_knn2_fused_f32_exact(descs):
    q, t = descs
    d_ref, i_ref = knn_match(q, t, k=2, block=512)
    d_f, i_f = knn2_fused(q, t, interpret=True, bf16=False)
    np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-5)


def test_knn2_fused_bf16_match_identity(descs):
    """bf16 distances must preserve the MATCH SET (the consumer contract:
    ratio-test output, not raw distances)."""
    q, t = descs
    d_ref, i_ref = knn_match(q, t, k=2, block=512)
    m_ref, ok_ref = ratio_test(d_ref, i_ref, ratio=0.9)
    d_f, i_f = knn2_fused(q, t, interpret=True, bf16=True)
    m_f, ok_f = ratio_test(d_f, i_f, ratio=0.9)
    agree = np.mean(np.asarray(m_ref) == np.asarray(m_f))
    assert agree >= 0.99, f"ratio-test match identity {agree:.4f}"
    # top-1 neighbour identity on realistic margins
    top1 = np.mean(np.asarray(i_ref[:, 0]) == np.asarray(i_f[:, 0]))
    assert top1 >= 0.99, f"top-1 identity {top1:.4f}"


def test_knn2_fused_padding_edges():
    """Non-multiple shapes: padded queries dropped, padded train rows
    never selected."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(77, 32)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(130, 32)).astype(np.float32))
    d_ref, i_ref = knn_match(q, t, k=2, block=64)
    d_f, i_f = knn2_fused(q, t, interpret=True, bf16=False)
    assert d_f.shape == (77, 2) and i_f.shape == (77, 2)
    np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_ref))
    assert int(jnp.max(i_f)) < 130


def test_knnk_fused_vs_xla_oracle(descs):
    """General-k kernel (HPatches matching-mAP protocol, k=10) vs the
    XLA HIGHEST scan path: exact index identity in f32 mode."""
    from opencv_dlco_tpu.ops.knn_pallas import knnk_fused

    q, t = descs
    for k in (3, 10):
        d_ref, i_ref = knn_match(q, t, k=k, block=512, fused=False)
        d_f, i_f = knnk_fused(q, t, k, interpret=True, bf16=False)
        np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_ref))
        np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_ref),
                                   rtol=1e-5, atol=1e-5)


def test_knn2_fused_batched_matches_vmapped_xla():
    """Batched kernel (SLAM pose chunk path) vs per-batch XLA oracle."""
    from opencv_dlco_tpu.ops.knn_pallas import knn2_fused_batched

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(4, 128, 32)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(4, 256, 32)).astype(np.float32))
    d_f, i_f = knn2_fused_batched(q, t, interpret=True, bf16=False)
    for b in range(4):
        d_ref, i_ref = knn_match(q[b], t[b], k=2, block=256, fused=False,
                                 precision=jax.lax.Precision.HIGHEST)
        np.testing.assert_array_equal(np.asarray(i_f[b]), np.asarray(i_ref))
        np.testing.assert_allclose(np.asarray(d_f[b]), np.asarray(d_ref),
                                   rtol=1e-5, atol=1e-5)


def test_knn_match_dispatcher_forced_fused(descs):
    """knn_match(fused=True) must agree with the XLA path for every k it
    dispatches (k<=2 -> knn2 kernel, 3..16 -> knnk kernel); on CPU the
    dispatcher runs the kernels in interpret mode."""
    q, t = descs
    for k in (1, 2, 5):
        d_ref, i_ref = knn_match(q, t, k=k, block=512, fused=False)
        d_f, i_f = knn_match(q, t, k=k, block=512, fused=True,
                             precision=jax.lax.Precision.HIGHEST)
        assert d_f.shape == (q.shape[0], k)
        np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_ref))


def test_mutual_nearest_fused_matches_xla(descs):
    from opencv_dlco_tpu.ops.knn import mutual_nearest

    q, t = descs
    m_ref, ok_ref = mutual_nearest(q, t, block=512, fused=False)
    m_f, ok_f = mutual_nearest(q, t, block=512, fused=True)
    np.testing.assert_array_equal(np.asarray(ok_f), np.asarray(ok_ref))
    np.testing.assert_array_equal(np.asarray(m_f), np.asarray(m_ref))
