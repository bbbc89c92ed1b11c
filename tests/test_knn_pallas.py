"""Fused Pallas 2-NN kernel vs the XLA HIGHEST-precision oracle.

Interpret-mode on CPU (conftest pins the platform); the same comparisons
re-run compiled on hardware under ``-m tpu_smoke`` (test_tpu_smoke.py).
"""

import numpy as np
import pytest

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
