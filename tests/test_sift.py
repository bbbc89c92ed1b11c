"""SIFT-baseline descriptor (ops/sift.py) — the hand-crafted comparison
point of BASELINE.json config 3 ("DLCO descriptors vs SIFT baseline")."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import REFERENCE, requires_reference

from opencv_dlco_tpu.data.synthetic import synth_patch_pairs
from opencv_dlco_tpu.ops.sift import N_DIM, sift_describe
from opencv_dlco_tpu.pipeline.eval import verification


def test_sift_descriptor_invariants(rng):
    patches = rng.integers(0, 255, (16, 64, 64)).astype(np.uint8)
    d = np.asarray(sift_describe(jnp.asarray(patches)))
    assert d.shape == (16, N_DIM)
    # unit L2 norm after clip-renormalise
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
    # clip keeps components bounded (0.2 before the final renorm)
    assert d.min() >= 0.0 and d.max() <= 0.2 / 0.2 * 0.35
    # deterministic
    d2 = np.asarray(sift_describe(jnp.asarray(patches)))
    np.testing.assert_array_equal(d, d2)


def test_sift_brightness_invariance(rng):
    """Additive brightness must barely move the descriptor (gradients +
    L2 normalisation)."""
    patches = rng.integers(20, 200, (8, 64, 64)).astype(np.uint8)
    bright = np.clip(patches.astype(np.int32) + 40, 0, 255).astype(np.uint8)
    d0 = np.asarray(sift_describe(jnp.asarray(patches)))
    d1 = np.asarray(sift_describe(jnp.asarray(bright)))
    assert np.abs(d1 - d0).mean() < 0.01


def test_sift_verification_quality():
    """The baseline must separate matched/non-matched textured pairs."""
    p1, p2, labels = synth_patch_pairs(np.random.default_rng(11),
                                       n_pairs=512, shift=4, noise=0.12)
    m = verification(sift_describe(jnp.asarray(p1)),
                     sift_describe(jnp.asarray(p2)), jnp.asarray(labels))
    assert m["auc"] > 0.98
    assert m["fpr95"] < 0.2


@requires_reference
def test_sift_vs_dlco_comparison_protocol():
    """Both descriptors run through the same HPatches-style verification
    protocol (the BASELINE config-3 comparison harness). On small-shift
    pairs — the registered-patch regime the DLCO models were trained
    for — both must be strong; the harness reports both numbers."""
    from opencv_dlco_tpu.models.vgg import VGGDescriptor

    with open(f"{REFERENCE}/workspace/opencv/vgg_generated_64.i") as fh:
        vgg = VGGDescriptor.from_header(fh.read())
    p1, p2, labels = synth_patch_pairs(np.random.default_rng(5),
                                       n_pairs=512, shift=2, noise=0.08)
    m_sift = verification(sift_describe(jnp.asarray(p1)),
                          sift_describe(jnp.asarray(p2)),
                          jnp.asarray(labels))
    m_vgg = verification(vgg.describe(p1), vgg.describe(p2),
                         jnp.asarray(labels))
    assert m_sift["auc"] > 0.99
    assert m_vgg["auc"] > 0.99
    assert m_vgg["fpr95"] < 0.1 and m_sift["fpr95"] < 0.1
