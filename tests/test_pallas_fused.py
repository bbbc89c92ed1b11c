"""Fused Pallas ring-distance kernel vs the XLA reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opencv_dlco_tpu.ops.pair_distance import ring_distances
from opencv_dlco_tpu.ops.pair_distance_pallas import ring_distances_fused
from opencv_dlco_tpu.ops.patch_transform import batch_patch_transform
from opencv_dlco_tpu.ops.pool_regions import build_filter_bank
from opencv_dlco_tpu.utils.configs import PoolRegionConfig

from oracles import random_patches

CFG = PoolRegionConfig(nr=16, nphi=2, nsigma=4)  # 128 rings = 1024 filters


def _setup(rng, n_pairs=6):
    _, _, filters = build_filter_bank(CFG)
    patches = random_patches(rng, 2 * n_pairs)
    pt = batch_patch_transform(jnp.asarray(patches))
    return jnp.asarray(filters), pt[:n_pairs], pt[n_pairs:]


def test_fused_matches_xla(rng):
    f, pt1, pt2 = _setup(rng)
    ref = np.asarray(ring_distances(f, pt1, pt2))
    fused = np.asarray(ring_distances_fused(f, pt1, pt2, interpret=True))
    assert fused.shape == ref.shape
    np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-5)


def test_fused_pair_padding(rng):
    """Non-multiple-of-16 pair counts pad internally and slice back."""
    f, pt1, pt2 = _setup(rng, n_pairs=5)
    ref = np.asarray(ring_distances(f, pt1, pt2))
    fused = np.asarray(ring_distances_fused(f, pt1, pt2, interpret=True))
    np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-5)


def test_fused_rejects_bad_filter_count(rng):
    f, pt1, pt2 = _setup(rng)
    with pytest.raises(ValueError):
        ring_distances_fused(f[:100], pt1, pt2, interpret=True)


def test_fused_bf16_close(rng):
    f, pt1, pt2 = _setup(rng)
    ref = np.asarray(ring_distances(f, pt1, pt2))
    fused = np.asarray(ring_distances_fused(f, pt1, pt2, interpret=True,
                                            bf16=True))
    rel = np.abs(fused - ref) / (np.abs(ref) + 1e-3)
    assert np.median(rel) < 2e-2
