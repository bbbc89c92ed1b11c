"""Stage-3 pooled descriptor / ring distance parity vs a numpy oracle."""

import numpy as np

import jax.numpy as jnp

from opencv_dlco_tpu.ops.pair_distance import (
    pooled_descriptors,
    ring_distances,
    unprojected_diffs,
)
from opencv_dlco_tpu.ops.patch_transform import batch_patch_transform
from opencv_dlco_tpu.ops.pool_regions import build_filter_bank
from opencv_dlco_tpu.utils.configs import PoolRegionConfig

from oracles import get_desc_oracle, random_patches

SMALL = PoolRegionConfig(patch_size=64, nr=4, nphi=3, nsigma=4)


def _oracle_ring_dist(filters, p1, p2):
    """Per-pair oracle: GEMM + trunc + sqdiff + channel/offset reduction."""
    d1 = np.minimum(filters.astype(np.float64) @ get_desc_oracle(p1).astype(np.float64), 1.0)
    d2 = np.minimum(filters.astype(np.float64) @ get_desc_oracle(p2).astype(np.float64), 1.0)
    sq = (d2 - d1) ** 2
    per_filter = sq.sum(axis=1)
    return per_filter.reshape(-1, 8).sum(axis=1)


def test_pooled_descriptor_trunc(rng):
    _, _, filters = build_filter_bank(SMALL)
    patches = random_patches(rng, 2)
    pt = batch_patch_transform(jnp.asarray(patches))
    d = np.asarray(pooled_descriptors(jnp.asarray(filters), pt))
    assert d.shape == (2, SMALL.n_filters, 8)
    assert d.max() <= 1.0


def test_ring_distances_vs_oracle(rng):
    _, _, filters = build_filter_bank(SMALL)
    patches = random_patches(rng, 6)
    p1, p2 = patches[:3], patches[3:]
    pt1 = batch_patch_transform(jnp.asarray(p1))
    pt2 = batch_patch_transform(jnp.asarray(p2))
    ours = np.asarray(ring_distances(jnp.asarray(filters), pt1, pt2))
    assert ours.shape == (3, SMALL.n_rings)
    for b in range(3):
        ref = _oracle_ring_dist(filters, p1[b], p2[b])
        np.testing.assert_allclose(ours[b], ref, rtol=2e-3, atol=2e-3)


def test_ring_distance_self_is_zero(rng):
    _, _, filters = build_filter_bank(SMALL)
    patches = random_patches(rng, 2)
    pt = batch_patch_transform(jnp.asarray(patches))
    d = np.asarray(ring_distances(jnp.asarray(filters), pt, pt))
    np.testing.assert_allclose(d, 0.0, atol=1e-10)


def test_unprojected_diffs_layout(rng):
    _, _, filters = build_filter_bank(SMALL)
    sel = jnp.asarray(filters[:10])
    patches = random_patches(rng, 4)
    pt1 = batch_patch_transform(jnp.asarray(patches[:2]))
    pt2 = batch_patch_transform(jnp.asarray(patches[2:]))
    diffs = np.asarray(unprojected_diffs(sel, pt1, pt2))
    assert diffs.shape == (2, 80)
    # row-major (n_sel, n_bins) flattening, sign = Desc1 - Desc2
    d1 = np.asarray(pooled_descriptors(sel, pt1))
    d2 = np.asarray(pooled_descriptors(sel, pt2))
    np.testing.assert_allclose(diffs, (d1 - d2).reshape(2, -1), rtol=1e-6)
