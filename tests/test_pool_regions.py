"""Pooling-region bank parity vs the scalar-loop oracle and reference goldens."""

import numpy as np
import pytest

from opencv_dlco_tpu.ops.pool_regions import (
    build_filter_bank,
    pr_filters,
    pr_params,
    pr_params64,
    ring_offsets,
    ring_params,
)
from opencv_dlco_tpu.utils.configs import PoolRegionConfig

from oracles import pr_filter_oracle

SMALL = PoolRegionConfig(patch_size=64, nr=4, nphi=3, nsigma=4)


def test_ring_grid_shape_and_ranges():
    cfg = PoolRegionConfig()
    rings = ring_params(cfg)
    assert rings.shape == (5120, 3)
    # r fastest: first 32 rows share phi=0, sigma=0.5
    assert np.all(rings[:32, 1] == 0.0)
    assert np.all(rings[:32, 2] == 0.5)
    np.testing.assert_allclose(rings[:32, 0], np.arange(32.0))
    # extremes
    assert rings[-1, 0] == 31.0
    np.testing.assert_allclose(rings[-1, 1], np.pi / 4.0)
    assert rings[-1, 2] == 16.0


def test_ring_offsets_symmetry():
    rings = ring_params(SMALL)
    off = ring_offsets(rings)
    assert off.shape == (rings.shape[0], 8, 2)
    # r = 0 rings: all 8 offsets are the origin
    zero = rings[:, 0] == 0.0
    np.testing.assert_array_equal(off[zero], 0.0)
    # offsets come in +- pairs: sum over the 8 symmetries is 0
    np.testing.assert_allclose(off.sum(axis=1), 0.0, atol=1e-12)


def test_pr_params_layout():
    cfg = PoolRegionConfig()
    params = pr_params(cfg)
    assert params.shape == (40960, 3)
    assert params.dtype == np.float32
    # 8 consecutive rows per ring share sigma
    s = params[:, 2].reshape(-1, 8)
    assert np.all(s == s[:, :1])


@pytest.mark.parametrize(
    "x0,y0,sigma",
    [
        (0.0, 0.0, 0.5),
        (10.0, -7.0, 1.0),
        (-31.0, 0.0, 16.0),
        (3.3233, 21.91, 2.5),
        (31.0, 31.0, 0.5),
    ],
)
def test_filter_matches_scalar_oracle(x0, y0, sigma):
    params = np.array([[x0, y0, sigma]], dtype=np.float64)
    ours = pr_filters(params, 64)[0].reshape(64, 64)
    ref = pr_filter_oracle(x0, y0, sigma)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(ours.sum(dtype=np.float64), 1.0, rtol=1e-6)


def test_full_small_bank():
    rings, params, filters = build_filter_bank(SMALL)
    assert filters.shape == (SMALL.n_filters, 64 * 64)
    sums = filters.sum(axis=1, dtype=np.float64)
    np.testing.assert_allclose(sums, 1.0, rtol=1e-5)
    # r=0 rings produce 8 identical filters
    zero_rings = np.where(rings[:, 0] == 0.0)[0]
    for zr in zero_rings[:2]:
        blk = filters[zr * 8:(zr + 1) * 8]
        assert np.all(blk == blk[:1])


def test_filters_against_random_oracle_subset(rng):
    cfg = PoolRegionConfig()
    params = pr_params64(cfg)
    sel = rng.choice(params.shape[0], size=16, replace=False)
    ours = pr_filters(params[sel], 64)
    for i, row in enumerate(sel):
        x0, y0, sigma = (float(v) for v in params[row])
        ref = pr_filter_oracle(x0, y0, sigma).reshape(-1)
        np.testing.assert_allclose(ours[i], ref, rtol=2e-5, atol=1e-9)
