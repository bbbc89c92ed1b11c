"""Stage-3 matmul precision modes: DEFAULT (bf16) vs HIGHEST (f32) error."""

import numpy as np

import jax
import jax.numpy as jnp

from opencv_dlco_tpu.ops.pair_distance import ring_distances
from opencv_dlco_tpu.ops.patch_transform import batch_patch_transform
from opencv_dlco_tpu.ops.pool_regions import build_filter_bank
from opencv_dlco_tpu.utils.configs import DescriptorConfig, PoolRegionConfig

from oracles import random_patches


def test_precision_modes_agree_within_tolerance(rng):
    """bf16 pooling must stay within ~1e-2 relative of f32 distances (the
    documented tradeoff of DescriptorConfig.matmul_precision)."""
    _, _, filters = build_filter_bank(PoolRegionConfig(nr=4, nphi=2, nsigma=3))
    patches = random_patches(rng, 8)
    pt = batch_patch_transform(jnp.asarray(patches))
    f = jnp.asarray(filters)
    d_hi = np.asarray(ring_distances(f, pt[:4], pt[4:],
                                     precision=jax.lax.Precision.HIGHEST))
    d_lo = np.asarray(ring_distances(f, pt[:4], pt[4:],
                                     precision=jax.lax.Precision.DEFAULT))
    denom = np.abs(d_hi) + 1e-3
    rel = np.abs(d_hi - d_lo) / denom
    assert np.median(rel) < 5e-3, f"median rel err {np.median(rel):.2e}"
    assert rel.max() < 0.2, f"max rel err {rel.max():.2e}"
    # ordering of distances (what FPR95 depends on) is largely preserved
    order_hi = np.argsort(d_hi.reshape(-1))
    order_lo = np.argsort(d_lo.reshape(-1))
    from scipy.stats import spearmanr

    rho = spearmanr(order_hi, order_lo).statistic
    assert rho > 0.999


def test_config_precision_property():
    assert DescriptorConfig().precision == jax.lax.Precision.HIGHEST
    assert (DescriptorConfig(matmul_precision="default").precision
            == jax.lax.Precision.DEFAULT)
