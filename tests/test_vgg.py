"""Deployable VGG descriptor: reference-header loading + matching quality."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import REFERENCE, requires_reference

from opencv_dlco_tpu.models.vgg import VGGDescriptor
from opencv_dlco_tpu.ops.knn import mutual_nearest
from opencv_dlco_tpu.data.synthetic import synth_patch_pairs


@requires_reference
def test_from_published_header_and_match(rng):
    """Load the reference's published 64-D model and check it actually
    discriminates: warped copies must match mutually, and positive-pair
    descriptor distances must sit far below negative-pair distances."""
    with open(f"{REFERENCE}/workspace/opencv/vgg_generated_64.i") as f:
        model = VGGDescriptor.from_header(f.read())
    assert model.n_dim == 64
    assert model.projection.shape[1] == model.sel_filters.shape[0] * 8

    p1, p2, labels = synth_patch_pairs(rng, n_pairs=96, noise=0.02)
    d1 = np.asarray(model.describe(p1))
    d2 = np.asarray(model.describe(p2))
    assert d1.shape == (96, 64)

    pos = labels == 1
    dist = ((d1 - d2) ** 2).sum(1)
    assert dist[pos].mean() < 0.25 * dist[~pos].mean()

    m, ok = mutual_nearest(jnp.asarray(d1[pos]), jnp.asarray(d2[pos]),
                           block=32)
    frac = np.mean(np.asarray(m) == np.arange(pos.sum()))
    assert frac > 0.9, f"only {frac:.0%} mutual matches"


def test_describe_fn_jittable(rng):
    import jax

    sel = rng.random((10, 4096)).astype(np.float32) * 0.01
    proj = rng.standard_normal((16, 80)).astype(np.float32)
    model = VGGDescriptor(sel_filters=sel, projection=proj)
    fn = jax.jit(model.describe_fn())
    patches = jnp.asarray(
        rng.integers(0, 255, (4, 64, 64)).astype(np.uint8))
    out = fn(patches)
    assert out.shape == (4, 16)
    assert np.all(np.isfinite(np.asarray(out)))
