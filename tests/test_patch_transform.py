"""Patch transform parity vs the cv2/numpy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from opencv_dlco_tpu.ops.patch_transform import (
    batch_patch_transform,
    blur_matrix,
    gaussian_kernel_1d,
    gradient_matrix,
    opencv_gaussian_ksize,
    patch_transform,
)
from opencv_dlco_tpu.utils.configs import DescriptorConfig

from oracles import get_desc_oracle, random_patches


def test_opencv_ksize():
    assert opencv_gaussian_ksize(1.4) == 13
    assert opencv_gaussian_ksize(1.0) == 9


def test_gaussian_kernel_matches_cv2():
    import cv2

    ours = gaussian_kernel_1d(13, 1.4)
    theirs = cv2.getGaussianKernel(13, 1.4, cv2.CV_32F).reshape(-1)
    np.testing.assert_array_equal(ours, theirs)


def test_blur_matrix_matches_cv2_blur(rng):
    import cv2

    img = rng.random((64, 64), dtype=np.float64).astype(np.float32) * 255
    m = blur_matrix(64, 1.4).astype(np.float64)
    ours = m @ img.astype(np.float64) @ m.T
    theirs = cv2.GaussianBlur(img, (0, 0), 1.4, None, 1.4, cv2.BORDER_REPLICATE)
    np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=2e-3)


def test_gradient_matrix_matches_filter2d(rng):
    import cv2

    img = rng.random((64, 64), dtype=np.float64).astype(np.float32)
    g = gradient_matrix(64).astype(np.float64)
    k = np.array([[-1.0, 0.0, 1.0]], dtype=np.float32)
    ix_ref = cv2.filter2D(img, cv2.CV_32F, k, anchor=(-1, -1),
                          borderType=cv2.BORDER_REPLICATE)
    iy_ref = cv2.filter2D(img, cv2.CV_32F, k.T, anchor=(-1, -1),
                          borderType=cv2.BORDER_REPLICATE)
    np.testing.assert_allclose(img @ g.T, ix_ref, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(g @ img, iy_ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("norm", [True, False])
def test_patch_transform_vs_oracle(rng, norm):
    patches = random_patches(rng, 4)
    cfg = DescriptorConfig(norm=norm)
    ours = np.asarray(batch_patch_transform(jnp.asarray(patches), cfg))
    for i, p in enumerate(patches):
        ref = get_desc_oracle(p, norm=norm)
        assert ours[i].shape == ref.shape == (4096, 8)
        # Elementwise parity: allow tiny tail of bin-boundary flips where
        # float32 angle rounding differs between backends.
        close = np.isclose(ours[i], ref, rtol=5e-4, atol=5e-4)
        assert close.mean() > 0.999, f"patch {i}: {1 - close.mean():.2e} mismatched"
        # Aggregate parity must be tight.
        num = np.linalg.norm(ours[i] - ref)
        den = np.linalg.norm(ref) + 1e-9
        assert num / den < 5e-3


def test_patch_transform_shapes_and_zero_patch():
    # Constant patch: the reference gets exactly-zero gradients, T == 0 and an
    # all-zero descriptor. Our MXU formulation leaves float rounding noise;
    # the zero-contrast guard must prevent the quantile rescale from
    # amplifying it, leaving the descriptor at noise scale.
    flat = jnp.full((1, 64, 64), 128.0, dtype=jnp.float32)
    out = np.asarray(batch_patch_transform(flat))
    assert out.shape == (1, 4096, 8)
    np.testing.assert_allclose(out, 0.0, atol=2e-4)


def test_patch_transform_single_equals_batch(rng):
    patches = random_patches(rng, 2)
    cfg = DescriptorConfig()
    single = np.asarray(patch_transform(jnp.asarray(patches[0]), cfg))
    batched = np.asarray(batch_patch_transform(jnp.asarray(patches), cfg))[0]
    # eager vs jit fuse differently; only float-rounding level drift allowed
    np.testing.assert_allclose(single, batched, rtol=5e-4, atol=1e-5)
