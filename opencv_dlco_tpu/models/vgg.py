"""The deployed VGG descriptor model: patches -> compact descriptors.

This is the inference-side counterpart of the training pipeline — what
OpenCV contrib's VGG descriptor computes from the exported artifacts
(reference: src/export-opencv.cpp emits PR/PJ for exactly this computation):

    PatchTrans = patch_transform(patch)               (n_pixels, n_bins)
    Desc       = min(PR @ PatchTrans, 1)  flattened   (n_sel * n_bins,)
    out        = PJ @ Desc                            (n_dim,)

L2 distances between projected descriptors equal the learned Mahalanobis
metric on descriptor differences (||W(d1 - d2)|| = ||Wd1 - Wd2||), so this
one jitted forward IS the deployed matcher front-end. Batched over patches;
the whole forward is two MXU matmuls + the patch transform.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.patch_transform import batch_patch_transform
from ..utils.configs import DescriptorConfig

_HIGHEST = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class VGGDescriptor:
    """Frozen deployable descriptor: selected PR filters + projection."""

    sel_filters: np.ndarray  # (n_sel, n_pixels) float32
    projection: np.ndarray   # (n_dim, n_sel * n_bins) float32
    desc_cfg: DescriptorConfig = DescriptorConfig()

    @property
    def n_dim(self) -> int:
        return self.projection.shape[0]

    @classmethod
    def from_header(cls, header_text: str,
                    desc_cfg: DescriptorConfig = DescriptorConfig()):
        """Load from an exported (or reference-published) vgg_generated .i."""
        from ..pipeline.export import parse_vgg_header

        mats = parse_vgg_header(header_text)
        return cls(sel_filters=mats["PR"], projection=mats["PJ"],
                   desc_cfg=desc_cfg)

    @classmethod
    def from_artifacts(cls, filters_path: str, pr_ref: str, pj_path: str,
                       desc_cfg: DescriptorConfig = DescriptorConfig()):
        """Load from workspace artifacts (filters.h5 + pr#row + pj)."""
        from ..data.store import ArtifactStore, parse_model_ref
        from .select import select_pr_filters

        with ArtifactStore(filters_path, "r") as st:
            filters = st.read("PRFilters")
        filters = filters.reshape(filters.shape[0], -1)
        pr_path, row = parse_model_ref(pr_ref)
        with ArtifactStore(pr_path, "r") as st:
            hist = st.read("w")
        w = hist[row]
        with ArtifactStore(pj_path, "r") as st:
            pj = st.read("W")
        pj = pj[np.any(pj != 0.0, axis=1)]
        sel = select_pr_filters(filters, w)
        return cls(sel_filters=sel, projection=pj, desc_cfg=desc_cfg)

    def describe_fn(self):
        """Returns a pure jittable (patches) -> (B, n_dim) function."""
        f = jnp.asarray(self.sel_filters)
        pj = jnp.asarray(self.projection)
        cfg = self.desc_cfg

        def forward(patches):
            pt = batch_patch_transform(patches, cfg)       # (B, P^2, nb)
            pooled = jnp.einsum("sk,bkc->bsc", f, pt,
                                precision=_HIGHEST)
            desc = jnp.minimum(pooled, 1.0).reshape(pt.shape[0], -1)
            return jnp.matmul(desc, pj.T, precision=_HIGHEST)

        return forward

    def describe(self, patches) -> jax.Array:
        # cache the jitted program on the instance: a fresh jax.jit closure
        # per call would recompile on EVERY describe (jit caches by function
        # identity) — measured at ~4 s/call on the remote-TPU tunnel
        fn = self.__dict__.get("_jit_describe")
        if fn is None:
            fn = jax.jit(self.describe_fn())
            self.__dict__["_jit_describe"] = fn
        return fn(jnp.asarray(patches))
