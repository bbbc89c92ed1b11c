from .patch_transform import (
    gaussian_kernel_1d,
    blur_matrix,
    gradient_matrix,
    patch_transform,
    batch_patch_transform,
)
from .pool_regions import (
    ring_params,
    ring_offsets,
    pr_params,
    pr_filters,
    build_filter_bank,
)
from .roc import roc_stats, roc_curve
from .hinge import hinge_sum, hinge_sum_sorted, hinge_sum_blockwise
from .pair_distance import ring_distances, pooled_descriptors, unprojected_diffs

__all__ = [
    "gaussian_kernel_1d",
    "blur_matrix",
    "gradient_matrix",
    "patch_transform",
    "batch_patch_transform",
    "ring_params",
    "ring_offsets",
    "pr_params",
    "pr_filters",
    "build_filter_bank",
    "roc_stats",
    "roc_curve",
    "hinge_sum",
    "hinge_sum_sorted",
    "hinge_sum_blockwise",
    "ring_distances",
    "pooled_descriptors",
    "unprojected_diffs",
]
