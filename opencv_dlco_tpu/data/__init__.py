from .store import ArtifactStore
from .brown import convert_brown_patches, parse_pair_index, crop_patch_grid
from .synthetic import synth_pr_dataset, synth_pj_dataset, synth_patch_pairs
from .kitti import KittiSequence, load_sequence as load_kitti_sequence

__all__ = [
    "ArtifactStore",
    "convert_brown_patches",
    "parse_pair_index",
    "crop_patch_grid",
    "synth_pr_dataset",
    "synth_pj_dataset",
    "synth_patch_pairs",
    "KittiSequence",
    "load_kitti_sequence",
]
