"""Thin re-export: tests use the package's synthetic data generators."""

import numpy as np

from opencv_dlco_tpu.data.synthetic import (  # noqa: F401
    synth_patch_pairs,
    synth_pj_dataset,
    synth_pr_dataset,
)


def split_train_val(arr: np.ndarray, frac: float = 0.8):
    n = int(arr.shape[0] * frac)
    return arr[:n], arr[n:]
