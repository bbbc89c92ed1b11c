"""Device mesh construction.

The reference is single-process single-GPU (SURVEY.md §2: `cuda::setDevice(0)`
only); its scale ceiling is the 13 GB host-resident distance matrix. Here the
workload maps onto a 2-D logical mesh:

- ``dp`` ("pairs"): shards the pair/sample dimension — distance-matrix rows,
  RDA minibatches, validation sets. Collectives: `psum` of subgradients.
- ``mp`` ("rings"): shards the candidate-ring/feature dimension — filter-bank
  rows, distance-matrix columns, the w vector. Collectives: `psum` of
  partial dot products.

Within a slice both axes ride ICI; across hosts put ``dp`` on DCN (gradient
psum once per step) and keep ``mp`` intra-host.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh

data_axis = "dp"
model_axis = "mp"


def make_mesh(dp: Optional[int] = None, mp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (dp, mp) mesh; dp defaults to n_devices // mp."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // mp
    if dp * mp != n:
        raise ValueError(f"mesh {dp}x{mp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, (data_axis, model_axis))
