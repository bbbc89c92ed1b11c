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
    """Build a (dp, mp) mesh; dp defaults to n_devices // mp.

    Multi-host layout contract: devices are ordered by (process, local id)
    before the row-major (dp, mp) reshape, so each mp group lies inside one
    host (ICI) and the dp axis tiles across hosts (DCN) — the layout §5 of
    SURVEY.md specifies. mp must divide every host's local device count or
    an mp group would straddle a DCN boundary; that is rejected.
    """
    if devices is None:
        devices = jax.devices()
    devices = sorted(devices,
                     key=lambda d: (getattr(d, "process_index", 0),
                                    getattr(d, "id", 0)))
    n = len(devices)
    if dp is None:
        dp = n // mp
    if dp * mp != n:
        raise ValueError(f"mesh {dp}x{mp} != {n} devices")
    if mp > 1:
        per_host: dict = {}
        for d in devices:
            p = getattr(d, "process_index", 0)
            per_host[p] = per_host.get(p, 0) + 1
        for p, cnt in per_host.items():
            if cnt % mp:
                raise ValueError(
                    f"mp={mp} does not divide host {p}'s {cnt} local "
                    f"devices; an mp shard group would cross DCN")
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, (data_axis, model_axis))
