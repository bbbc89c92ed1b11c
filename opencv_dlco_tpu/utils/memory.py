"""Device-memory budgeting for the learners.

The reference's answer to its 13 GB working set is a host/device split:
the full 10.2 GB distance matrix stays in host RAM and only the ~2 GB
validation sets go to the GPU (reference: src/pr-learn.cpp:194-225,
291-294). The TPU build instead keeps the *training* splits resident in
HBM (that is where the 100x throughput comes from) and keeps the full
matrix OFF the device: full-dataset statistics are recomputed from the
resident splits (models/select.compute_pr_stats_splits), which cover the
same 500k rows. At Brown scale that is ~8.2 GB train + ~2 GB val on a
16 GB v5e — it fits, with headroom for solver state and sort scratch.

Every learner asserts its planned residency against the real device limit
before uploading, so an impossible configuration fails immediately with a
sizing breakdown instead of OOMing mid-run.
"""

from __future__ import annotations

from typing import Dict

import jax

# v5e HBM per chip; used only when the backend doesn't report a limit.
_DEFAULT_HBM_BYTES = 16 * 1024**3
# fraction of HBM the data arrays may claim; the rest is headroom for
# solver state, validation sort scratch, and XLA temporaries.
_HEADROOM = 0.80


def device_hbm_bytes(device=None) -> int:
    """Reported HBM capacity of ``device`` (default: first device).

    CPU hosts (tests) report their RAM; backends without memory_stats
    fall back to the v5e figure.
    """
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return _DEFAULT_HBM_BYTES


def check_device_budget(parts: Dict[str, int], what: str,
                        device=None, headroom: float = _HEADROOM) -> int:
    """Assert that the named byte sizes fit the device; returns the total.

    Raises MemoryError with a per-part breakdown when the plan exceeds
    ``headroom`` x capacity — the crash-fast analogue of the reference's
    up-front full-matrix allocation failing at startup rather than mid-run.
    """
    total = sum(parts.values())
    limit = device_hbm_bytes(device)
    budget = int(limit * headroom)
    if total > budget:
        detail = ", ".join(
            f"{k}={v / 1024**3:.2f}GiB" for k, v in parts.items())
        raise MemoryError(
            f"{what}: planned device residency {total / 1024**3:.2f} GiB "
            f"exceeds {headroom:.0%} of the {limit / 1024**3:.1f} GiB "
            f"device limit ({detail}). Reduce the resident split sizes "
            f"(train_frac / subsampling) or shard over more chips."
        )
    return total


def nbytes(*arrays) -> int:
    """Total bytes of numpy/JAX arrays (pre-upload planning helper)."""
    return sum(int(a.size) * a.dtype.itemsize for a in arrays)
