"""Mid-run solver-state checkpointing.

The reference resumes only at stage granularity (a crashed 50M-iteration
pr-learn run restarts from zero; workspace/04-prlearn.sh:17-22). Here the
full solver state (iterate, dual average, counters, RNG key) snapshots into
the run's artifact file every log period, so an interrupted run resumes
from the last validation point — strictly stronger than the reference's
best-w history, which is also kept (data/store.py append_row).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..data.store import ArtifactStore

_PREFIX = "solver_state"


class RunInterrupted(RuntimeError):
    """Raised by the _stop_after_logs test hooks right after a snapshot —
    simulates a mid-run kill at a known point for resume tests."""



def save_solver_state(store: ArtifactStore, state, key,
                      extra: Optional[dict] = None,
                      compression: int = 4) -> None:
    """Snapshot a NamedTuple-of-arrays solver state + PRNG key.

    compression=0 for large (sweep-stacked) states where gzip time would
    dominate the log period."""
    for name, leaf in state._asdict().items():
        store.write(f"{_PREFIX}/{name}", np.asarray(leaf),
                    compression=compression)
    # legacy uint32 PRNG keys round-trip as plain arrays
    store.write(f"{_PREFIX}/prng_key", np.asarray(key), compression=0)
    store.set_meta(f"{_PREFIX}_meta", {
        "fields": list(state._asdict().keys()),
        "type": type(state).__name__,
        **(extra or {}),
    })


def load_solver_state(store: ArtifactStore, state_cls):
    """Restore (state, key) saved by save_solver_state; None if absent."""
    import jax.numpy as jnp

    meta = store.get_meta(f"{_PREFIX}_meta")
    if not meta:
        return None
    fields = {}
    for name in meta["fields"]:
        fields[name] = jnp.asarray(store.read(f"{_PREFIX}/{name}"))
    key = jnp.asarray(store.read(f"{_PREFIX}/prng_key"))
    return state_cls(**fields), key
