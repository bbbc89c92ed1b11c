"""Mid-run solver-state checkpointing.

The reference resumes only at stage granularity (a crashed 50M-iteration
pr-learn run restarts from zero; workspace/04-prlearn.sh:17-22). Here the
full solver state (iterate, dual average, counters, RNG key) snapshots into
the run's artifact file every log period, so an interrupted run resumes
from the last validation point — strictly stronger than the reference's
best-w history, which is also kept (data/store.py append_row).
"""

from __future__ import annotations

import errno
import os
import time
from typing import Optional

import numpy as np

from ..data.store import ArtifactStore

_PREFIX = "solver_state"


def _open_lock_retry(path: str, mode: str,
                     timeout_s: float = 120.0) -> ArtifactStore:
    """ArtifactStore open that retries ONLY on HDF5 lock contention.

    Sharded-checkpoint processes interrupt and resume independently: a
    fast process's load() read-opens EVERY writer's file while a slow
    one may be mid-save of the same wave, and conversely a save's
    append-open can hit a peer's transient read lock. The h5 lock makes
    the mid-write state unreadable — which is the correctness guarantee
    — so a locked file means 'retry shortly', not 'corrupt'. Any other
    OSError (truncated file, bad header) surfaces immediately
    (ADVICE r4: a genuinely bad shard must not stall two minutes)."""
    deadline = time.time() + timeout_s
    while True:
        try:
            return ArtifactStore(path, mode)
        except BlockingIOError:
            if time.time() > deadline:
                raise
            time.sleep(0.2)
        except OSError as err:
            msg = str(err).lower()
            locked = ("unable to lock" in msg
                      or "file is already open" in msg
                      or "resource temporarily unavailable" in msg
                      or getattr(err, "errno", None) == errno.EAGAIN)
            if not locked or time.time() > deadline:
                raise
            time.sleep(0.2)


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


class ShardedSweepCheckpoint:
    """Per-process sharded sweep checkpoints — no primary-writer funnel.

    A pod-scale sweep's stacked solver state is S-leading per field (the
    reference-scale PJ grid is 45 x 544 x 544 over four fields, ~200 MB a
    snapshot); funnelling that through process 0 every log period would
    serialise checkpoint IO on one host while every other host idles —
    the exact pathology SURVEY.md §5 names sharded stores as the fix for.
    Here every process writes its OWN contiguous combo-range shard of each
    S-leading field into its OWN HDF5 file (one writer per file — h5py's
    single-writer contract holds by construction), double-buffered into
    two slots so a crash mid-wave never destroys the last complete wave:

        {base}-p{p}of{n}.h5 : slot{0,1}/<field>, per-slot wave marker

    The loader assembles the newest wave present in EVERY process file.
    Collective (lockstep) sweeps keep processes within one wave of each
    other, so the previous wave always survives in the other slot; a
    checkpoint set whose files disagree on the signature or share no
    common wave resumes from nothing — the reference's own stage-level
    restart semantic (workspace/04-prlearn.sh:17-22).

    Fields whose leading axis is not the sweep axis (PRState.t, the PRNG
    key) are tiny and written whole by every process; the loader reads
    them from process 0's file.
    """

    def __init__(self, base_path: str, writer_id: int, n_writers: int,
                 n_sweep: int):
        from ..data.shard_store import shard_rows

        self.base = base_path
        self.writer_id = int(writer_id)
        self.n_writers = int(n_writers)
        self.n_sweep = int(n_sweep)
        self.lo, self.hi = shard_rows(n_sweep, 1, writer_id, n_writers)

    def path(self, p: int) -> str:
        return f"{self.base}-p{p}of{self.n_writers}.h5"

    def _shardable(self, arr: np.ndarray) -> bool:
        return arr.ndim >= 1 and arr.shape[0] == self.n_sweep

    def save(self, state, key, arrays: dict, signature: dict,
             completed_logs: int) -> None:
        """Snapshot this process's combo shard for wave ``completed_logs``."""
        slot = completed_logs % 2
        leaves = {**state._asdict(), **arrays,
                  "prng_key": np.asarray(key)}
        # the PRNG key is never sweep-stacked — exclude it by name so a
        # raw uint32 key of shape (2,) under a 2-combo sweep is not
        # misdetected as a shardable leaf
        sharded = [n for n, v in leaves.items()
                   if n != "prng_key" and self._shardable(np.asarray(v))]
        # a PEER's load() read-opens EVERY writer's file — including this
        # one — so the append-open can hit its transient read lock; same
        # retry discipline as the load path (found by the 2-process
        # suite under host contention: EAGAIN on save crashed the worker)
        with _open_lock_retry(self.path(self.writer_id), "a") as st:
            for name, leaf in leaves.items():
                arr = np.asarray(leaf)
                if name in sharded:
                    arr = arr[self.lo:self.hi]
                st.write(f"slot{slot}/{name}", arr, compression=0)
            st.set_meta(f"slot{slot}", {"completed_logs": completed_logs})
            st.set_meta("signature", signature)
            st.set_meta("state_fields", list(state._asdict().keys()))
            st.set_meta("array_names", list(arrays.keys()))
            st.set_meta("sharded_names", sharded)

    def load(self, state_cls, signature: dict):
        """Assemble (state, key, arrays, completed_logs) from the newest
        wave all processes agree on; None if absent/incompatible.

        A shard file that VANISHES between the existence scan and its
        open means a faster peer already finished the sweep and ran
        cleanup() — the checkpoint set is gone, so resume from scratch
        (deterministic replay converges to the same final artifacts).
        Retrying the open (the pre-r5 behaviour) could never succeed:
        cleaned-up files don't come back.
        """
        import jax.numpy as jnp
        from ..data.shard_store import shard_rows

        try:
            return self._load(state_cls, signature, jnp, shard_rows)
        except FileNotFoundError:
            return None

    def _load(self, state_cls, signature, jnp, shard_rows):
        per_proc = []
        for p in range(self.n_writers):
            path = self.path(p)
            if not os.path.exists(path):
                return None
            with _open_lock_retry(path, "r") as st:
                if st.get_meta("signature") != signature:
                    return None
                waves = {}
                for slot in (0, 1):
                    meta = st.get_meta(f"slot{slot}")
                    if meta:
                        waves[int(meta["completed_logs"])] = slot
                per_proc.append((waves, st.get_meta("state_fields"),
                                 st.get_meta("array_names"),
                                 set(st.get_meta("sharded_names") or [])))
        common = set(per_proc[0][0])
        for rec in per_proc[1:]:
            common &= set(rec[0])
        if not common:
            return None
        wave = max(common)
        state_fields, array_names, sharded = (per_proc[0][1],
                                              per_proc[0][2],
                                              per_proc[0][3])

        full = {}
        scalars = {}
        for p in range(self.n_writers):
            lo, hi = shard_rows(self.n_sweep, 1, p, self.n_writers)
            slot = per_proc[p][0][wave]
            with _open_lock_retry(self.path(p), "r") as st:
                for name in state_fields + array_names + ["prng_key"]:
                    if name in sharded:
                        arr = st.read(f"slot{slot}/{name}")
                        buf = full.setdefault(
                            name, np.zeros((self.n_sweep,) + arr.shape[1:],
                                           arr.dtype))
                        buf[lo:hi] = arr
                    elif p == 0:
                        scalars[name] = st.read(f"slot{slot}/{name}")
        merged = {**scalars, **full}
        state = state_cls(**{k: jnp.asarray(merged[k])
                             for k in state_fields})
        key = jnp.asarray(merged["prng_key"])
        arrays = {k: merged[k] for k in array_names}
        return state, key, arrays, wave

    def cleanup(self) -> None:
        """Remove this process's own shard file (call on every process)."""
        path = self.path(self.writer_id)
        if os.path.exists(path):
            os.remove(path)
