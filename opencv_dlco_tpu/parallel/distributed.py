"""Multi-host (multi-process) runtime initialisation.

The reference is strictly single-process/single-GPU (SURVEY.md §2:
`cuda::setDevice(0)` only); its sweep scales by running more processes by
hand. The TPU-native replacement (SURVEY.md §5 "Distributed communication
backend"): one JAX process per host, `jax.distributed.initialize` wiring
them into a single global device set, and a (dp, mp) mesh whose ``dp``
axis spans hosts — data-parallel psum traffic rides DCN once per step
while ``mp`` stays on intra-host ICI (parallel/mesh.make_mesh enforces
that layout).

Launch contract (2-host example; same env on every host):

    DLCO_COORDINATOR=host0:8476 DLCO_NUM_PROCESSES=2 DLCO_PROCESS_ID=0 dlco ...
    DLCO_COORDINATOR=host0:8476 DLCO_NUM_PROCESSES=2 DLCO_PROCESS_ID=1 dlco ...

On TPU pods the three variables may all be omitted — jax.distributed
auto-detects the slice topology. Single-process runs (no env, n=1) are a
no-op, so every entry point can call distributed_init() unconditionally.
"""

from __future__ import annotations

import os
from typing import Optional

_initialized = False


def distributed_init(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialise jax.distributed from args or DLCO_* env vars.

    Returns True when a multi-process runtime was (or already is) active,
    False for the single-process no-op path. Idempotent.
    """
    global _initialized
    import jax

    coordinator = coordinator or os.environ.get("DLCO_COORDINATOR")
    if num_processes is None and "DLCO_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["DLCO_NUM_PROCESSES"])
    if process_id is None and "DLCO_PROCESS_ID" in os.environ:
        process_id = int(os.environ["DLCO_PROCESS_ID"])

    if _initialized:
        return jax.process_count() > 1

    # Decide from args/env ALONE whether to initialize: jax.process_count()
    # (or any other backend query) before jax.distributed.initialize would
    # itself initialise the XLA backend and make initialize() impossible —
    # the failure mode the real 2-process test caught
    # (tests/test_distributed_procs.py).
    if num_processes is not None and num_processes <= 1:
        return False
    if coordinator is None and num_processes is None:
        # nothing requested and nothing auto-detectable to join; report
        # whatever runtime already exists (safe to query here — we are not
        # going to initialize)
        return jax.process_count() > 1

    # DLCO_SHUTDOWN_TIMEOUT: the coordination service's shutdown barrier
    # (default 300 s) must absorb the slowest process's remaining work
    # after the fastest exits; heavily oversubscribed test topologies
    # (4 procs x 2 virtual devices on a 2-core host, each compiling the
    # whole pipeline) legitimately skew past 300 s
    shutdown_s = int(os.environ.get("DLCO_SHUTDOWN_TIMEOUT", "300"))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id,
                               shutdown_timeout_seconds=shutdown_s)
    _initialized = True
    return jax.process_count() > 1


def host_info() -> dict:
    """Topology snapshot for logs / debugging."""
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
        "backend": jax.default_backend(),
    }


def is_primary() -> bool:
    """True on the process that should write artifacts/logs (host 0)."""
    import jax

    return jax.process_index() == 0
