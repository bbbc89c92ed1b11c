"""Subprocess worker for the real multi-process jax.distributed test.

Launched by tests/test_distributed_procs.py with DLCO_* env describing the
process topology (or none for the single-process reference run). Each
process contributes ``xla_force_host_platform_device_count`` CPU devices;
the global mesh spans all of them, so a sharded PR chunk here is a REAL
collective program across OS processes — the first actual exercise of the
process_count > 1 branch (VERDICT r2 missing #2).

Steps:
  1. distributed_init() from env (no-op in the single-process run).
  2. pr_train_chunk_sharded over the global dp mesh on deterministic data.
  3. mini run_pr_sweep against a pre-built workspace (writers must be
     is_primary-gated: only process 0 may touch the artifact files).
  4. process 0 dumps the sharded-chunk result + sweep summary to outdir.
"""

import json
import os
import sys


def main() -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from opencv_dlco_tpu.parallel.distributed import (
        distributed_init,
        host_info,
        is_primary,
    )

    multi = distributed_init()
    info = host_info()
    ws_root, outdir = sys.argv[1], sys.argv[2]

    from opencv_dlco_tpu.models.pr_rda import pr_init
    from opencv_dlco_tpu.parallel.mesh import make_mesh
    from opencv_dlco_tpu.parallel.sharding import pr_train_chunk_sharded
    from jax.sharding import NamedSharding, PartitionSpec as P

    # -- sharded PR chunk over the GLOBAL mesh (collective across procs) --
    mesh = make_mesh(mp=1)
    rng = np.random.default_rng(7)
    pos = rng.normal(1.0, 0.4, (64, 128)).astype(np.float32)
    neg = rng.normal(1.6, 0.4, (64, 128)).astype(np.float32)
    sh = NamedSharding(mesh, P("dp", "mp"))
    pos_s = jax.device_put(jnp.asarray(pos), sh)
    neg_s = jax.device_put(jnp.asarray(neg), sh)
    state = pr_init(128, 1)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    state = pr_train_chunk_sharded(
        mesh, pos_s, neg_s, jnp.asarray([0.01]), jnp.asarray([0.1]),
        state, jax.random.PRNGKey(3), batch_per_device=16, n_steps=20)
    w = np.asarray(jax.device_get(state.w))

    # -- mini sweep against the pre-built workspace (writer gating) -------
    from opencv_dlco_tpu.parallel.sweep import run_pr_sweep
    from opencv_dlco_tpu.pipeline.stages import Workspace
    from opencv_dlco_tpu.utils.configs import (
        PoolRegionConfig,
        PRLearnConfig,
        PRSweepGrid,
    )

    ws = Workspace(ws_root, pool_cfg=PoolRegionConfig(nr=6, nphi=2,
                                                      nsigma=3),
                   pair_block=64, progress=False)
    if os.environ.get("DLCO_DIST_COMPDIST"):
        # stage 3 inside the distributed job: with process_count > 1 the
        # workspace auto-switches to the sharded zarr store and THIS
        # process writes its own row range of the distance matrix
        ws.compdist("sy")
    gammas = (0.05, 0.1) if os.environ.get("DLCO_DIST_COMPDIST") \
        else (0.05,)
    # the 4-process run needs >= 1 combo per process: an empty sweep
    # shard desynchronises the final waves and the shutdown barrier
    grid = PRSweepGrid(mus=(0.005, 0.02), gammas=gammas)
    cfg = PRLearnConfig(n_iter=4000, log_step=2000, batch=128,
                        max_dim=10_000)
    # interrupt after one log period, then resume: under process_count > 1
    # this exercises the SHARDED sidecar (each process saves its own
    # combo-range shard, both reassemble the common wave) — the final
    # artifacts must still be identical to the single-process run
    from opencv_dlco_tpu.parallel.sweep import SweepInterrupted

    try:
        run_pr_sweep(ws, "sy", grid, cfg, _stop_after_logs=1)
    except SweepInterrupted:
        pass
    results = run_pr_sweep(ws, "sy", grid, cfg)

    os.makedirs(outdir, exist_ok=True)
    if is_primary():
        np.save(os.path.join(outdir, "chunk_w.npy"), w)
        with open(os.path.join(outdir, "summary.json"), "w") as fh:
            json.dump({"host_info": info, "multi": bool(multi),
                       "sweep": [{k: r[k] for k in ("mu", "gamma", "obj",
                                                    "nnz")}
                                 for r in results]}, fh)
    # every process reports what it saw (parent asserts on these)
    with open(os.path.join(outdir,
                           f"proc{jax.process_index()}.json"), "w") as fh:
        json.dump(info, fh)


if __name__ == "__main__":
    main()
