"""Mid-run solver-state checkpoint: save/load round trip + stage resume."""

import numpy as np

import jax
import jax.numpy as jnp

from opencv_dlco_tpu.data.store import ArtifactStore
from opencv_dlco_tpu.models.pr_rda import PRState, pr_init
from opencv_dlco_tpu.utils.checkpoint import load_solver_state, save_solver_state


def test_roundtrip(tmp_path):
    state = PRState(
        w=jnp.asarray(np.random.default_rng(0).random((2, 64)), jnp.float32),
        df_avg=jnp.ones((2, 64), jnp.float32) * 0.5,
        t=jnp.asarray(12345, jnp.int32),
    )
    key = jax.random.PRNGKey(77)
    p = str(tmp_path / "ck.h5")
    with ArtifactStore(p, "w") as st:
        save_solver_state(st, state, key, extra={"completed_logs": 3})
    with ArtifactStore(p, "r") as st:
        restored, key2 = load_solver_state(st, PRState)
        meta = st.get_meta("solver_state_meta")
    np.testing.assert_array_equal(np.asarray(restored.w), np.asarray(state.w))
    np.testing.assert_array_equal(np.asarray(restored.df_avg),
                                  np.asarray(state.df_avg))
    assert int(restored.t) == 12345
    np.testing.assert_array_equal(np.asarray(key2), np.asarray(key))
    assert meta["completed_logs"] == 3
    # keys behave identically after restore
    a = jax.random.normal(key, (4,))
    b = jax.random.normal(key2, (4,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_missing_state_returns_none(tmp_path):
    p = str(tmp_path / "empty.h5")
    with ArtifactStore(p, "w") as st:
        st.write("other", np.zeros((3,)))
    with ArtifactStore(p, "r") as st:
        assert load_solver_state(st, PRState) is None


def test_prlearn_resumes_mid_run(tmp_path):
    """Interrupt a prlearn run after its snapshot; the rerun must continue
    from the snapshot (same final sample count, no restart from zero)."""
    from opencv_dlco_tpu.data.synthetic import synth_patch_pairs
    from opencv_dlco_tpu.pipeline.stages import Workspace
    from opencv_dlco_tpu.utils.configs import PoolRegionConfig, PRLearnConfig

    ws = Workspace(str(tmp_path),
                   pool_cfg=PoolRegionConfig(nr=6, nphi=2, nsigma=3),
                   pair_block=64, progress=False)
    rng = np.random.default_rng(5)
    p1, p2, labels = synth_patch_pairs(rng, n_pairs=160)
    n = len(labels)
    patches = np.concatenate([p1, p2])
    indices = np.zeros((n, 4), np.int32)
    indices[:, 0] = np.arange(n)
    indices[:, 2] = np.arange(n) + n
    indices[:, 1] = np.arange(n)
    indices[:, 3] = np.where(labels == 1, np.arange(n), np.arange(n) + n)
    with ArtifactStore(ws.path("dataset", "s.h5"), "w") as st:
        st.write("Indices", indices)
        st.write("Patches", patches, chunk_rows=256)
    ws.compdist("s")

    cfg = PRLearnConfig(mu=0.01, gamma=0.1, n_iter=6000, log_step=2000,
                        batch=128, max_dim=10_000)
    # full run for reference
    full = ws.prlearn("s", cfg)
    with ArtifactStore(full, "r") as st:
        t_full = int(st.read("solver_state/t")[()])

    # simulate an interrupted run: strip the done marker, rewind snapshot
    import h5py

    with h5py.File(full, "a") as f:
        import json

        f.attrs["done_iters"] = json.dumps(None)
        meta = json.loads(f.attrs["solver_state_meta"])
        meta["completed_logs"] = 1
        f.attrs["solver_state_meta"] = json.dumps(meta)
    out = ws.prlearn("s", cfg)  # resumes the remaining log periods
    with ArtifactStore(out, "r") as st:
        assert st.get_meta("done_iters") == "6000"
        t_resumed = int(st.read("solver_state/t")[()])
    # resumed run processed the remaining periods on top of the snapshot
    assert t_resumed > t_full


def _mk_state(rng, s=5, f=16, t=7):
    return PRState(
        w=jnp.asarray(rng.random((s, f)), jnp.float32),
        df_avg=jnp.asarray(rng.random((s, f)), jnp.float32),
        t=jnp.asarray(t, jnp.int32),
    )


def test_sharded_sweep_checkpoint_assembles_common_wave(tmp_path):
    """Two writers (one process each in production; two instances here)
    save their combo shards; the loader reassembles the full stacked
    state, scalars from writer 0, and picks the newest COMMON wave."""
    from opencv_dlco_tpu.utils.checkpoint import ShardedSweepCheckpoint

    rng = np.random.default_rng(3)
    sig = {"combos": [[1, 2]], "n": 5}
    base = str(tmp_path / "ck")
    state = _mk_state(rng)
    key = jax.random.PRNGKey(9)
    arrays = {"best_obj": rng.random(5).astype(np.float32),
              "row_counts": np.arange(5, dtype=np.int64)}
    writers = [ShardedSweepCheckpoint(base, p, 2, 5) for p in (0, 1)]
    # shard ranges tile [0, S) contiguously
    assert writers[0].lo == 0 and writers[1].hi == 5
    assert writers[0].hi == writers[1].lo
    for w in writers:
        w.save(state, key, arrays, sig, completed_logs=1)
    got = writers[0].load(PRState, sig)
    assert got is not None
    st2, key2, arrs2, wave = got
    assert wave == 1
    np.testing.assert_array_equal(np.asarray(st2.w), np.asarray(state.w))
    np.testing.assert_array_equal(np.asarray(st2.df_avg),
                                  np.asarray(state.df_avg))
    assert int(st2.t) == 7
    np.testing.assert_array_equal(np.asarray(key2), np.asarray(key))
    np.testing.assert_array_equal(arrs2["best_obj"], arrays["best_obj"])
    np.testing.assert_array_equal(arrs2["row_counts"], arrays["row_counts"])

    # writer 0 advances to wave 2 (other slot); common wave is still 1
    state2 = _mk_state(rng, t=8)
    writers[0].save(state2, key, arrays, sig, completed_logs=2)
    st3, _, _, wave = writers[1].load(PRState, sig)
    assert wave == 1
    assert int(st3.t) == 7
    # writer 1 catches up; wave 2 becomes common, slot 1 still holds wave 1
    writers[1].save(state2, key, arrays, sig, completed_logs=2)
    st4, _, _, wave = writers[0].load(PRState, sig)
    assert wave == 2 and int(st4.t) == 8

    # signature mismatch or a missing shard file -> no resume
    assert writers[0].load(PRState, {"other": 1}) is None
    writers[1].cleanup()
    assert writers[0].load(PRState, sig) is None
