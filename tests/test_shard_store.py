"""Sharded multi-writer zarr store (data/shard_store.py) — the distributed
L0 of SURVEY §5 ("sharded array checkpoint store replacing chunked HDF5").

Covers: roundtrip + race-tolerant creation, the chunk-alignment write
contract, shard_rows partition math, format-agnostic reads, TWO OS
PROCESSES writing one store concurrently, and the sharded stage-3 path
producing bit-identical distances to the single-writer HDF5 path.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from opencv_dlco_tpu.data.shard_store import (
    ShardedArrayStore,
    open_for_read,
    shard_rows,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_roundtrip_and_idempotent_create(tmp_path):
    st = ShardedArrayStore(str(tmp_path / "s"))
    st.create("D", (20, 8), np.float32, chunk_rows=4)
    st.create("D", (20, 8), np.float32, chunk_rows=4)   # race-tolerant
    x = np.arange(160, dtype=np.float32).reshape(20, 8)
    st.write_rows("D", 0, x[:8])
    st.write_rows("D", 8, x[8:])                        # ends at boundary
    np.testing.assert_array_equal(st.read("D"), x)
    np.testing.assert_array_equal(st.read("D", 4, 12), x[4:12])
    assert st.shape("D") == (20, 8)
    assert st.exists("D") and not st.exists("E")


def test_alignment_contract(tmp_path):
    st = ShardedArrayStore(str(tmp_path / "s"))
    st.create("D", (20, 4), np.float32, chunk_rows=4)
    with pytest.raises(ValueError):
        st.write_rows("D", 2, np.zeros((4, 4), np.float32))   # bad start
    with pytest.raises(ValueError):
        st.write_rows("D", 0, np.zeros((6, 4), np.float32))   # bad length
    # non-multiple length IS allowed when it ends at the array boundary
    st.write_rows("D", 16, np.ones((4, 4), np.float32))


def test_shard_rows_partition():
    for n_rows, chunk, n_w in ((100, 8, 3), (64, 64, 2), (7, 4, 4),
                               (500_000, 256, 8)):
        ranges = [shard_rows(n_rows, chunk, w, n_w) for w in range(n_w)]
        # disjoint, ordered, covering, chunk-aligned starts
        assert ranges[0][0] == 0
        assert ranges[-1][1] == n_rows
        for (lo, hi), (lo2, _) in zip(ranges, ranges[1:]):
            assert hi == lo2
        for lo, hi in ranges:
            assert lo <= hi
            if lo < hi:   # empty tail ranges are clamped, never written
                assert lo % chunk == 0


def test_done_markers_and_meta(tmp_path):
    st = ShardedArrayStore(str(tmp_path / "s"))
    assert not st.all_done(2)
    st.mark_done(0, {"rows": [0, 10]})
    assert not st.all_done(2)
    st.mark_done(1)
    assert st.all_done(2)
    st.set_meta("complete", True)
    assert st.get_meta("complete") is True
    assert st.get_meta("absent", 42) == 42


def test_open_for_read_dispatch(tmp_path):
    from opencv_dlco_tpu.data.store import ArtifactStore

    x = np.arange(24, dtype=np.float32).reshape(6, 4)
    h5 = str(tmp_path / "a.h5")
    with ArtifactStore(h5, "w") as st:
        st.write("D", x)
    zr = str(tmp_path / "a.zarr")
    sz = ShardedArrayStore(zr)
    sz.create("D", (6, 4), np.float32, chunk_rows=3)
    sz.write_rows("D", 0, x[:3])
    sz.write_rows("D", 3, x[3:])
    for path in (h5, zr):
        with open_for_read(path) as st:
            np.testing.assert_array_equal(st.read("D"), x)
            assert st.shape("D") == (6, 4)
            blocks = list(st.iter_rows("D", block=4))
            assert blocks[0][0] == 0 and blocks[1][0] == 4
            np.testing.assert_array_equal(
                np.concatenate([b for _, b in blocks]), x)


_WORKER = """
import sys
import numpy as np
sys.path.insert(0, {root!r})
from opencv_dlco_tpu.data.shard_store import ShardedArrayStore, shard_rows

wid, n_w, root = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
st = ShardedArrayStore(root)
st.create("D", (96, 16), np.float32, chunk_rows=8)   # all writers create
lo, hi = shard_rows(96, 8, wid, n_w)
rows = np.arange(lo, hi, dtype=np.float32)[:, None] * np.ones(16, np.float32)
st.write_rows("D", lo, rows)
st.mark_done(wid, {{"rows": [lo, hi]}})
"""


def test_two_process_concurrent_writers(tmp_path):
    """Two OS processes write disjoint chunk ranges of ONE store at the
    same time — the multi-host stage-3 write pattern h5py cannot do."""
    root = str(tmp_path / "conc")
    script = _WORKER.format(root=ROOT)
    procs = [subprocess.Popen([sys.executable, "-c", script,
                               str(w), "2", root],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE)
             for w in range(2)]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()
    st = ShardedArrayStore(root)
    assert st.all_done(2)
    got = st.read("D")
    want = np.arange(96, dtype=np.float32)[:, None] * np.ones(16, np.float32)
    np.testing.assert_array_equal(got, want)


def test_compdist_sharded_matches_h5(tmp_path):
    """Single-process run of the sharded stage-3 path: the zarr store must
    hold bit-identical distances/labels to the single-writer HDF5 path,
    be idempotent, and feed _load_split unchanged (format-agnostic L0)."""
    from opencv_dlco_tpu.data.store import ArtifactStore
    from opencv_dlco_tpu.data.synthetic import synth_patch_pairs
    from opencv_dlco_tpu.pipeline.stages import Workspace
    from opencv_dlco_tpu.utils.configs import PoolRegionConfig

    w = Workspace(str(tmp_path), pair_block=32,
                  pool_cfg=PoolRegionConfig(patch_size=64, nr=4, nphi=2,
                                            nsigma=2),
                  progress=False)
    rng = np.random.default_rng(5)
    p1, p2, labels = synth_patch_pairs(rng, n_pairs=96)
    n = len(labels)
    indices = np.zeros((n, 4), np.int32)
    indices[:, 0] = np.arange(n)
    indices[:, 2] = np.arange(n) + n
    indices[:, 1] = np.arange(n)
    indices[:, 3] = np.where(labels == 1, np.arange(n), np.arange(n) + n)
    with ArtifactStore(w.path("dataset", "synth.h5"), "w") as st:
        st.write("Indices", indices)
        st.write("Patches", np.concatenate([p1, p2]), chunk_rows=256)
    w.genpr()

    h5_path = w.compdist("synth", sharded=False)
    zarr_path = w.compdist("synth", sharded=True)
    assert zarr_path.endswith(".zarr") and os.path.isdir(zarr_path)
    with open_for_read(h5_path) as a, open_for_read(zarr_path) as b:
        np.testing.assert_array_equal(a.read("Distance"),
                                      b.read("Distance"))
        np.testing.assert_array_equal(a.read("Label").reshape(-1),
                                      b.read("Label").reshape(-1))
    # idempotent (all_done short-circuit)
    assert w.compdist("synth", sharded=True) == zarr_path
    # the learner's split loader is format-agnostic
    s_h5 = w._load_split(h5_path, 0.8, 2215)
    s_zr = w._load_split(zarr_path, 0.8, 2215)
    for k in s_h5:
        np.testing.assert_array_equal(s_h5[k], s_zr[k])
