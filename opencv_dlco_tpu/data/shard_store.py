"""Sharded multi-writer array store (tensorstore/zarr) — distributed L0.

SURVEY.md §5 names "a sharded array checkpoint store (zarr/tensorstore
style) replacing chunked HDF5" as the TPU build's distributed storage
layer: the reference's opencv_hdf files are single-writer by construction
(and h5py enforces it), so a multi-host stage-3 run — each host computing
a row range of the 500k x 5120 distance matrix — cannot stream into one
HDF5 file. This store keeps the same named-2D-array model as
data/store.ArtifactStore but backs it with chunked zarr arrays via
tensorstore, where writes to DISJOINT CHUNKS are concurrency-safe: every
process owns a chunk-aligned row range and writes it directly, no
primary-writer funnel, no host gather.

Write discipline (enforced, not advisory):
  * array creation is idempotent and race-tolerant (all processes may
    call create; the winner creates, the rest open);
  * ``write_rows`` requires chunk-aligned starts and either chunk-aligned
    lengths or a write that ends at the array boundary — exactly the
    disjoint-chunk condition under which concurrent writers never touch
    the same file object;
  * completion is per-writer: each process marks its own shard done and
    readers gate on all_done(n_writers) — the multi-writer analogue of
    ArtifactStore's single "complete" flag.

The HDF5 store stays the default for single-host runs (the reference's
artifact format, loaded directly by the golden tests); Workspace.compdist
switches to this store for multi-process runs.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np

_DTYPE_MAP = {
    np.dtype(np.float32): "<f4",
    np.dtype(np.float64): "<f8",
    np.dtype(np.int32): "<i4",
    np.dtype(np.int64): "<i8",
    np.dtype(np.uint8): "|u1",
    np.dtype(np.bool_): "|b1",
}


class ShardedArrayStore:
    """Directory of named chunked zarr arrays with multi-writer row writes.

    Layout: <root>/<name>/ holds one zarr array; <root>/_meta/ holds the
    JSON sidecars (per-writer done markers + free-form metadata).
    """

    def __init__(self, root: str):
        import tensorstore  # noqa: F401  (fail fast if unavailable)

        self.root = root
        os.makedirs(os.path.join(root, "_meta"), exist_ok=True)
        self._open: dict = {}

    # -- array lifecycle ---------------------------------------------------

    def _spec(self, name: str, **extra):
        return {
            "driver": "zarr",
            "kvstore": {"driver": "file",
                        "path": os.path.join(self.root, name)},
            **extra,
        }

    def create(self, name: str, shape: Tuple[int, ...], dtype,
               chunk_rows: int) -> None:
        """Idempotent, race-tolerant creation of a chunked array.

        chunk_rows is the leading-axis chunk size — the write-granularity
        contract every writer must honour. Trailing axes are unchunked
        (row writes always span them whole).
        """
        import tensorstore as ts

        dt = _DTYPE_MAP[np.dtype(dtype)]
        chunks = [min(chunk_rows, shape[0])] + [max(int(s), 1)
                                                for s in shape[1:]]
        spec = self._spec(
            name,
            metadata={"shape": list(shape), "chunks": chunks, "dtype": dt},
            create=True, open=True)  # open existing if already created
        self._open[name] = ts.open(spec).result()

    def _handle(self, name: str):
        import tensorstore as ts

        if name not in self._open:
            self._open[name] = ts.open(self._spec(name, open=True)).result()
        return self._open[name]

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self.root, name, ".zarray"))

    def shape(self, name: str) -> Tuple[int, ...]:
        return tuple(self._handle(name).shape)

    def chunk_rows(self, name: str) -> int:
        return int(self._handle(name).chunk_layout.read_chunk.shape[0])

    # -- multi-writer IO ---------------------------------------------------

    def write_rows(self, name: str, start: int, arr: np.ndarray) -> None:
        """Write arr into rows [start, start+len) — chunk-aligned only.

        Concurrent processes writing disjoint chunk-aligned ranges never
        contend (zarr chunks are independent files); a misaligned write
        would silently share a chunk file with a neighbour, so it is an
        error here, not a slow path.
        """
        h = self._handle(name)
        rows = int(h.chunk_layout.read_chunk.shape[0])
        n = arr.shape[0]
        if n == 0:
            # empty shard (more writers than chunks): nothing to write and
            # a clamped start (shard_rows) may sit mid-chunk — not an
            # alignment violation, since no chunk file is touched
            return
        if start % rows:
            raise ValueError(
                f"write start {start} not aligned to chunk_rows {rows}")
        if n % rows and start + n != h.shape[0]:
            raise ValueError(
                f"write length {n} not chunk-aligned (chunk_rows {rows}) "
                f"and does not end at the array boundary {h.shape[0]}")
        h[start:start + n].write(np.ascontiguousarray(arr)).result()

    def read(self, name: str, lo: int = 0,
             hi: Optional[int] = None) -> np.ndarray:
        h = self._handle(name)
        hi = h.shape[0] if hi is None else hi
        return np.asarray(h[lo:hi].read().result())

    # -- completion + metadata (JSON sidecars; tiny, per-writer files) ------

    def mark_done(self, writer_id: int, payload: Optional[dict] = None):
        path = os.path.join(self.root, "_meta", f"done-{writer_id}.json")
        with open(path, "w") as f:
            json.dump({"writer": writer_id, **(payload or {})}, f)

    def all_done(self, n_writers: int) -> bool:
        return all(
            os.path.exists(os.path.join(self.root, "_meta",
                                        f"done-{w}.json"))
            for w in range(n_writers))

    def set_meta(self, key: str, value) -> None:
        path = os.path.join(self.root, "_meta", "meta.json")
        meta = {}
        if os.path.exists(path):
            with open(path) as f:
                meta = json.load(f)
        meta[key] = value
        with open(path, "w") as f:
            json.dump(meta, f)

    def get_meta(self, key: str, default=None):
        path = os.path.join(self.root, "_meta", "meta.json")
        if not os.path.exists(path):
            return default
        with open(path) as f:
            return json.load(f).get(key, default)


def shard_rows(n_rows: int, chunk_rows: int, writer_id: int,
               n_writers: int) -> Tuple[int, int]:
    """Chunk-aligned contiguous [lo, hi) row range of one writer.

    Chunks are dealt as evenly as possible; every boundary is a chunk
    boundary, so concurrent writers satisfy write_rows' alignment contract
    by construction.
    """
    n_chunks = -(-n_rows // chunk_rows)
    per = n_chunks // n_writers
    extra = n_chunks % n_writers
    first = writer_id * per + min(writer_id, extra)
    count = per + (1 if writer_id < extra else 0)
    # more writers than chunks: the tail writers own empty (clamped) ranges
    lo = min(first * chunk_rows, n_rows)
    hi = min((first + count) * chunk_rows, n_rows)
    return lo, hi


class ShardedReadView:
    """ArtifactStore-shaped read-only view over a ShardedArrayStore root,
    so downstream readers (_load_split, stats, resume checks) are
    format-agnostic: ``with open_for_read(path) as st: st.read(...)``
    works for both .h5 files and sharded zarr directories."""

    def __init__(self, root: str):
        self._s = ShardedArrayStore(root)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def exists(self, name: str) -> bool:
        return self._s.exists(name)

    def read(self, name: str, start: Optional[int] = None,
             stop: Optional[int] = None) -> np.ndarray:
        if start is None:
            return self._s.read(name)
        return self._s.read(name, start, stop)

    def shape(self, name: str) -> Tuple[int, ...]:
        return self._s.shape(name)

    def iter_rows(self, name: str, block: int = 4096):
        n = self._s.shape(name)[0]
        for s in range(0, n, block):
            yield s, self._s.read(name, s, min(s + block, n))

    def get_meta(self, key: str, default=None):
        return self._s.get_meta(key, default)


def open_for_read(path: str):
    """ArtifactStore for .h5 files, ShardedReadView for zarr directories."""
    if os.path.isdir(path):
        return ShardedReadView(path)
    from .store import ArtifactStore

    return ArtifactStore(path, "r")
