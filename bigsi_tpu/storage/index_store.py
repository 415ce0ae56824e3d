"""One storage story.

The reference ships three KV backends (RocksDB / BerkeleyDB / Redis,
``bigsi/storage/``) because its matrix lives row-at-a-time in a
database.  Here the matrix is a dense packed array, so persistence is a
directory::

    index_dir/
      manifest.json   # format version, k/m/h, dims, metadata KV
      rows.bin        # uint32[m, W] little-endian, row-major, mmap-able

``rows.bin`` is written with a small header-free flat layout so it can
be ``np.memmap``'d on hosts and fed to the device in column shards.  A
:class:`MemoryStore` provides the same API fully in-process for tests;
reference engine names in configs ("berkeleydb", "rocksdb", "redis")
are accepted and mapped onto these two (drop-in config compatibility).
"""

from __future__ import annotations

import json
import logging
import os
import shutil

import numpy as np

from bigsi_tpu.matrix.bitmatrix import BitSliceMatrix
from bigsi_tpu.storage.kv import TypedKV

logger = logging.getLogger(__name__)

MANIFEST = "manifest.json"
ROWS_BIN = "rows.bin"
FORMAT_VERSION = 1

# In-process registry so MemoryStore state survives re-instantiation via
# BIGSI(config), mirroring how the reference re-opens a database.
_MEMORY_REGISTRY: dict = {}


class BaseIndexStore:
    """Common surface: a TypedKV plus matrix load/save."""

    kv: TypedKV

    def has_index(self) -> bool:
        raise NotImplementedError

    def load_matrix(self) -> BitSliceMatrix:
        raise NotImplementedError

    def save_matrix(self, matrix: BitSliceMatrix) -> None:
        raise NotImplementedError

    def sync(self) -> None:
        pass

    def close(self) -> None:
        pass

    def delete_all(self) -> None:
        raise NotImplementedError


class MemoryStore(BaseIndexStore):
    def __init__(self, name: str = "default"):
        self.name = name
        state = _MEMORY_REGISTRY.setdefault(name, {"kv": TypedKV(), "matrix": None})
        self.kv = state["kv"]

    def has_index(self) -> bool:
        return _MEMORY_REGISTRY[self.name]["matrix"] is not None

    def load_matrix(self) -> BitSliceMatrix:
        m = _MEMORY_REGISTRY[self.name]["matrix"]
        if m is None:
            raise KeyError("no index built in memory store %r" % self.name)
        return m

    def save_matrix(self, matrix: BitSliceMatrix) -> None:
        _MEMORY_REGISTRY[self.name]["matrix"] = matrix

    def delete_all(self) -> None:
        self.kv.delete_all()
        _MEMORY_REGISTRY[self.name] = {"kv": TypedKV(), "matrix": None}
        self.kv = _MEMORY_REGISTRY[self.name]["kv"]


class IndexStore(BaseIndexStore):
    def __init__(self, directory: str, mmap: bool = True):
        self.directory = directory
        self.mmap = mmap
        self._manifest = None
        self.kv = TypedKV()
        if os.path.exists(self._manifest_path()):
            with open(self._manifest_path()) as f:
                self._manifest = json.load(f)
            self.kv = TypedKV.from_dict(self._manifest.get("kv", {}))

    def _manifest_path(self) -> str:
        return os.path.join(self.directory, MANIFEST)

    def _rows_path(self) -> str:
        return os.path.join(self.directory, ROWS_BIN)

    def rows_path(self) -> str:
        """Target path for bulk builders that stream rows.bin directly
        (register the result with :meth:`adopt_rows`)."""
        os.makedirs(self.directory, exist_ok=True)
        return self._rows_path()

    def has_index(self) -> bool:
        return self._manifest is not None and "num_rows" in self._manifest

    def load_matrix(self) -> BitSliceMatrix:
        if not self.has_index():
            raise KeyError("no index at %s" % self.directory)
        man = self._manifest
        shape = (man["num_rows"], man["num_words"])
        if self.mmap:
            words = np.memmap(self._rows_path(), dtype=np.uint32, mode="r", shape=shape)
        else:
            words = np.fromfile(self._rows_path(), dtype=np.uint32).reshape(shape)
        return BitSliceMatrix(np.asarray(words), man["num_cols"])

    def save_matrix(self, matrix: BitSliceMatrix) -> None:
        os.makedirs(self.directory, exist_ok=True)
        tmp = self._rows_path() + ".tmp"
        arr = np.ascontiguousarray(matrix.words, dtype=np.uint32)
        with open(tmp, "wb") as f:
            arr.tofile(f)
        os.replace(tmp, self._rows_path())
        if self._manifest is None:
            self._manifest = {"format_version": FORMAT_VERSION}
        self._manifest.update(
            {
                "num_rows": matrix.num_rows,
                "num_words": matrix.num_words,
                "num_cols": matrix.num_cols,
                "dtype": "uint32",
                "layout": "lsb32-le",
            }
        )
        self.sync()

    def adopt_rows(self, num_rows: int, num_words: int, num_cols: int) -> None:
        """Register an externally written ``rows.bin`` (bulk-build path).

        Large builds stream packed rows straight into ``rows.bin``
        (uint32 little-endian row-major, the documented layout) instead
        of materializing the matrix in RAM for :meth:`save_matrix`.
        """
        expected = num_rows * num_words * 4
        actual = os.path.getsize(self._rows_path())
        if actual != expected:
            raise ValueError(
                "rows.bin is %d bytes, expected %d (%d x %d uint32)"
                % (actual, expected, num_rows, num_words)
            )
        if self._manifest is None:
            self._manifest = {"format_version": FORMAT_VERSION}
        self._manifest.update(
            {
                "num_rows": num_rows,
                "num_words": num_words,
                "num_cols": num_cols,
                "dtype": "uint32",
                "layout": "lsb32-le",
            }
        )
        self.sync()

    def sync(self) -> None:
        if self._manifest is None:
            self._manifest = {"format_version": FORMAT_VERSION}
        self._manifest["kv"] = self.kv.to_dict()
        os.makedirs(self.directory, exist_ok=True)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._manifest, f)
        os.replace(tmp, self._manifest_path())
        self.kv.dirty = False

    def close(self) -> None:
        if self.kv.dirty:
            self.sync()

    def delete_all(self) -> None:
        if os.path.isdir(self.directory):
            shutil.rmtree(self.directory)
        self._manifest = None
        self.kv = TypedKV()


_WARNED_ENGINES = set()


def get_storage(config: dict) -> BaseIndexStore:
    """Storage factory — accepts reference configs verbatim.

    Reference factory: ``bigsi/storage/__init__.py:18-19``.  Engines map:
    ``bigsi-tpu``/``disk`` and the reference's ``berkeleydb``/``rocksdb``
    -> :class:`IndexStore` on ``storage-config.filename``;
    ``redis`` -> :class:`IndexStore` on a host-port-derived directory;
    ``memory`` -> :class:`MemoryStore`.
    """
    engine = config.get("storage-engine", "bigsi-tpu")
    sc = config.get("storage-config", {}) or {}
    if engine == "memory":
        return MemoryStore(sc.get("filename", "default"))
    if engine in ("bigsi-tpu", "disk", "berkeleydb", "rocksdb"):
        if engine in ("berkeleydb", "rocksdb") and engine not in _WARNED_ENGINES:
            _WARNED_ENGINES.add(engine)
            logger.warning(
                "storage-engine %r is emulated by the native index store", engine
            )
        filename = sc.get("filename", "bigsi-tpu-index")
        return IndexStore(filename)
    if engine == "redis":
        name = "bigsi-redis-%s-%s" % (sc.get("host", "localhost"), sc.get("port", 6379))
        if engine not in _WARNED_ENGINES:
            _WARNED_ENGINES.add(engine)
            logger.warning(
                "storage-engine 'redis' is emulated by a local index store at %s", name
            )
        return IndexStore(name)
    raise ValueError("unknown storage-engine %r" % engine)
