"""Query-result cache.

≙ the reference's Cache crate: async KV store of RecordBatch vectors with
hit/miss tracing (/root/reference/crates/cache/src/lib.rs:20-56). Here the
key is (normalized SQL, catalog epoch) and the value is the finished
DeviceTable — results stay resident in HBM, so a repeated query costs one
dictionary lookup. Table registration/CTAS/DROP bumps the epoch,
invalidating stale entries (the CDC-style invalidation the reference left
as a roadmap stub, /root/reference/crates/cdc/src/lib.rs:1-17).
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from typing import Optional

from .table import DeviceTable


class ResultCache:
    def __init__(self, max_entries: int = 64):
        self._max = max_entries
        self._store: OrderedDict[tuple, DeviceTable] = OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    @staticmethod
    def normalize(sql: str) -> str:
        return " ".join(sql.strip().rstrip(";").split()).lower()

    def get(self, sql: str, epoch: int) -> Optional[DeviceTable]:
        key = (self.normalize(sql), epoch)
        with self._lock:
            hit = self._store.get(key)
            if hit is not None:
                self.hits += 1
                self._store.move_to_end(key)
            else:
                self.misses += 1
            return hit

    def put(self, sql: str, epoch: int, table: DeviceTable) -> None:
        key = (self.normalize(sql), epoch)
        with self._lock:
            self._store[key] = table
            self._store.move_to_end(key)
            while len(self._store) > self._max:
                self._store.popitem(last=False)

    def clear(self) -> None:
        with self._lock:
            self._store.clear()


class PersistentResultCache(ResultCache):
    """Two-tier result cache: the in-memory LRU over an on-disk Arrow IPC
    store (≙ the reference's roadmap item "Persistent Cache Backends
    (RocksDB, Redis)", /root/reference/README.md:225 — unbuilt there).

    Disk keys hash the normalized SQL together with a catalog
    *fingerprint* (file path + mtime + size per table, plus registered
    UDF names), so entries survive process restarts and invalidate when
    any source file changes. Queries over in-memory tables carry a
    process-local fingerprint component and therefore never produce
    stale cross-process hits.
    """

    def __init__(self, cache_dir: str, max_entries: int = 64,
                 max_disk_entries: int = 256):
        super().__init__(max_entries)
        import os
        self.dir = cache_dir
        self._max_disk = max_disk_entries
        os.makedirs(cache_dir, exist_ok=True)

    @staticmethod
    def _digest(sql: str, fingerprint: str) -> str:
        import hashlib
        h = hashlib.sha256()
        h.update(ResultCache.normalize(sql).encode())
        h.update(b"\x00")
        h.update(fingerprint.encode())
        return h.hexdigest()

    def _path(self, sql: str, fingerprint: str) -> str:
        import os
        return os.path.join(self.dir,
                            self._digest(sql, fingerprint) + ".arrow")

    def get(self, sql: str, epoch: int, fingerprint: Optional[str] = None
            ) -> Optional[DeviceTable]:
        hit = super().get(sql, epoch)
        if hit is not None or fingerprint is None:
            return hit
        import os

        import pyarrow as pa
        path = self._path(sql, fingerprint)
        if not os.path.exists(path):
            return None
        try:
            with pa.ipc.open_file(path) as rd:
                arrow = rd.read_all()
            os.utime(path)                       # LRU recency on disk
        except (OSError, pa.ArrowInvalid):
            return None
        table = DeviceTable.from_arrow(arrow)
        super().put(sql, epoch, table)           # promote to memory tier
        with self._lock:
            self.hits += 1
            self.misses -= 1
        return table

    def put(self, sql: str, epoch: int, table: DeviceTable,
            fingerprint: Optional[str] = None) -> None:
        super().put(sql, epoch, table)
        if fingerprint is None:
            return
        import os

        import pyarrow as pa
        path = self._path(sql, fingerprint)
        tmp = path + f".tmp{os.getpid()}"
        try:
            arrow = table.to_arrow()
            with pa.ipc.new_file(tmp, arrow.schema) as wr:
                wr.write_table(arrow)
            os.replace(tmp, path)                # atomic publish
        except OSError:
            if os.path.exists(tmp):
                os.unlink(tmp)
            return
        self._evict_disk()

    def _evict_disk(self) -> None:
        import os
        try:
            entries = [(os.path.getmtime(os.path.join(self.dir, f)),
                        os.path.join(self.dir, f))
                       for f in os.listdir(self.dir) if f.endswith(".arrow")]
        except OSError:
            return
        entries.sort()
        for _, p in entries[:max(0, len(entries) - self._max_disk)]:
            try:
                os.unlink(p)
            except OSError:
                pass
