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
