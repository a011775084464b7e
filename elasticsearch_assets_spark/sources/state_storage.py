"""Keyed state storage (SURVEY.md S4: elasticsearch_state_storage).

The reference wraps an LRU cache over ES mget/mset
(asset/src/elasticsearch_state_storage/api.ts:4-30). In Spark the
per-worker LRU disappears: `mget` is a broadcast/semi join against the
backing table, `mset` is a keyed merge + snapshot write, and hot reads
are `.persist()`. The chunked-mget concurrency knobs (chunk 2500,
concurrency 10 — schema.ts:14-37) are subsumed by partitioned joins.

Backing store: a base parquet snapshot + ordered delta directories,
committed atomically via a `_latest` pointer file — the Iceberg commit
analogue, sufficient for single-writer semantics. `mset` writes ONLY
the update batch as a delta (no full-table rewrite); once
`compact_every` deltas accumulate, the merged table is materialized
into a fresh base snapshot and the deltas retire — classic LSM shape,
so write cost is O(batch) amortized instead of O(table) per call.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elasticsearch_assets_spark.operators.writer import merge_index


class StateStorage:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str = "doc_id",
        compact_every: int = 8,
    ):
        self.spark = spark
        self.path = path
        self.key = key
        self.compact_every = compact_every
        self._seq = 0
        os.makedirs(path, exist_ok=True)

    # -- snapshot plumbing -------------------------------------------------
    def _pointer(self) -> str:
        return os.path.join(self.path, "_latest")

    def _state(self) -> dict:
        p = self._pointer()
        if not os.path.exists(p):
            return {"base": None, "deltas": []}
        with open(p) as f:
            st = json.load(f)
        if "snapshot" in st:  # pre-delta pointer layout
            return {"base": st["snapshot"], "deltas": []}
        return st

    def _commit(self, base: str | None, deltas: list[str]) -> None:
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"base": base, "deltas": deltas}, f)
        os.replace(tmp, self._pointer())  # atomic commit point

    def _next_dir(self, kind: str) -> str:
        self._seq += 1
        import time as _t

        return os.path.join(
            self.path, f"{kind}-{int(_t.time() * 1000):013d}-{self._seq:04d}"
        )

    def _merged(self, state: dict) -> DataFrame | None:
        base = (
            self.spark.read.parquet(state["base"])
            if state["base"] is not None
            else None
        )
        cur = base
        for d in state["deltas"]:
            delta = self.spark.read.parquet(d)
            cur = delta if cur is None else merge_index(cur, delta, self.key)
        return cur

    # -- API (mirrors get/set/mget/mset) ------------------------------------
    def table(self) -> DataFrame | None:
        """Current state: base snapshot + ordered delta merges (lazy —
        one plan, no materialization until an action runs)."""
        return self._merged(self._state())

    def mset(self, updates: DataFrame) -> None:
        """Upsert a batch of keyed records (last write wins per key).
        Writes ONLY the batch as a delta; every `compact_every` deltas
        the merged table compacts into a fresh base snapshot."""
        state = self._state()
        delta_dir = self._next_dir("delta")
        updates.write.mode("overwrite").parquet(delta_dir)
        deltas = state["deltas"] + [delta_dir]
        if state["base"] is None or len(deltas) >= self.compact_every:
            merged = self._merged({"base": state["base"], "deltas": deltas})
            snap_dir = self._next_dir("snapshot")
            merged.write.mode("overwrite").parquet(snap_dir)
            self._commit(snap_dir, [])
        else:
            self._commit(state["base"], deltas)

    def mget(self, keys: DataFrame) -> DataFrame:
        """Fetch records for a keyed frame — broadcast join when the key
        set is small (the mget analogue), plain join otherwise."""
        cur = self.table()
        if cur is None:
            return keys.limit(0)
        return cur.join(F.broadcast(keys.select(self.key).distinct()), self.key, "left_semi")

    def get(self, key_value) -> dict | None:
        cur = self.table()
        if cur is None:
            return None
        rows = cur.where(F.col(self.key) == key_value).limit(1).collect()
        return rows[0].asDict() if rows else None

    def set(self, record: dict) -> None:
        self.mset(self.spark.createDataFrame([record]))

    def cached(self) -> DataFrame | None:
        """Hot-read path: persist the latest snapshot (replaces the
        reference's 2^31-entry LRU)."""
        t = self.table()
        return t.persist() if t is not None else None
