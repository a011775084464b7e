"""Keyed state storage (SURVEY.md S4: elasticsearch_state_storage).

The reference wraps an LRU cache over ES mget/mset
(asset/src/elasticsearch_state_storage/api.ts:4-30). In Spark the
per-worker LRU disappears: `mget` is a broadcast/semi join against the
backing table, `mset` is a keyed merge + snapshot write, and hot reads
are `.persist()`. The chunked-mget concurrency knobs (chunk 2500,
concurrency 10 — schema.ts:14-37) are subsumed by partitioned joins.

Backing store: a parquet snapshot directory (snapshot-NNNN); writes are
atomic by directory-swap via a `_latest` pointer file — the Iceberg
commit analogue, sufficient for single-writer semantics.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elasticsearch_assets_spark.operators.writer import merge_index


class StateStorage:
    def __init__(self, spark: SparkSession, path: str, key: str = "doc_id"):
        self.spark = spark
        self.path = path
        self.key = key
        os.makedirs(path, exist_ok=True)

    # -- snapshot plumbing -------------------------------------------------
    def _pointer(self) -> str:
        return os.path.join(self.path, "_latest")

    def _latest_snapshot(self) -> str | None:
        p = self._pointer()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)["snapshot"]

    def _commit(self, snap_dir: str) -> None:
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"snapshot": snap_dir}, f)
        os.replace(tmp, self._pointer())  # atomic commit point

    # -- API (mirrors get/set/mget/mset) ------------------------------------
    def table(self) -> DataFrame | None:
        snap = self._latest_snapshot()
        if snap is None:
            return None
        return self.spark.read.parquet(snap)

    def mset(self, updates: DataFrame) -> None:
        """Upsert a batch of keyed records (last write wins per key)."""
        cur = self.table()
        new = updates if cur is None else merge_index(cur, updates, self.key)
        n = 0
        snap = self._latest_snapshot()
        if snap is not None:
            n = int(os.path.basename(snap).split("-")[1]) + 1
        snap_dir = os.path.join(self.path, f"snapshot-{n:06d}")
        new.write.mode("overwrite").parquet(snap_dir)
        self._commit(snap_dir)

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
