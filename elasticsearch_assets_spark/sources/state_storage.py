"""Keyed state storage (SURVEY.md S4: elasticsearch_state_storage).

The reference wraps an LRU cache over ES mget/mset
(asset/src/elasticsearch_state_storage/api.ts:4-30). In Spark the
per-worker LRU disappears: `mget` is a broadcast/semi join against the
backing table, `mset` is a keyed merge + snapshot write, and hot reads
are `.persist()`. The chunked-mget concurrency knobs (chunk 2500,
concurrency 10 — schema.ts:14-37) are subsumed by partitioned joins.

Backing store: a base parquet snapshot + ordered delta directories,
committed via MONOTONICALLY VERSIONED commit files claimed with an
atomic hard-link (the filesystem CAS). `mset` writes ONLY the update
batch as a delta (no full-table rewrite); once `compact_every` deltas
accumulate, the merged table is materialized into a fresh base snapshot
and the deltas retire — classic LSM shape, so write cost is O(batch)
amortized instead of O(table) per call.

Concurrent writers (K1.i retry-on-conflict,
ElasticsearchBulkSender.ts:88-90 `retry_on_conflict`): each commit
claims version N+1 by hard-linking a fully-written temp file to
`_commit-{N+1}` — exactly one writer can create that name, the loser
re-reads the new state (which now includes the winner's deltas),
re-merges its OWN delta on top and retries, up to `retry_on_conflict`
times. No delta is ever lost to a pointer race, unlike the previous
last-pointer-write-wins `_latest` file. On an object store without
atomic link/rename the same protocol maps onto conditional PUTs
(If-None-Match) or an Iceberg/metastore optimistic commit.
"""

from __future__ import annotations

import json
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elasticsearch_assets_spark.operators.writer import merge_index

_COMMIT_RE = re.compile(r"^_commit-(\d{12})\.json$")


class CommitConflictError(RuntimeError):
    """All retry_on_conflict attempts lost the commit race."""


class StateStorage:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str = "doc_id",
        compact_every: int = 8,
        retry_on_conflict: int = 10,
    ):
        self.spark = spark
        self.path = path
        self.key = key
        self.compact_every = compact_every
        self.retry_on_conflict = retry_on_conflict
        os.makedirs(path, exist_ok=True)

    # -- snapshot plumbing -------------------------------------------------
    def _commit_path(self, version: int) -> str:
        return os.path.join(self.path, f"_commit-{version:012d}.json")

    def _versioned_state(self) -> tuple[dict, int]:
        """Current (state, version). Version 0 = nothing committed yet
        (or only a legacy `_latest` pointer, absorbed read-only)."""
        best = -1
        for name in os.listdir(self.path):
            m = _COMMIT_RE.match(name)
            if m:
                best = max(best, int(m.group(1)))
        if best >= 0:
            with open(self._commit_path(best)) as f:
                return json.load(f), best
        legacy = os.path.join(self.path, "_latest")
        if os.path.exists(legacy):
            with open(legacy) as f:
                st = json.load(f)
            if "snapshot" in st:  # pre-delta pointer layout
                st = {"base": st["snapshot"], "deltas": []}
            return st, 0
        return {"base": None, "deltas": []}, 0

    def _state(self) -> dict:
        return self._versioned_state()[0]

    def _try_commit(self, version: int, state: dict) -> bool:
        """CAS: write the full state to a temp file, then hard-link it
        to the versioned commit name — link(2) is atomic and fails if
        the name exists, so exactly ONE writer claims each version and
        the name only ever appears fully written."""
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(state, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, self._commit_path(version))
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def _next_dir(self, kind: str) -> str:
        import time as _t

        return os.path.join(
            self.path,
            f"{kind}-{int(_t.time() * 1000):013d}-{uuid.uuid4().hex[:8]}",
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
        the merged table compacts into a fresh base snapshot. The
        commit is an optimistic CAS: a lost race re-reads the winner's
        state and re-applies THIS delta on top, `retry_on_conflict`
        times (K1.i)."""
        delta_dir = self._next_dir("delta")
        updates.write.mode("overwrite").parquet(delta_dir)
        for _attempt in range(self.retry_on_conflict + 1):
            state, version = self._versioned_state()
            deltas = state["deltas"] + [delta_dir]
            snap_dir = None
            if state["base"] is None or len(deltas) >= self.compact_every:
                merged = self._merged({"base": state["base"], "deltas": deltas})
                snap_dir = self._next_dir("snapshot")
                merged.write.mode("overwrite").parquet(snap_dir)
                new_state = {"base": snap_dir, "deltas": []}
            else:
                new_state = {"base": state["base"], "deltas": deltas}
            if self._try_commit(version + 1, new_state):
                return
            # lost the race: drop the orphaned snapshot (the delta is
            # still ours to re-commit against the NEW state)
            if snap_dir is not None:
                import shutil

                shutil.rmtree(snap_dir, ignore_errors=True)
        raise CommitConflictError(
            f"mset lost the commit race {self.retry_on_conflict + 1} "
            f"times (retry_on_conflict={self.retry_on_conflict})"
        )

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
