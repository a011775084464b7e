"""Per-partition lineage manifests + checkpoint/resume + incremental
maintenance (SURVEY.md D6/D7/O11 + §7.8; FIXTURES.md T4).

The reference tracks slice-level progress with hole bookkeeping
(dateSlicer.ts:308-335, date-helpers.ts:287-390) so a killed run resumes
without re-reading completed ranges. Spark-native equivalent:

- the index build is decomposed into `n_parts` independent input
  partitions (pmod(xxhash64(doc_id), n_parts) — stable across runs
  because doc_id is content-derived, never monotonically_increasing_id)
- each completed part atomically lands TWO artifacts: its postings
  parquet directory (postings/part=K) and a ONE-ROW manifest parquet at
  manifest/pK whose overwrite is the commit point (Iceberg snapshot
  commit in production) — one current row per part, no ambiguity
- resume = parts without a done manifest row — the reference's "holes"
  are exactly the missing manifest rows
- incremental maintenance = parts whose manifest fingerprint no longer
  matches the input: fingerprint = order-independent sum over
  pmod(xxhash64(doc_id, content_sha), p), so adds, deletes, AND
  content-only edits all flip the affected partition — nothing else
  rebuilds
- manifest rows carry per-partition lineage metrics (rows, bytes,
  duration_ms) — the north rule's "per-partition lineage + metrics"
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elasticsearch_assets_spark.functions.analyzer import analyze_col
from elasticsearch_assets_spark.indexing.build import with_doc_id

MANIFEST_SCHEMA = (
    "run_id string, partition_id int, input_fingerprint string, "
    "rows long, bytes long, duration_ms long, status string, "
    "replaces string"
)

_FP_MOD = 1_000_003


def _part_dir(path: str, part: int) -> str:
    return os.path.join(path, "postings", f"part={part}")


def _pos_part_dir(path: str, part: int) -> str:
    return os.path.join(path, "positions", f"part={part}")


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "manifest")


def _manifest_part_dir(path: str, part: int) -> str:
    return os.path.join(_manifest_dir(path), f"p{part}")


def _build_meta_path(path: str) -> str:
    return os.path.join(path, "build_meta.json")


def read_build_meta(path: str) -> dict:
    """Build-time settings of a resumable index (currently just
    keep_positions). Empty dict for pre-meta indexes."""
    import json as _json

    p = _build_meta_path(path)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return _json.load(f)


def _record_build_meta(path: str, keep_positions: bool) -> None:
    """Persist keep_positions so later refresh/resume runs default to
    the index's own setting. A conflicting explicit flag raises: a
    resume that flips keep_positions would leave a MIXED index (some
    parts with prox dirs, some without) that silently loses phrase
    recall for the positions-less parts."""
    import json as _json

    meta = read_build_meta(path)
    if "keep_positions" in meta and meta["keep_positions"] != keep_positions:
        raise ValueError(
            f"index at {path} was built with keep_positions="
            f"{meta['keep_positions']}; pass keep_positions="
            f"{meta['keep_positions']} (or rebuild from scratch) instead of "
            f"{keep_positions} — mixing would silently drop phrase recall"
        )
    os.makedirs(path, exist_ok=True)
    with open(_build_meta_path(path), "w") as f:
        _json.dump({"keep_positions": keep_positions}, f)


def _fp_col():
    return F.sum(F.pmod(F.xxhash64("doc_id", "content_sha"), F.lit(_FP_MOD))).alias(
        "fp"
    )


def _with_parts(
    docs: DataFrame, id_cols, text_col: str, n_parts: int, part_offset: int = 0
) -> DataFrame:
    return with_doc_id(docs, id_cols, text_col).withColumn(
        "_part",
        (F.lit(part_offset) + F.pmod(F.xxhash64("doc_id"), F.lit(n_parts))).cast(
            "int"
        ),
    )


def _fresh_fingerprints(base: DataFrame) -> dict[int, str]:
    return {
        r["_part"]: str(r["fp"])
        for r in base.groupBy("_part").agg(_fp_col()).collect()
    }


def _build_part(
    base: DataFrame, path: str, part: int, n_buckets: int, text_col: str,
    run_id: str, keep_positions: bool = False,
) -> None:
    """Build one partition's postings (+ optional prox stream) and
    commit its manifest row LAST (the row is the atomic commit point,
    so a crash between data and manifest writes just rebuilds the
    part). Same single-token-groupBy shape as indexing/build: dl is
    computed MAP-SIDE as size(analyzed tokens) — the former
    sum(tf)-over-doc window cost an extra per-part exchange — and with
    keep_positions the postings derive from the prox aggregation
    (tf = size(positions)), so tokens shuffle once either way."""
    spark = base.sparkSession
    t0 = time.time()
    sub = base.where(F.col("_part") == part)
    toks = sub.withColumn("_toks", analyze_col(text_col)).withColumn(
        "dl", F.coalesce(F.size("_toks"), F.lit(0)).cast("int")
    )
    tokens = toks.select(
        "doc_id", "dl", F.posexplode("_toks").alias("pos", "term")
    )
    bucket = F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
    if keep_positions:
        prox = (
            tokens.groupBy("term", "doc_id")
            .agg(
                F.sort_array(F.collect_list("pos")).alias("positions"),
                F.first("dl").alias("dl"),
            )
            .withColumn("bucket", bucket)
        )
        prox.write.mode("overwrite").parquet(_pos_part_dir(path, part))
        prox = spark.read.parquet(_pos_part_dir(path, part))
        tfd = prox.select(
            "term",
            "doc_id",
            F.size("positions").cast("int").alias("tf"),
            "dl",
            "bucket",
        )
    else:
        tfd = (
            tokens.groupBy("term", "doc_id")
            .agg(F.count("*").cast("int").alias("tf"), F.first("dl").alias("dl"))
            .withColumn("bucket", bucket)
        )
        # a positions-less rebuild of a part previously built WITH
        # positions must not leave a stale prox dir behind
        import shutil

        shutil.rmtree(_pos_part_dir(path, part), ignore_errors=True)
    tfd.write.mode("overwrite").parquet(_part_dir(path, part))

    stats = sub.agg(
        F.count("*").alias("rows"), _fp_col(), F.sum(F.length(text_col)).alias("bytes")
    ).collect()[0]
    row = [
        (
            run_id,
            part,
            str(stats["fp"] if stats["fp"] is not None else 0),
            int(stats["rows"] or 0),
            int(stats["bytes"] or 0),
            int((time.time() - t0) * 1000),
            "done",
        )
    ]
    # overwrite = the atomic commit point; exactly one current row/part
    spark.createDataFrame(row, MANIFEST_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(_manifest_part_dir(path, part))


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    md = _manifest_dir(path)
    if not os.path.isdir(md) or not os.listdir(md):
        return spark.createDataFrame([], MANIFEST_SCHEMA)
    return spark.read.option("recursiveFileLookup", "true").parquet(md)


def done_parts(spark: SparkSession, path: str) -> set[int]:
    m = read_manifest(spark, path)
    return {
        r["partition_id"]
        for r in m.where(F.col("status") == "done")
        .select("partition_id")
        .distinct()
        .collect()
    }


def manifest_fingerprints(spark: SparkSession, path: str) -> dict[int, str]:
    m = read_manifest(spark, path)
    return {
        r["partition_id"]: r["input_fingerprint"]
        for r in m.where(F.col("status") == "done").collect()
    }


def build_index_resumable(
    docs: DataFrame,
    path: str,
    n_parts: int = 8,
    n_buckets: int = 16,
    text_col: str = "content",
    id_cols: tuple[str, ...] = ("repo", "path", "commit"),
    run_id: str = "run",
    fail_after_parts: int | None = None,
    keep_positions: bool = False,
) -> None:
    """Build (or resume) the partitioned index at `path`.

    fail_after_parts injects a crash after N newly-built parts — the
    kill/resume test hook. keep_positions also writes the prox stream
    per part (positions/part=N) so a resumable/incremental index can
    serve phrase queries; the manifest row stays the single commit
    point for both streams.
    """
    spark = docs.sparkSession
    base = _with_parts(docs, id_cols, text_col, n_parts)
    _record_build_meta(path, keep_positions)
    done = done_parts(spark, path)
    built = 0
    for part in range(n_parts):
        if part in done:
            continue
        _build_part(
            base, path, part, n_buckets, text_col, run_id, keep_positions
        )
        built += 1
        if fail_after_parts is not None and built >= fail_after_parts:
            raise RuntimeError(f"injected failure after {built} parts")


def refresh_index(
    docs: DataFrame,
    path: str,
    n_parts: int = 8,
    n_buckets: int = 16,
    text_col: str = "content",
    id_cols: tuple[str, ...] = ("repo", "path", "commit"),
    run_id: str = "refresh",
    keep_positions: bool | None = None,
) -> list[int]:
    """Incremental maintenance (SURVEY.md §7.8): rebuild ONLY partitions
    whose input fingerprint drifted (adds/deletes/content edits).
    Returns the rebuilt part ids — empty list when nothing changed.

    keep_positions defaults to the index's OWN build-time setting
    (build_meta.json) — a refresh of a keep_positions index must not
    silently rmtree committed prox dirs for the rebuilt parts (phrase
    queries would then miss those parts' docs with no error). An
    explicit conflicting flag raises via _record_build_meta.
    """
    spark = docs.sparkSession
    if keep_positions is None:
        meta = read_build_meta(path)
        if "keep_positions" in meta:
            keep_positions = bool(meta["keep_positions"])
        else:
            # pre-meta index: infer from the layout rather than
            # defaulting to False and deleting committed prox dirs
            keep_positions = os.path.isdir(os.path.join(path, "positions"))
    _record_build_meta(path, keep_positions)
    base = _with_parts(docs, id_cols, text_col, n_parts)
    fresh = _fresh_fingerprints(base)
    current = manifest_fingerprints(spark, path)
    stale = [
        part
        for part in range(n_parts)
        if current.get(part) != fresh.get(part, "0")
    ]
    for part in stale:
        _build_part(
            base, path, part, n_buckets, text_col, run_id, keep_positions
        )
    return stale


def _read_committed(spark: SparkSession, path: str, stream: str) -> DataFrame:
    """Read only the part dirs whose manifest row committed: a part
    directory written just before a crash (data landed, manifest row
    didn't) must not leak into reads — resume will overwrite it, and
    until then its rows are uncommitted."""
    base = os.path.join(path, stream)
    parts = [
        os.path.join(base, f"part={p}")
        for p in sorted(done_parts(spark, path))
        if os.path.isdir(os.path.join(base, f"part={p}"))
    ]
    if not parts:
        raise FileNotFoundError(
            f"no committed {stream} parts under {path} — build the index "
            "first (or it was built without this stream)"
        )
    return spark.read.option("basePath", base).parquet(*parts)


def read_resumable_postings(spark: SparkSession, path: str) -> DataFrame:
    """Postings of a resumable index, restricted to committed parts."""
    return _read_committed(spark, path, "postings")


def read_resumable_positions(spark: SparkSession, path: str) -> DataFrame:
    """Prox stream of a keep_positions resumable index — read through
    the manifest the same way postings are (only committed parts)."""
    return _read_committed(spark, path, "positions")


def verify_fingerprints(
    spark: SparkSession,
    path: str,
    docs: DataFrame,
    id_cols=("repo", "path", "commit"),
    text_col: str = "content",
    n_parts: int = 8,
) -> bool:
    """Resume-safety check: manifest fingerprints still match the input
    (detects input drift between the killed run and the resume)."""
    base = _with_parts(docs, id_cols, text_col, n_parts)
    fresh = _fresh_fingerprints(base)
    return all(
        fresh.get(pid) == fp
        for pid, fp in manifest_fingerprints(spark, path).items()
    )
