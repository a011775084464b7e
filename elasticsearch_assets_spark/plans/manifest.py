"""Per-partition lineage manifests + checkpoint/resume (SURVEY.md D6/D7/
O11; FIXTURES.md T4).

The reference tracks slice-level progress with hole bookkeeping
(dateSlicer.ts:308-335, date-helpers.ts:287-390) so a killed run resumes
without re-reading completed ranges. Spark-native equivalent:

- the index build is decomposed into `n_parts` independent input
  partitions (pmod(xxhash64(doc_id), n_parts) — stable across runs
  because doc_id is content-derived, never monotonically_increasing_id)
- each completed part atomically lands TWO artifacts: its postings
  parquet directory (part=K/...) and a one-row manifest parquet whose
  write is the commit point (parquet dir rename = atomic-enough here;
  Iceberg snapshot commit in production)
- resume = enumerate manifest rows with status=done, anti-join the part
  list, build only the missing parts — the reference's "holes" become
  missing manifest rows
- the manifest row carries per-partition lineage metrics (rows, bytes,
  duration, input fingerprint) — the north rule's "per-partition
  lineage + metrics". The fingerprint is an order-independent sum of
  doc_id hashes, so any input drift is detected on resume.
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
    "rows long, bytes long, duration_ms long, status string"
)


def _part_dir(path: str, part: int) -> str:
    return os.path.join(path, "postings", f"part={part}")


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "manifest")


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    md = _manifest_dir(path)
    if not os.path.isdir(md) or not any(
        f.endswith(".parquet") or os.path.isdir(os.path.join(md, f))
        for f in os.listdir(md)
    ):
        return spark.createDataFrame([], MANIFEST_SCHEMA)
    return spark.read.parquet(md)


def done_parts(spark: SparkSession, path: str) -> set[int]:
    m = read_manifest(spark, path)
    return {
        r["partition_id"]
        for r in m.where(F.col("status") == "done")
        .select("partition_id")
        .distinct()
        .collect()
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
) -> None:
    """Build (or resume) the partitioned index at `path`.

    fail_after_parts injects a crash after N newly-built parts — the
    kill/resume test hook.
    """
    spark = docs.sparkSession
    base = with_doc_id(docs, id_cols, text_col).withColumn(
        "_part", F.pmod(F.xxhash64("doc_id"), F.lit(n_parts)).cast("int")
    )
    done = done_parts(spark, path)
    built = 0
    for part in range(n_parts):
        if part in done:
            continue
        t0 = time.time()
        sub = base.where(F.col("_part") == part)
        tokens = sub.select(
            "doc_id", F.posexplode(analyze_col(text_col)).alias("pos", "term")
        )
        tf = tokens.groupBy("term", "doc_id").agg(
            F.count("*").cast("int").alias("tf")
        )
        from pyspark.sql import Window

        tfd = tf.withColumn(
            "dl", F.sum("tf").over(Window.partitionBy("doc_id")).cast("int")
        ).withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
        )
        tfd.write.mode("overwrite").parquet(_part_dir(path, part))

        # lineage metrics + input fingerprint (order-independent)
        stats = sub.agg(
            F.count("*").alias("rows"),
            F.sum(F.pmod(F.xxhash64("doc_id"), F.lit(1_000_003))).alias("fp"),
            F.sum(F.length(text_col)).alias("bytes"),
        ).collect()[0]
        row = [
            (
                run_id,
                part,
                str(stats["fp"]),
                int(stats["rows"] or 0),
                int(stats["bytes"] or 0),
                int((time.time() - t0) * 1000),
                "done",
            )
        ]
        spark.createDataFrame(row, MANIFEST_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(_manifest_dir(path))

        built += 1
        if fail_after_parts is not None and built >= fail_after_parts:
            raise RuntimeError(f"injected failure after {built} parts")


def read_resumable_postings(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.option("basePath", os.path.join(path, "postings")).parquet(
        os.path.join(path, "postings")
    )


def verify_fingerprints(spark: SparkSession, path: str, docs: DataFrame,
                        id_cols=("repo", "path", "commit"),
                        text_col: str = "content", n_parts: int = 8) -> bool:
    """Resume-safety check: manifest fingerprints still match the input
    (detects input drift between the killed run and the resume)."""
    base = with_doc_id(docs, id_cols, text_col).withColumn(
        "_part", F.pmod(F.xxhash64("doc_id"), F.lit(n_parts)).cast("int")
    )
    fresh = {
        r["_part"]: str(r["fp"])
        for r in base.groupBy("_part").agg(F.sum(F.pmod(F.xxhash64("doc_id"), F.lit(1_000_003))).alias("fp")).collect()
    }
    m = read_manifest(spark, path)
    for r in m.where(F.col("status") == "done").collect():
        if fresh.get(r["partition_id"]) != r["input_fingerprint"]:
            return False
    return True
