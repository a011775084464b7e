"""Round-7 build-phase decomposition (guide §1.1/§1.4): time each layer
of the 240k bench build with noop sinks so the dominant phase is known
before anything is changed. Not part of the frozen bench."""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from elasticsearch_assets_spark.corpus import generate_corpus
from elasticsearch_assets_spark.functions.analyzer import analyze_col
from elasticsearch_assets_spark.indexing.build import (
    ROW_GROUP_BYTES,
    _bucketed_sorted,
    build_and_write_index,
)
from elasticsearch_assets_spark.session import get_spark

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DOCS = int(os.environ.get("BENCH_DOCS", "240000"))
REPS = int(os.environ.get("REPS", "3"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, reps=REPS):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    med = statistics.median(ts)
    print(f"{label:45s} med={med:6.2f}s  runs={[round(t,2) for t in ts]}",
          flush=True)
    return med


def main():
    shm = tempfile.mkdtemp(prefix="phases_", dir="/dev/shm")
    os.environ["TMPDIR"] = shm
    tempfile.tempdir = None
    spark = get_spark(app_name="build_phases", cpus=CPUS,
                      extra_conf={"spark.sql.files.maxPartitionBytes": "1m"})
    sc = spark.sparkContext
    corpus_path = os.path.join(shm, "corpus")
    generate_corpus(spark, DOCS, seed=42).repartition(64).write.mode(
        "overwrite").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)
    n_buckets = 32

    # warm-up: one full build
    build_and_write_index(docs, os.path.join(shm, "warm"), n_buckets=n_buckets)
    shutil.rmtree(os.path.join(shm, "warm"), ignore_errors=True)

    base = docs.withColumn(
        "doc_id", F.xxhash64("repo", "path", "commit")
    ).withColumn("content_sha", F.sha2(F.col("content"), 256))
    toks = base.withColumn("_toks", analyze_col("content")).withColumn(
        "dl", F.coalesce(F.size("_toks"), F.lit(0)).cast("int")
    )
    tokens = toks.select("doc_id", "dl", F.explode("_toks").alias("term"))
    tfd = (
        tokens.groupBy("term", "doc_id")
        .agg(F.count("*").cast("int").alias("tf"), F.first("dl").alias("dl"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
    )

    sc.setJobDescription("phase: scan only")
    timed("scan only (noop docs)", lambda: noop(docs))
    sc.setJobDescription("phase: scan+sha")
    timed("scan + sha256 (noop base)", lambda: noop(base))
    sc.setJobDescription("phase: analyze")
    timed("scan + sha + analyze (noop toks)", lambda: noop(toks.drop("content")))
    sc.setJobDescription("phase: explode")
    timed("... + explode (noop tokens)", lambda: noop(tokens))
    sc.setJobDescription("phase: tf agg")
    timed("... + groupBy tf [shuffle1] (noop tfd)", lambda: noop(tfd))
    sc.setJobDescription("phase: bucketed sort")
    timed("... + repart+sort [shuffle2] (noop)",
          lambda: noop(_bucketed_sorted(tfd, n_buckets)))

    def write_postings():
        out = os.path.join(shm, "p1")
        (_bucketed_sorted(tfd, n_buckets).write.mode("overwrite")
         .option("parquet.block.size", ROW_GROUP_BYTES)
         .partitionBy("bucket").parquet(out))
        shutil.rmtree(out, ignore_errors=True)

    sc.setJobDescription("phase: postings write")
    timed("... + parquet write (pass 1 total)", write_postings)

    def full():
        out = os.path.join(shm, "full")
        build_and_write_index(spark.read.parquet(corpus_path), out,
                              n_buckets=n_buckets)
        shutil.rmtree(out, ignore_errors=True)

    sc.setJobDescription("phase: full build")
    timed("full build_and_write_index", full)
    print("loadavg", os.getloadavg()[0])
    shutil.rmtree(shm, ignore_errors=True)


if __name__ == "__main__":
    main()
