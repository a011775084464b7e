"""A/B: per-doc array-side tf (zero-shuffle RLE over sorted tokens) vs
the groupBy(term, doc_id) aggregation — exact output equality + timing
of the full pass-1 (write postings) for both shapes."""

from __future__ import annotations

import os
import shutil
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
)
from elasticsearch_assets_spark.session import get_spark

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DOCS = int(os.environ.get("BENCH_DOCS", "240000"))
REPS = int(os.environ.get("REPS", "3"))
N_BUCKETS = 32


def tf_pairs_col(toks: F.Column) -> F.Column:
    """array<struct<term,tf>> — run-length encode the sorted token array.

    ends = 1-based positions i where sorted[i-1] != sorted[i] or i == n;
    tf of group j = ends[j] - ends[j-1] (ends[-1] := 0)."""
    sorted_t = F.sort_array(toks)
    n = F.size(sorted_t)
    ends = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: (i == n) | (sorted_t[i - 1] != sorted_t[i]),
    )
    pairs = F.transform(
        ends,
        lambda e, j: F.struct(
            sorted_t[e - 1].alias("term"),
            F.when(j == 0, e).otherwise(e - ends[j - 1]).cast("int").alias("tf"),
        ),
    )
    return F.when(n == 0, F.array().cast("array<struct<term:string,tf:int>>")).otherwise(pairs)


def main():
    shm = tempfile.mkdtemp(prefix="tfab_", dir="/dev/shm")
    os.environ["TMPDIR"] = shm
    tempfile.tempdir = None
    spark = get_spark(app_name="tf_array_probe", cpus=CPUS,
                      extra_conf={"spark.sql.files.maxPartitionBytes": "1m"})
    sc = spark.sparkContext
    corpus_path = os.path.join(shm, "corpus")
    generate_corpus(spark, DOCS, seed=42).repartition(64).write.mode(
        "overwrite").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)
    base = docs.withColumn(
        "doc_id", F.xxhash64("repo", "path", "commit")
    ).withColumn("content_sha", F.sha2(F.col("content"), 256))
    toks = base.withColumn("_toks", analyze_col("content")).withColumn(
        "dl", F.coalesce(F.size("_toks"), F.lit(0)).cast("int")
    )

    # current shape
    tokens = toks.select("doc_id", "dl", F.explode("_toks").alias("term"))
    tfd_old = (
        tokens.groupBy("term", "doc_id")
        .agg(F.count("*").cast("int").alias("tf"), F.first("dl").alias("dl"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(N_BUCKETS)).cast("int"))
    )

    # array-side shape
    tfd_new = (
        toks.select("doc_id", "dl", F.explode(tf_pairs_col(F.col("_toks"))).alias("p"))
        .select(F.col("p.term").alias("term"), "doc_id", F.col("p.tf").alias("tf"), "dl")
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(N_BUCKETS)).cast("int"))
    )

    # exact equality first
    sc.setJobDescription("equality check")
    a = tfd_old.select("term", "doc_id", "tf", "dl", "bucket")
    b = tfd_new.select("term", "doc_id", "tf", "dl", "bucket")
    n_a = a.count()
    n_diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"rows={n_a} diff={n_diff}", flush=True)
    assert n_diff == 0, "MISMATCH"

    def write(df, tag):
        out = os.path.join(shm, tag)
        (_bucketed_sorted(df, N_BUCKETS).write.mode("overwrite")
         .option("parquet.block.size", ROW_GROUP_BYTES)
         .partitionBy("bucket").parquet(out))
        shutil.rmtree(out, ignore_errors=True)

    # interleaved warm A/B
    write(tfd_old, "w_old")
    write(tfd_new, "w_new")
    for r in range(REPS):
        for tag, df in (("old", tfd_old), ("new", tfd_new)):
            t0 = time.perf_counter()
            write(df, f"w_{tag}")
            print(f"rep{r} {tag}: {time.perf_counter()-t0:6.2f}s "
                  f"load={os.getloadavg()[0]:.1f}", flush=True)
    shutil.rmtree(shm, ignore_errors=True)


if __name__ == "__main__":
    main()
