"""spark-submit --py-files deployment smoke (the north rule's cluster
launch mode): package the library, submit a build+query job, verify the
workers can unpickle the shipped UDFs.

    python -m zipfile -c /tmp/eas_pkg.zip elasticsearch_assets_spark/
    spark-submit --master local[8] --py-files /tmp/eas_pkg.zip \
        tools/submit_smoke.py /tmp/submit_idx

On a real cluster, swap the master URL; nothing else changes — the
library has no driver-local state beyond the tiny slicer-plan oracles.
Verified locally: prints SUBMIT_OK with the top BM25 hits.
"""
import sys

from pyspark.sql import SparkSession

from elasticsearch_assets_spark.corpus import generate_corpus
from elasticsearch_assets_spark.indexing.build import (
    build_and_write_index,
    read_index,
)
from elasticsearch_assets_spark.query import exec as qx

spark = (
    SparkSession.builder.appName("submit_smoke")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/submit_idx"
docs = generate_corpus(spark, 2000, seed=42)
build_and_write_index(docs, out, n_buckets=8)
idx = read_index(spark, out)
rows = qx.match_query(idx, "parse merge", k=5).collect()
assert len(rows) == 5, rows
print("SUBMIT_OK", [(r["doc_id"], round(r["score"], 4)) for r in rows[:2]])
