"""Block packing: postings → compressed block rows with block-max
metadata (the north rule's "docID delta + variable-byte compression"
and "block-max" storage).

Each (term, block) row holds ≤ ~block_size postings packed as binary:

    term, bucket, block, n, max_tfn, docs_vb, tfs_vb, dls_vb

- Block assignment is pmod(xxhash64(doc_id), n_blocks(term)) with
  n_blocks = ceil(df / block_size): a hot term with a billion postings
  becomes millions of independent rows packed by independent tasks —
  NO task ever owns a whole term (the salted-shuffle hot-term defense;
  a row_number window over term would serialize exactly there).
- max_tfn = max over the block of tf/(tf + k1*(1-b+b*dl/avgdl)) — the
  score upper bound for the block is idf(term) * max_tfn * (k1+1),
  computable at query time from the term dictionary alone.
- Packing runs in applyInPandas (Arrow batches, numpy codec) — the only
  Python in the index path, and it touches bytes, not rows.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from elasticsearch_assets_spark.indexing import codec
from elasticsearch_assets_spark.indexing.build import IndexTables
from elasticsearch_assets_spark.query.bm25 import K1, B

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("block", T.IntegerType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("max_tfn", T.DoubleType(), False),
        T.StructField("docs_vb", T.BinaryType(), False),
        T.StructField("tfs_vb", T.BinaryType(), False),
        T.StructField("dls_vb", T.BinaryType(), False),
        # 128-byte doc_id Bloom: lets MaxScore skip DECODING
        # non-essential blocks that contain no candidate doc
        T.StructField("bloom", T.BinaryType(), False),
    ]
)


def pack_blocks(
    index: IndexTables,
    block_size: int = 128,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """postings + term dictionary → packed block rows."""
    avg_dl = index.avg_dl

    nb = F.greatest(
        F.ceil(F.col("df") / F.lit(block_size)).cast("int"), F.lit(1)
    ).alias("n_blocks")
    with_blocks = (
        index.postings.join(index.terms.select("term", "df"), "term")
        .withColumn("n_blocks", nb)
        .withColumn(
            "block",
            F.pmod(F.xxhash64("doc_id"), F.col("n_blocks").cast("long")).cast("int"),
        )
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        doc_ids = pdf["doc_id"].to_numpy(np.int64)
        tfs = pdf["tf"].to_numpy(np.int64)
        dls = pdf["dl"].to_numpy(np.int64)
        docs_vb, tfs_vb, dls_vb = codec.encode_block(doc_ids, tfs, dls)
        tfn = tfs / (tfs + k1 * (1.0 - b + b * dls / avg_dl))
        return pd.DataFrame(
            {
                "term": [pdf["term"].iloc[0]],
                "bucket": [int(pdf["bucket"].iloc[0])],
                "block": [int(pdf["block"].iloc[0])],
                "n": [len(pdf)],
                "max_tfn": [float(tfn.max())],
                "docs_vb": [docs_vb],
                "tfs_vb": [tfs_vb],
                "dls_vb": [dls_vb],
                "bloom": [codec.bloom_build(doc_ids)],
            }
        )

    return (
        with_blocks.select("term", "bucket", "block", "doc_id", "tf", "dl")
        .groupBy("term", "block")
        .applyInPandas(pack, schema=BLOCK_SCHEMA)
    )


def write_blocks(blocks: DataFrame, path: str, n_buckets: int) -> None:
    (
        blocks.repartition(n_buckets, "bucket")
        .sortWithinPartitions("term", "block")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(path, "blocks"))
    )


def read_blocks(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "blocks"))
