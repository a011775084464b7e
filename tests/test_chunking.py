"""operators/chunking.py: context-window chunking (chunk_tokens) and
deterministic next-fit shard packing (pack_bins) — brute-forced in
Python over the same analyzer + md5 bucket protocol."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.functions.analyzer import analyze_text
from elasticsearch_assets_spark.operators import chunking


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "one two three four five six seven"),
        (1, ""),  # empty -> zero chunks
        (2, "alpha beta gamma delta"),  # exact multiple of 4
        (3, "solo"),
        (4, None),  # null text -> zero chunks
        (5, "a b c d e f g h i j k l m"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_tokens_brute_force(spark, docs):
    window = 4
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_tok"], r["first_tok"], r["last_tok"])
        for r in chunking.chunk_tokens(docs, window).collect()
    }
    want = {}
    for doc_id, text in docs.collect():
        toks = analyze_text(text or "")
        for c in range(math.ceil(len(toks) / window)):
            w = toks[c * window : (c + 1) * window]
            want[(doc_id, c)] = (len(w), w[0], w[-1])
    assert got == want
    assert not any(d in (1, 4) for d, _ in got)  # empty/null -> no rows


def test_chunk_tokens_window_one(spark, docs):
    got = chunking.chunk_tokens(docs, 1).where(F.col("doc_id") == 0).collect()
    toks = analyze_text("one two three four five six seven")
    assert [(r["chunk_id"], r["n_tok"], r["first_tok"]) for r in got] == [
        (i, 1, t) for i, t in enumerate(toks)
    ]


def test_chunk_tokens_bad_window(docs):
    with pytest.raises(ValueError):
        chunking.chunk_tokens(docs, 0)
    with pytest.raises(ValueError):
        chunking.chunk_tokens(docs, 4, stride=5)
    with pytest.raises(ValueError):
        chunking.chunk_tokens(docs, 4, stride=0)


def test_chunk_tokens_stride_overlap(spark, docs):
    window, stride = 4, 2
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_tok"], r["first_tok"], r["last_tok"])
        for r in chunking.chunk_tokens(docs, window, stride=stride).collect()
    }
    want = {}
    for doc_id, text in docs.collect():
        toks = analyze_text(text or "")
        for c in range((len(toks) - 1) // stride + 1 if toks else 0):
            w = toks[c * stride : c * stride + window]
            want[(doc_id, c)] = (len(w), w[0], w[-1])
    assert got == want
    # every token index is covered by some window
    for doc_id, text in docs.collect():
        toks = analyze_text(text or "")
        covered = set()
        for c in range((len(toks) - 1) // stride + 1 if toks else 0):
            covered.update(range(c * stride, min(c * stride + window, len(toks))))
        assert covered == set(range(len(toks)))


def test_chunk_tokens_default_stride_is_disjoint(spark, docs):
    a = chunking.chunk_tokens(docs, 4).collect()
    b = chunking.chunk_tokens(docs, 4, stride=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def _bucket(seed: str, doc_id: int) -> int:
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()
    return int(h[:13], 16) % 1_000_000


def _oracle_pack(rows, max_tokens, n_buckets, seed):
    """rows: [(doc_id, text)] -> {doc_id: (bucket, bin, n_tok)}"""
    per = {}
    for doc_id, text in rows:
        n_tok = len(analyze_text(text or ""))
        per[doc_id] = (_bucket(seed, doc_id) % n_buckets,
                       _bucket(seed + ":order", doc_id), n_tok)
    out = {}
    for b in range(n_buckets):
        stream = sorted(
            ((ordk, d, n) for d, (bb, ordk, n) in per.items() if bb == b),
        )
        cum = 0
        for ordk, d, n in stream:
            out[d] = (b, cum // max_tokens, n)
            cum += n
    return out


def test_pack_bins_brute_force(spark, docs):
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    got = {
        r["doc_id"]: (r["bucket"], r["bin"], r["n_tok"])
        for r in chunking.pack_bins(docs, max_tokens=5, n_buckets=3).collect()
    }
    assert got == _oracle_pack(rows, 5, 3, "pack")


def test_pack_bins_partition_invariant(spark):
    from elasticsearch_assets_spark.corpus import generate_corpus_pandas
    from elasticsearch_assets_spark.indexing.build import with_doc_id

    sdf = with_doc_id(
        spark.createDataFrame(generate_corpus_pandas(120, seed=42))
    ).select("doc_id", F.col("content").alias("text"))
    a = chunking.pack_bins(sdf, 2048, n_buckets=8).collect()
    b = chunking.pack_bins(sdf.repartition(13), 2048, n_buckets=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # and the whole assignment equals the sequential Python pack
    rows = [(r["doc_id"], r["text"]) for r in sdf.collect()]
    got = {r["doc_id"]: (r["bucket"], r["bin"], r["n_tok"]) for r in a}
    assert got == _oracle_pack(rows, 2048, 8, "pack")


def test_pack_bins_bad_budget(docs):
    with pytest.raises(ValueError):
        chunking.pack_bins(docs, 0)
