"""build_and_write_index path parity: the cache_tokens=True fast path
and the postings-derived fallback must produce IDENTICAL doc_norms and
stats — including on corpora containing null-text docs, where ANSI
Spark 4 makes size(NULL) NULL (ADVICE r3: dl must coalesce to 0 so
avg_dl and the per-doc dl agree between the two paths)."""

from __future__ import annotations

import json
import os

import pytest


@pytest.fixture(scope="module")
def null_text_docs(spark):
    rows = [
        (1, "alpha beta gamma"),
        (2, None),
        (3, "alpha alpha delta"),
        (4, ""),
        (5, "beta"),
    ]
    return spark.createDataFrame(rows, "doc_id long, content string")


def _build(docs, tmp_path, name, cache_tokens):
    from elasticsearch_assets_spark.indexing.build import build_and_write_index

    path = os.path.join(str(tmp_path), name)
    idx = build_and_write_index(
        docs, path, doc_id_col="doc_id", n_buckets=4, cache_tokens=cache_tokens
    )
    with open(os.path.join(path, "stats.json")) as f:
        stats = json.load(f)
    norms = sorted(
        (r["doc_id"], r["dl"]) for r in idx.doc_norms.select("doc_id", "dl").collect()
    )
    return stats, norms


def test_fanout_write_layout_invariants(spark, tmp_path):
    """The skew-splitting write (bucket, reseeded-hash(term)) must keep
    the layout contracts consumers rely on: every row of a term in ONE
    bucket directory, at most WRITE_FANOUT files per bucket, each file
    internally (term, doc_id)-sorted, and no term split across files."""
    import glob

    import pyarrow.parquet as pq

    from elasticsearch_assets_spark.corpus import generate_corpus
    from elasticsearch_assets_spark.indexing.build import (
        WRITE_FANOUT,
        build_and_write_index,
    )

    docs = generate_corpus(spark, 3000, seed=11)
    path = str(tmp_path / "fan")
    build_and_write_index(docs, path, n_buckets=4)
    buckets = sorted(glob.glob(f"{path}/postings/bucket=*"))
    assert len(buckets) == 4
    term_home: dict[str, str] = {}
    for b in buckets:
        files = glob.glob(f"{b}/*.parquet")
        assert 1 <= len(files) <= WRITE_FANOUT, (b, len(files))
        for f in files:
            t = pq.read_table(f, columns=["term", "doc_id"])
            rows = list(zip(t["term"].to_pylist(), t["doc_id"].to_pylist()))
            assert rows == sorted(rows), f  # within-file sort
            for term, _ in rows:
                home = term_home.setdefault(term, f)
                assert home == f, (term, home, f)  # whole terms per file


def test_cached_and_fallback_doc_norms_identical(spark, null_text_docs, tmp_path):
    s_cached, n_cached = _build(null_text_docs, tmp_path, "cached", True)
    s_fallback, n_fallback = _build(null_text_docs, tmp_path, "fallback", False)
    assert n_cached == n_fallback
    assert s_cached == s_fallback
    # null/empty text docs present with dl=0 (NOT dropped, NOT null)
    dls = dict(n_cached)
    assert dls[2] == 0 and dls[4] == 0
    assert s_cached["n_docs"] == 5
    # avg over ALL docs incl. the zero-length ones: (3+0+3+0+1)/5
    assert abs(s_cached["avg_dl"] - 7 / 5) < 1e-9
