"""CCNet-style line-level dedup: boilerplate lines (verbatim repeats
across >= min_docs documents) are removed per doc, original order and
original (untrimmed) text of surviving lines preserved.

Parity-pinned against a pure-Python oracle computing the same spec, on
a corpus with PLANTED boilerplate (a license header appended to a
subset of docs) — the generated code corpus also repeats lines
naturally across docs (imports etc.), which the oracle handles and a
hand-written expectation would not.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.corpus import generate_corpus_pandas
from elasticsearch_assets_spark.operators import dedup

HEADER = [
    "# Copyright (c) 2026 Example Corp.",
    "# Licensed under the Apache License, Version 2.0",
    "#   (boilerplate nav line)  ",
]

MIN_DOCS = 2


def _py_dedup_lines(docs: dict[int, str | None], min_docs: int):
    """The spec, independently: norm = trim-spaces; a non-blank norm in
    >= min_docs distinct docs is boilerplate; blank lines survive."""
    from collections import Counter

    texts = {i: (t if t is not None else "") for i, t in docs.items()}
    freq: Counter[str] = Counter()
    for t in texts.values():
        freq.update({ln.strip(" ") for ln in t.split("\n")} - {""})
    boiler = {n for n, c in freq.items() if c >= min_docs}
    out = {}
    for i, t in texts.items():
        lines = t.split("\n")
        kept = [ln for ln in lines if ln.strip(" ") not in boiler]
        out[i] = ("\n".join(kept), len(lines) - len(kept))
    return out, boiler


@pytest.fixture(scope="module")
def line_corpus(spark):
    """120 code docs; the license header lands on the first 30 (with
    per-doc leading-space jitter on one header line to exercise trim
    normalization), plus a NULL-text doc and an all-boilerplate doc."""
    pdf = generate_corpus_pandas(120, seed=7)
    rows = []
    for i, content in enumerate(pdf["content"]):
        if i < 30:
            jitter = " " * (i % 3)
            content = "\n".join([HEADER[0], jitter + HEADER[1], HEADER[2], content])
        rows.append((i, content))
    rows.append((9000, None))
    rows.append((9001, "\n".join(HEADER)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df, dict(rows)


def test_matches_python_oracle(line_corpus):
    df, docs = line_corpus
    want, boiler = _py_dedup_lines(docs, MIN_DOCS)
    assert all(h.strip(" ") in boiler for h in HEADER)  # header IS planted
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_removed"])
        for r in dedup.dedup_lines(df, "text", "doc_id", min_docs=MIN_DOCS).collect()
    }
    assert got == want


def test_every_doc_present_and_edge_rows(line_corpus):
    df, docs = line_corpus
    out = dedup.dedup_lines(df, "text", "doc_id", min_docs=MIN_DOCS)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == set(docs)
    # NULL text behaves as one blank line: kept, nothing removed
    assert rows[9000]["text_dedup"] == "" and rows[9000]["n_removed"] == 0
    # all-boilerplate doc comes back empty with every line accounted for
    assert rows[9001]["text_dedup"] == "" and rows[9001]["n_removed"] == len(HEADER)


def test_survivor_lines_keep_original_spacing(spark):
    """Trim is for MATCHING only: a surviving line keeps its original
    leading/trailing spaces, and a trimmed-equal variant still counts
    toward the boilerplate threshold."""
    df = spark.createDataFrame(
        [
            (1, "  unique alpha  \nshared line"),
            (2, "   shared line \nother unique"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["text_dedup"]
        for r in dedup.dedup_lines(df, "text", "doc_id", min_docs=2).collect()
    }
    assert got == {1: "  unique alpha  ", 2: "other unique"}


def test_blank_lines_never_boilerplate(spark):
    df = spark.createDataFrame(
        [(1, "a\n\n\nb"), (2, "c\n\nd")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_removed"])
        for r in dedup.dedup_lines(df, "text", "doc_id", min_docs=2).collect()
    }
    assert got == {1: ("a\n\n\nb", 0), 2: ("c\n\nd", 0)}


def test_line_stats_counts_distinct_docs(line_corpus):
    df, docs = line_corpus
    stats = {
        r["line"]: r["n_docs"]
        for r in dedup.line_stats(df, "text", "doc_id").collect()
    }
    # 30 planted docs + the all-boilerplate doc; repeats INSIDE a doc
    # count once (countDistinct)
    for h in HEADER:
        assert stats[h.strip(" ")] == 31
    assert "" not in stats
