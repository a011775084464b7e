"""Analyzer goldens + three-way implementation agreement
(python / Spark built-ins / DuckDB SQL)."""

from __future__ import annotations

import duckdb
import pytest

from elasticsearch_assets_spark.functions.analyzer import (
    analyze_col,
    analyze_text,
    duckdb_analyze_sql,
)

GOLDENS = [
    ("parseDate", ["parse", "date"]),
    ("HTTPServer", ["http", "server"]),
    ("snake_case_name", ["snake", "case", "name"]),
    ("src/module_3/util/file.py", ["src", "module", "3", "util", "file", "py"]),
    ("base64Url", ["base64", "url"]),
    ("loadConfig()", ["load", "config"]),
    ("", []),
    ("  ", []),
    ("UPPER lower Mixed99Case", ["upper", "lower", "mixed99", "case"]),
    ("a.b-c_d/e", ["a", "b", "c", "d", "e"]),
    (
        "import src.module_7.util\nreturn self.value",
        ["import", "src", "module", "7", "util", "return", "self", "value"],
    ),
]


@pytest.mark.parametrize("text,expected", GOLDENS)
def test_python_goldens(text, expected):
    assert analyze_text(text) == expected


def test_spark_matches_python(spark):
    texts = [t for t, _ in GOLDENS if t.strip()] + [
        "xXHash64 BM25Scorer fooBarBaz qux_quux v2Parser"
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["txt"])
    got = [r[0] for r in df.select(analyze_col("txt")).collect()]
    assert got == [analyze_text(t) for t in texts]


def test_xxhash_parity(spark):
    """Pure-Python XXH64 must match Spark's xxhash64 (seed 42) — the
    query path derives partition filters from it."""
    from pyspark.sql import functions as F

    from elasticsearch_assets_spark.functions.xxhash import term_bucket, xxh64

    terms = [
        "", "a", "merge", "parseDate", "x" * 7, "y" * 8, "z" * 31,
        "w" * 32, "v" * 100, "日本語テキスト", "uniq_12345",
    ]
    df = spark.createDataFrame([(t,) for t in terms], ["t"])
    assert [r[0] for r in df.select(F.xxhash64("t")).collect()] == [
        xxh64(t.encode()) for t in terms
    ]
    assert [
        r[0] for r in df.select(F.pmod(F.xxhash64("t"), F.lit(16))).collect()
    ] == [term_bucket(t, 16) for t in terms]


def test_duckdb_matches_python():
    texts = [t for t, _ in GOLDENS if t.strip()] + ["HTTPServer2 parseDateTime"]
    con = duckdb.connect()
    for t in texts:
        sql = f"select {duckdb_analyze_sql('?')}"
        got = con.execute(sql, [t]).fetchone()[0]
        assert list(got) == analyze_text(t), t


# non-ASCII is a token separator BEFORE casing (spec step 0): engine
# lowercase tables differ exactly where unicode special-casing maps
# INTO ascii (U+0130 'İ' → 'i'+combining dot on JVM/Python but 'i' in
# DuckDB), so these must never reach the casing step
UNICODE_CASES = [
    ("İstanbul", ["stanbul"]),
    ("xİy", ["x", "y"]),
    ("café naïve", ["caf", "na", "ve"]),
    ("ΑΣ ΣΙΓΜΑ", []),
    ("ﬁle ſtring ẞig", ["le", "tring", "ig"]),
    ("emoji🎉mix", ["emoji", "mix"]),
    ("日本語テキスト", []),
]


@pytest.mark.parametrize("text,expected", UNICODE_CASES)
def test_unicode_ascii_gate_python(text, expected):
    assert analyze_text(text) == expected


def test_unicode_three_way_agreement(spark):
    """The divergence fuzz found U+0130 splitting Python/Spark from
    DuckDB pre-gate; all three must now agree byte-for-byte."""
    texts = [t for t, _ in UNICODE_CASES]
    df = spark.createDataFrame([(t,) for t in texts], ["txt"])
    got_spark = [r[0] for r in df.select(analyze_col("txt")).collect()]
    con = duckdb.connect()
    got_duck = [
        list(con.execute(f"select {duckdb_analyze_sql('?')}", [t]).fetchone()[0])
        for t in texts
    ]
    exp = [analyze_text(t) for t in texts]
    assert got_spark == exp
    assert got_duck == exp
