"""Property-based robustness: random ASTs round-trip through the
xLucene printer, and the three analyzer implementations agree on
arbitrary unicode-ish input."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_assets_spark.functions.analyzer import (
    analyze_text,
    duckdb_analyze_sql,
)
from elasticsearch_assets_spark.query import parser as P
from elasticsearch_assets_spark.sources.spaces import to_xlucene

# ---- random AST → print → parse is identity --------------------------------
_field = st.sampled_from(["content", "lang", "uuid", "created", "bytes", None])
_word = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8
)


def _leaf():
    return st.one_of(
        st.builds(P.Term, _field, _word),
        st.builds(P.Phrase, _field, st.lists(_word, min_size=1, max_size=3).map(" ".join)),
        st.builds(P.Wildcard, _field, _word.map(lambda w: w + "*")),
        st.builds(
            P.Range,
            _field,
            _word,
            _word,
            st.booleans(),
            st.booleans(),
        ),
    )


_ast = st.recursive(
    _leaf(),
    lambda children: st.one_of(
        st.lists(children, min_size=2, max_size=3).map(lambda c: P.And(tuple(c))),
        st.lists(children, min_size=2, max_size=3).map(lambda c: P.Or(tuple(c))),
        children.map(P.Not),
    ),
    max_leaves=8,
)


@settings(max_examples=200, deadline=None)
@given(_ast)
def test_printer_parse_roundtrip_property(ast):
    assert P.parse(to_xlucene(ast)) == ast


# ---- analyzer 3-way agreement on fuzzed input -------------------------------
FUZZ_ALPHABET = (
    "abcXYZ019_./-()<>{}\n\t «»déjàβ漢字 camelCaseHTTPFoo snake_case "
)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=FUZZ_ALPHABET, max_size=60))
def test_analyzer_python_duckdb_agree(s):
    con = _duck()
    got = con.execute(f"select {duckdb_analyze_sql('?')}", [s]).fetchone()[0]
    assert list(got) == analyze_text(s), repr(s)


_CON = None


def _duck():
    global _CON
    if _CON is None:
        _CON = duckdb.connect()
    return _CON


def test_analyzer_spark_agrees_on_fuzz_batch(spark):
    """Spark side batched (one job for all fuzz strings)."""
    import random

    rng = random.Random(42)
    texts = [
        "".join(rng.choice(FUZZ_ALPHABET) for _ in range(rng.randrange(0, 60)))
        for _ in range(300)
    ]
    texts = [t for t in texts if t]
    from elasticsearch_assets_spark.functions.analyzer import analyze_col

    df = spark.createDataFrame([(t,) for t in texts], ["txt"])
    got = [r[0] for r in df.select(analyze_col("txt")).collect()]
    assert got == [analyze_text(t) for t in texts]
