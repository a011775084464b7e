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
