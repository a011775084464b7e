"""Reader-semantics golden tests (mirroring the reference's unit-test
tier, SURVEY.md §5.1) + writer merge semantics."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.operators import reader, writer


# ---- pure slicing functions (golden, reference parity) ---------------------
def test_divide_range_even_split_last_takes_remainder():
    # date-helpers.ts:242-264 — last slicer takes the remainder
    out = reader.divide_range(0, 100, 3)
    assert out == [(0, 33), (33, 66), (66, 100)]
    assert out[-1][1] == 100


def test_divide_range_cumulative_truncation_non_divisible():
    # moment's step.add(range,'ms') mutates ONE moment cumulatively and
    # the underlying JS Date truncates fractional ms at every add
    # (TimeClip) — so for 0..8 over 5 slicers (range 1.6 ms) boundaries
    # advance 1,2,3,4 (floor(step) each), NOT int(i*1.6)=1,3,4,6
    out = reader.divide_range(0, 8, 5)
    assert out == [(0, 1), (1, 2), (2, 3), (3, 4), (4, 8)]
    # coverage + disjointness invariants still hold
    for (s1, e1), (s2, _e2) in zip(out, out[1:]):
        assert e1 == s2 and s1 < e1
    # another non-divisible shape: 7 ms over 3 slicers (range 2.333..)
    assert reader.divide_range(0, 7, 3) == [(0, 2), (2, 4), (4, 7)]


def test_auto_interval_golden():
    # determineSliceInterval = floor(range / ceil(count/size)) — golden
    # metadata from the reference's even-spread harness runs
    # (slicer-spec.ts:180-236): every (count, range, size) → interval
    assert reader.auto_interval_ms(0, 193, total=1000, size=50) == 9
    assert reader.auto_interval_ms(0, 193, total=1000, size=200) == 38
    assert reader.auto_interval_ms(0, 144, total=868, size=50) == 8  # start var
    assert reader.auto_interval_ms(0, 79, total=275, size=50) == 13  # end var
    # even spread, size ≥ total → one slice covering the range
    assert reader.auto_interval_ms(0, 193, total=100, size=200) == 193
    # empty index → full range
    assert reader.auto_interval_ms(0, 193, total=0, size=200) == 193
    # second resolution floors to whole seconds, min 1 s
    assert reader.auto_interval_ms(0, 9500, total=100, size=50, resolution="s") == 4000
    assert reader.auto_interval_ms(0, 500, total=100, size=50, resolution="s") == 1000


def test_id_slicer_ranges_round_robin():
    # id-utils/utils.ts:25-52: round-robin deal
    r = reader.id_slicer_ranges("hexadecimal", 4)
    assert r[0] == ["0", "4", "8", "c"]
    assert r[1] == ["1", "5", "9", "d"]
    assert len(reader.ALPHABETS["base64url"]) == 64
    assert len(reader.ALPHABETS["hexadecimal"]) == 16


def test_base64_alphabet_golden_order():
    # keys.ts:96-108 "base64 based: upper, lower, numbers then special
    # chars" — slicer range assignment + emit order depend on this order
    b64u = reader.ALPHABETS["base64url"]
    assert b64u == (
        [chr(c) for c in range(ord("A"), ord("Z") + 1)]
        + [chr(c) for c in range(ord("a"), ord("z") + 1)]
        + [str(d) for d in range(10)]
        + ["-", "_"]
    )
    assert b64u[0] == "A" and b64u[26] == "a" and b64u[52] == "0"
    assert reader.ALPHABETS["base64"] == b64u[:62] + ["-", "_", "+", "/"]
    # round-robin deal starts at 'A' (id-utils/utils.ts:25-52)
    r = reader.id_slicer_ranges("base64url", 16)
    assert r[0][:2] == ["A", "Q"] and r[1][0] == "B"


def test_id_slicer_ranges_one_slicer():
    r = reader.id_slicer_ranges("hexadecimal", 1)
    assert r == [list("0123456789abcdef")]


# ---- range predicate: start-inclusive, end-exclusive ------------------------
def test_date_range_half_open(spark):
    rows = [
        (1, datetime(2019, 4, 26, 15, 0, 23, 201000)),
        (2, datetime(2019, 4, 26, 15, 0, 23, 300000)),
        (3, datetime(2019, 4, 26, 15, 0, 23, 394000)),
    ]
    df = spark.createDataFrame(rows, "id long, created timestamp")
    got = {
        r["id"]
        for r in df.where(
            reader.date_range_pred(
                "created",
                datetime(2019, 4, 26, 15, 0, 23, 201000),
                datetime(2019, 4, 26, 15, 0, 23, 394000),
            )
        ).collect()
    }
    assert got == {1, 2}  # end exclusive


def test_id_prefix_pred(spark):
    df = spark.createDataFrame(
        [("a1",), ("a2",), ("b1",), ("c1",)], "uuid string"
    )
    got = {
        r["uuid"]
        for r in df.where(reader.id_prefix_pred("uuid", ["a", "c"])).collect()
    }
    assert got == {"a1", "a2", "c1"}


def test_bounded_count(spark):
    df = spark.range(1000)
    assert reader.bounded_count(df, None, 100) == 100
    assert reader.bounded_count(df, F.col("id") < 50, 100) == 50


# ---- geo -------------------------------------------------------------------
def test_parse_geo_point(spark):
    # the even-spread fixture's location form: '-72.7229, -178.84325'
    rows = [
        ("-72.7229, -178.84325",),
        ("33.435967,-111.867710",),
        ("91.0, 0.0",),  # out-of-range lat → null
        ("garbage",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "location string")
    got = df.select(reader.parse_geo_point("location").alias("p")).collect()
    assert (got[0]["p"]["lat"], got[0]["p"]["lon"]) == (-72.7229, -178.84325)
    assert (got[1]["p"]["lat"], got[1]["p"]["lon"]) == (33.435967, -111.867710)
    assert got[2]["p"]["lat"] is None
    assert got[3]["p"]["lat"] is None and got[3]["p"]["lon"] is None
    assert got[4]["p"]["lat"] is None



def test_haversine_known_distance(spark):
    # London (51.5074, -0.1278) → Paris (48.8566, 2.3522) ≈ 343.5 km
    df = spark.createDataFrame([(51.5074, -0.1278, 48.8566, 2.3522)],
                               "lat1 double, lon1 double, lat2 double, lon2 double")
    d = df.select(
        reader.haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
    ).collect()[0]["d"]
    assert abs(d - 343_500) < 2_000


def test_geo_distance_sort(spark):
    # 1° lon at the equator ≈ 111.3 km → ids at ~111/334/222 km
    rows = [(1, 0.0, 1.0), (2, 0.0, 3.0), (3, 0.0, 2.0)]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    out = reader.geo_distance(df, "lat", "lon", (0.0, 0.0), 250, "km")
    assert [r["id"] for r in out.collect()] == [1, 3]
    # sort=None (r7): identical row set and identical distances, no
    # Sort/rangepartition in the plan
    unsorted = reader.geo_distance(
        df, "lat", "lon", (0.0, 0.0), 250, "km", sort=None
    )
    assert {(r["id"], r["_distance_m"]) for r in unsorted.collect()} == {
        (r["id"], r["_distance_m"]) for r in out.collect()
    }
    plan = unsorted._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan and "Sort " not in plan, plan


# ---- writer merge semantics not covered by the entry oracle -----------------
def test_dual_yield(spark):
    # ElasticsearchBulkSender.ts:55-62 — new key upserted, old key
    # deleted in the same pass
    target = spark.createDataFrame(
        [(1, "old1"), (2, "old2"), (3, "old3")], "doc_id long, v string"
    )
    source = spark.createDataFrame(
        [(10, "new10", 1), (2, "upd2", None)],
        "doc_id long, v string, _delete_id long",
    )
    out = writer.apply_dual_yield(target, source)
    got = {r["doc_id"]: r["v"] for r in out.collect()}
    assert got == {10: "new10", 2: "upd2", 3: "old3"}  # 1 deleted


def test_update_fields_subset(spark):
    # applyUpdateFields (:129-137): only the named columns change
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "doc_id long, v string, n long"
    )
    source = spark.createDataFrame(
        [(1, "A", 99), (3, "C", 99)], "doc_id long, v string, n long"
    )
    out = writer.merge_update(target, source, update_fields=["v"])
    got = {r["doc_id"]: (r["v"], r["n"]) for r in out.collect()}
    # row 1: v updated, n untouched; row 3: not matched → not inserted
    assert got == {1: ("A", 10), 2: ("b", 20)}


def test_index_matcher_goldens():
    """indexMatcher (ElasticsearchReaderAPI.ts:809-815): wildcard
    configs glob; plain configs match by CONTAINMENT, not equality."""
    m = reader.index_matcher("events-*")
    assert m("events-2024") and m("events-") and not m("logs-2024")
    assert not m("xevents-2024")  # anchored glob
    m = reader.index_matcher("events")
    assert m("events") and m("my-events-v2")  # includes(), not ==
    assert not m("evts")
    # '?' is an OPTIONAL character (@terascope/utils wildCardToRegex,
    # ADVICE r4) — zero-or-one, unlike Lucene's exactly-one
    m = reader.index_matcher("ev?nts")
    assert m("events") and m("evants") and m("evnts")
    assert not m("evaants")


def test_get_window_size_resolution():
    """getWindowSize (:760-778): first matching index wins; explicit
    settings override defaults; prefixed + flat shapes both resolve;
    no match -> configured size."""
    settings = {
        "logs-2024": {"settings": {"index.max_result_window": 5000}},
        "events-2024": {
            "settings": {"index": {"index.max_result_window": 20000}},
            "defaults": {"index.max_result_window": 10000},
        },
        "events-2025": {"defaults": {"index.max_result_window": 7000}},
    }
    assert reader.get_window_size("events-*", settings, 1000) == 20000
    assert reader.get_window_size("events-2025", settings, 1000) == 7000
    assert reader.get_window_size("logs", settings, 1000) == 5000
    assert reader.get_window_size("nothing-*", settings, 1000) == 1000
    # a matching index without any window keeps walking, then falls back
    assert reader.get_window_size(
        "events", {"events-x": {"settings": {}}}, 1234
    ) == 1234
    # toIntegerOrThrow on a malformed setting
    with pytest.raises(ValueError, match="parsed to an integer"):
        reader.get_window_size(
            "ev", {"events": {"settings": {"index.max_result_window": "abc"}}}, 1
        )
    # JS truthiness (ADVICE r4): an explicit 0 / '' is falsy — falls
    # through settings -> defaults -> next index -> configured size
    assert reader.get_window_size(
        "events",
        {
            "events-a": {
                "settings": {"index.max_result_window": 0},
                "defaults": {"index.max_result_window": 6000},
            }
        },
        1000,
    ) == 6000
    assert reader.get_window_size(
        "events",
        {"events-a": {"settings": {"index.max_result_window": ""}}},
        1000,
    ) == 1000


def test_validate_window_size_per_index():
    settings = {"small-idx": {"settings": {"index.max_result_window": 100}}}
    assert reader.validate_window_size_for_index(100, "small-*", settings) == 100
    with pytest.raises(ValueError, match="small-\\*"):
        reader.validate_window_size_for_index(101, "small-*", settings)


def test_max_result_window_guard():
    # Q16 (ElasticsearchReaderAPI.ts:287-295): size above the window is
    # refused with the reference's error shape
    import pytest

    assert reader.validate_window_size(5000) == 5000
    assert reader.validate_window_size(20000, max_result_window=50000) == 20000
    with pytest.raises(ValueError, match="max_result_window"):
        reader.validate_window_size(10001)


def test_merge_script_expression_update(spark):
    # K1.f applyScript (ElasticsearchBulkSender.ts:139-151): a simple
    # `ctx._source.n += params.inc` script as a Column expression;
    # unmatched rows untouched, params bound from source columns
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "doc_id long, v string, n long"
    )
    source = spark.createDataFrame(
        [(1, 5), (3, 7), (4, 100)], "doc_id long, inc long"
    )
    out = writer.merge_script(
        target,
        source,
        {"n": F.col("n") + F.col("param_inc"),
         "v": F.concat(F.col("v"), F.lit("!"))},
    )
    got = {r["doc_id"]: (r["v"], r["n"]) for r in out.collect()}
    # 1 and 3 scripted; 2 untouched; 4 not inserted (update touches
    # existing docs only)
    assert got == {1: ("a!", 15), 2: ("b", 20), 3: ("c!", 37)}


def test_write_routed_partitions_by_route(spark, tmp_path):
    # K1.h dynamic routing `index-{route}` (createRoute :37-47): the
    # route column becomes a partition directory; reading one route back
    # prunes to that directory
    import os

    df = spark.createDataFrame(
        [(1, "a", "eu"), (2, "b", "us"), (3, "c", "eu")],
        "doc_id long, v string, route string",
    )
    out = str(tmp_path / "routed")
    writer.write_routed(df, out)
    assert sorted(
        d for d in os.listdir(out) if d.startswith("route=")
    ) == ["route=eu", "route=us"]
    back = spark.read.parquet(out).where(F.col("route") == "eu")
    assert {r["doc_id"] for r in back.collect()} == {1, 3}


def test_dead_letter_rejection_golden(spark):
    """processor-spec.ts:198-241 golden: docs pre-marked with rejection
    metadata 'unretryable error' reach the dead-letter queue ONLY when
    _dead_letter_action is 'kafka_dead_letter'; under 'none' (the
    default the spec's opConfig starts with) no record is rejected."""
    rows = [
        (1, 2, "unretryable error"),
        (2, 4, "unretryable error"),
        (3, 6, None),
    ]
    src = spark.createDataFrame(
        rows, f"_key long, test_field long, {writer.REJECTION_COL} string"
    )

    # action 'none': rejectRecord never fires, batch passes through whole
    accepted, rejected = writer.split_rejections(src, dead_letter_action="none")
    assert rejected.count() == 0
    assert accepted.count() == 3
    assert writer.REJECTION_COL not in accepted.columns

    # kafka_dead_letter: (doc, err) pairs for exactly the marked records
    accepted, rejected = writer.split_rejections(src)
    assert sorted(r["_key"] for r in accepted.collect()) == [3]
    got = sorted(
        (r["_key"], r["test_field"], r[writer.REJECTION_COL])
        for r in rejected.collect()
    )
    assert got == [
        (1, 2, "unretryable error"),
        (2, 4, "unretryable error"),
    ]


def test_mark_rejections_first_rule_wins(spark):
    src = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x" * 10), (4, "ok")], "_key long, body string"
    )
    marked = writer.mark_rejections(
        src,
        {
            "missing body": F.col("body").isNull() | (F.length("body") == 0),
            "oversize doc": F.length("body") > 5,
        },
    )
    got = {r["_key"]: r[writer.REJECTION_COL] for r in marked.collect()}
    assert got == {1: "missing body", 2: "missing body", 3: "oversize doc", 4: None}
    # unmarked source: split_rejections synthesizes the column, rejects 0
    accepted, rejected = writer.split_rejections(src)
    assert rejected.count() == 0 and accepted.count() == 4


def test_rejection_split_composes_with_merge(spark):
    """The accepted side feeds the merge; rejected rows must NOT reach
    the target (the reference's bad records never land in ES)."""
    target = spark.createDataFrame([(1, "old"), (2, "old")], "doc_id long, v string")
    src = spark.createDataFrame(
        [(1, "new"), (2, None), (9, "new")], "doc_id long, v string"
    )
    marked = writer.mark_rejections(src, {"missing v": F.col("v").isNull()})
    accepted, rejected = writer.split_rejections(marked)
    merged = writer.merge_index(target, accepted)
    got = {r["doc_id"]: r["v"] for r in merged.collect()}
    assert got == {1: "new", 2: "old", 9: "new"}
    assert [r["doc_id"] for r in rejected.collect()] == [2]


def test_bulk_last_write_wins(spark):
    target = spark.createDataFrame([(1, "x")], "doc_id long, v string")
    source = spark.createDataFrame(
        [(1, "first", 0), (1, "last", 1)], "doc_id long, v string, _seq long"
    )
    out = writer.merge_index(target, source)
    got = {r["doc_id"]: r["v"] for r in out.collect()}
    assert got == {1: "last"}


def test_fetch_expansion_recovers_grown_slice(spark):
    # fetcher-spec.ts:154-167 — slice counted 4 docs, 4 more arrived:
    # the expansion retry retrieves all 8
    df = spark.range(8).select(F.col("id").alias("doc_id"))
    rows = reader.fetch_with_expansion(df, None, count=4)
    assert len(rows) == 8


def test_fetch_expansion_retry_limit_golden_error(spark):
    # fetcher-spec.ts:200-227 — 32 docs behind a stale count of 4:
    # sizes walk 6→9→14→21→32 and fail with the reference's message
    import pytest

    df = spark.range(32).select(F.col("id").alias("doc_id"))
    with pytest.raises(
        ValueError,
        match="The result set contained exactly 32 records, "
        "searching again with size: 48",
    ):
        reader.fetch_with_expansion(df, None, count=4)


def test_fetch_expansion_window_guard(spark):
    # ElasticsearchReaderAPI.ts:117-124 — expanded size past the window
    # is refused up front
    import pytest

    df = spark.range(5).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="greater than the index.max_result_window"):
        reader.fetch_with_expansion(df, None, count=9000, max_result_window=10000)
