"""buildQuery composition parity (utils.ts:9-110) + validateGeoParameters
error goldens (utils.ts:111-196, reference text verbatim)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.operators import reader
from elasticsearch_assets_spark.sources.jobconfig import validate_geo_parameters


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("key", F.md5(F.col("event_id").cast("string")))
        .withColumn(
            # event_id spans the full range at every SF (user_id is
            # 0-14 at sf0.001 and would pin every point to one corner)
            "loc",
            F.concat(
                ((F.col("event_id") % 180) - 90).cast("string"),
                F.lit(","),
                ((F.col("event_id") % 360) - 180).cast("string"),
            ),
        )
        .persist()
    )


CFG = {"date_field_name": "ts", "id_field_name": "key"}


def test_count_required(events):
    with pytest.raises(ValueError, match="Expected count to buildQuery"):
        reader.build_slice_query(events, CFG, {"start": "2024-01-01"})


def test_range_plus_keys_conjunction(events):
    """_buildRangeQuery pushes BOTH musts: the date range AND the key
    prefix OR — result == manual intersection."""
    sl = {
        "start": "2024-01-05",
        "end": "2024-01-12",
        "keys": ["a", "b"],
        "count": 100,
    }
    got = reader.build_slice_query(events, CFG, sl)
    manual = events.where(
        reader.date_range_pred("ts", "2024-01-05", "2024-01-12")
        & (F.col("key").startswith("a") | F.col("key").startswith("b"))
    )
    assert got.count() == manual.count() > 0


def test_recurse_optimization_regexp_equals_wildcard(events):
    """recurse_optimization switches wildcard `key*` → regexp `key.*`
    (utils.ts:78-90) — same result set, different ES query shape."""
    sl = {"keys": ["3f"], "count": 100}
    wc = reader.build_slice_query(events, CFG, sl)
    rx = reader.build_slice_query(
        events, {**CFG, "recurse_optimization": True}, sl
    )
    assert wc.count() == rx.count() > 0


def test_exact_key_marker_wildcard_path(spark):
    """A trailing `$` in a slice key (id_slicer conserve_exact) is an
    exact-key slice: `ab$` matches key == 'ab', NOT startswith('ab$')
    (which matches nothing in any reference keyspace)."""
    df = spark.createDataFrame(
        [("ab",), ("abc",), ("abd",), ("b1",)], "key string"
    )
    got = {
        r["key"]
        for r in df.where(reader.id_prefix_pred("key", ["ab$"])).collect()
    }
    assert got == {"ab"}
    # mixed plain-prefix + exact-key slice set
    got2 = {
        r["key"]
        for r in df.where(reader.id_prefix_pred("key", ["ab$", "b"])).collect()
    }
    assert got2 == {"ab", "b1"}


def test_exact_key_marker_recurse_path(spark):
    """The recurse_optimization regexp path translates `ab$` to
    equality too — not a regex whose `$` anchors by accident."""
    df = spark.createDataFrame(
        [("ab",), ("abc",), ("b1",)], "key string"
    )
    cfg = {"date_field_name": "ts", "id_field_name": "key",
           "recurse_optimization": True}
    got = {
        r["key"]
        for r in reader.build_slice_query(
            df, cfg, {"keys": ["ab$"], "count": 10}
        ).collect()
    }
    assert got == {"ab"}


def test_conserve_exact_slices_partition_variable_length_keyspace(spark):
    """End-to-end conservation: slice plan over a variable-length
    keyspace (where bare wildcard descent LOSES the exact-prefix docs),
    fetched back through build_slice_query — the slices must partition
    the table exactly (every doc in exactly one slice)."""
    from elasticsearch_assets_spark.operators.id_slicer import id_slicer_plan

    keys = [f"a{i:x}" for i in range(12)] + ["a"] + [f"b{i:x}" for i in range(3)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    counts = {}

    def count_fn(prefix):
        return sum(1 for k in keys if k.startswith(prefix))

    plan = id_slicer_plan(count_fn, "hexadecimal", key_set=list("ab"), size=8)
    assert any(k.endswith("$") for k, _ in plan)  # the 'a' doc needs one
    cfg = {"date_field_name": "ts", "id_field_name": "key"}
    seen: list[str] = []
    for slice_key, cnt in plan:
        rows = reader.build_slice_query(
            df, cfg, {"keys": [slice_key], "count": cnt}
        ).collect()
        assert len(rows) == cnt  # plan count == fetch count, per slice
        seen.extend(r["key"] for r in rows)
    assert sorted(seen) == sorted(keys)  # no loss, no double-fetch


def test_geo_distance_invalid_unit_rejected(events):
    cfg = {
        **CFG,
        "geo_field": "loc",
        "geo_point": "10,10",
        "geo_distance": "50kn",
    }
    with pytest.raises(ValueError, match="invalid geo_distance unit"):
        reader.build_slice_query(events, cfg, {"count": 10})


def test_keys_require_id_field_name(events):
    with pytest.raises(ValueError, match="Missing id_field_name for id slicer"):
        reader.build_slice_query(
            events, {"date_field_name": "ts"}, {"keys": ["a"], "count": 1}
        )


def test_lucene_query_clause_composes(events):
    cfg = {**CFG, "query": "event_type:click AND value:>=10"}
    sl = {"start": "2024-01-05", "end": "2024-01-12", "count": 100}
    got = reader.build_slice_query(events, cfg, sl)
    manual = events.where(
        reader.date_range_pred("ts", "2024-01-05", "2024-01-12")
        & (F.col("event_type") == "click")
        & (F.col("value") >= 10)
    )
    assert got.count() == manual.count() > 0


def test_fields_projection(events):
    cfg = {**CFG, "fields": ["event_id", "event_type"]}
    out = reader.build_slice_query(events, cfg, {"count": 10})
    assert out.columns == ["event_id", "event_type"]


def test_geo_box_query_with_string_points(events):
    cfg = {
        **CFG,
        "geo_field": "loc",
        "geo_box_top_left": "45, -90",
        "geo_box_bottom_right": "-45, 90",
    }
    out = reader.build_slice_query(events, cfg, {"count": 10})
    n = out.count()
    assert n > 0
    # every surviving point is inside the box
    bad = out.where(
        ~F.col("_glat").between(-45.0, 45.0) | ~F.col("_glon").between(-90.0, 90.0)
    ).count()
    assert bad == 0


def test_geo_distance_query_sorted(events):
    cfg = {
        **CFG,
        "geo_field": "loc",
        "geo_point": "40, -60",
        "geo_distance": "3000km",
    }
    out = reader.build_slice_query(events, cfg, {"count": 10})
    rows = out.select("_distance_m").collect()
    assert rows
    ds = [r["_distance_m"] for r in rows]
    assert ds == sorted(ds)  # the implicit _geo_distance sort
    assert max(ds) <= 3000 * 1000.0


# ---- validateGeoParameters goldens -------------------------------------
@pytest.mark.parametrize(
    "cfg,msg",
    [
        (
            {"geo_box_top_left": "1,1", "geo_point": "1,1"},
            "geo_box and geo_distance queries can not be combined.",
        ),
        (
            {"geo_point": "1,1"},
            "Both geo_point and geo_distance must be provided",
        ),
        (
            {"geo_box_top_left": "1,1"},
            "Both geo_box_top_left and geo_box_bottom_right must be provided",
        ),
        (
            {
                "geo_box_top_left": "1,1",
                "geo_box_bottom_right": "0,2",
                "geo_sort_order": "asc",
            },
            "requires geo_sort_point to be set",
        ),
        (
            {"geo_point": "1,1", "geo_distance": "10m"},
            "requires geo_field to be set",
        ),
        (
            {"geo_field": "loc"},
            "geo_box or geo_distance query parameters need to be provided",
        ),
    ],
)
def test_geo_validation_goldens(cfg, msg):
    with pytest.raises(ValueError, match=msg):
        validate_geo_parameters(cfg)


def test_geo_validation_accepts_valid():
    validate_geo_parameters(
        {"geo_field": "loc", "geo_point": "1,1", "geo_distance": "10km"}
    )
    validate_geo_parameters(
        {
            "geo_field": "loc",
            "geo_box_top_left": "1,1",
            "geo_box_bottom_right": "0,2",
        }
    )
