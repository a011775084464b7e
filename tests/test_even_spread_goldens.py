"""Canonical even-spread fixture goldens: replay the reference's
harness-level slicer specs against the reconstructed 1,000-doc fixture
and demand EXACT plan equality — slice boundaries, counts, emit order,
char-class strings.

Golden sources (all in /root/reference):
- date plans: test/elasticsearch_reader/slicer-spec.ts:175-248 (auto /
  start / end interval metadata), :270-320 (7-slice size-200 plan),
  :402-627 (32-slice size-50 plan)
- id plans: test/id_reader/slicer-spec.ts:101-118 (16 hex slices),
  :132-139 (key_range subset), :157-173 (size-40 depth-2), :197-202 +
  :227-303 (I3 char-class plans), :327-377 (starting_key_depth=3),
  :429-447 (retry resume)
"""

from __future__ import annotations

import numpy as np
import pytest

from elasticsearch_assets_spark.fixtures import even_spread as ES
from elasticsearch_assets_spark.operators.date_slicer import date_slicer_plan
from elasticsearch_assets_spark.operators.id_slicer import (
    class_count_fn_from_keys,
    id_slicer_plan,
    id_slicer_plan_optimized,
)
from elasticsearch_assets_spark.operators.reader import auto_interval_ms

OFFS = np.array(ES.created_offsets_ms())
UUIDS = ES.uuid_list()
CCF = class_count_fn_from_keys(UUIDS)


def _cf(a: int, b: int) -> int:
    return int(np.searchsorted(OFFS, b) - np.searchsorted(OFFS, a))


def _pcf(p: str) -> int:
    return CCF(p, None)


# --- fixture invariants -----------------------------------------------------
def test_fixture_shape():
    rows = ES.even_spread_rows()
    assert len(rows) == 1000
    assert all(len(r["uuid"]) == 36 for r in rows)
    assert min(r["created"] for r in rows) == "2019-04-26T15:00:23.201Z"
    assert max(r["created"] for r in rows) == "2019-04-26T15:00:23.393Z"


# --- date slicer metadata goldens (slicer-spec.ts:175-248) -------------------
def test_auto_metadata_and_first_slices():
    # no start/end: interval [9,'ms'], count 1000, first slice [201,210):14
    assert _cf(0, 193) == 1000
    assert auto_interval_ms(0, 193, 1000, 50) == 9
    assert date_slicer_plan(_cf, 0, 193, 9, 50)[0].__dict__ == {
        "start_ms": 0, "end_ms": 9, "limit_ms": 193, "count": 14,
    }
    # start=.250 only: interval [8,'ms'], count 868, first [250,258):48
    assert _cf(49, 193) == 868
    assert auto_interval_ms(49, 193, 868, 50) == 8
    s0 = date_slicer_plan(_cf, 49, 193, 8, 50)[0]
    assert (s0.start_ms, s0.end_ms, s0.count) == (49, 57, 48)
    # end=.280 only: interval [13,'ms'], count 275, first [201,214):25
    assert _cf(0, 79) == 275
    assert auto_interval_ms(0, 79, 275, 50) == 13
    s0 = date_slicer_plan(_cf, 0, 79, 13, 50)[0]
    assert (s0.start_ms, s0.end_ms, s0.count) == (0, 13, 25)


# --- full date plans ---------------------------------------------------------
GOLDEN_SIZE200 = [
    (0, 38, 99), (38, 76, 169), (76, 114, 172), (114, 133, 148),
    (133, 171, 199), (171, 182, 111), (182, 193, 102),
]
GOLDEN_SIZE50 = [
    (0, 9, 14), (9, 18, 30), (18, 27, 27), (27, 36, 25), (36, 45, 20),
    (45, 54, 44), (54, 58, 27), (58, 62, 30), (62, 71, 33), (71, 80, 28),
    (80, 89, 20), (89, 98, 37), (98, 107, 47), (107, 111, 30), (111, 115, 35),
    (115, 119, 27), (119, 123, 35), (123, 127, 28), (127, 131, 30),
    (131, 135, 30), (135, 139, 22), (139, 143, 29), (143, 152, 34),
    (152, 161, 25), (161, 165, 17), (165, 169, 40), (169, 173, 48),
    (173, 177, 37), (177, 181, 39), (181, 185, 34), (185, 189, 38),
    (189, 193, 40),
]


@pytest.mark.parametrize(
    "size,golden", [(200, GOLDEN_SIZE200), (50, GOLDEN_SIZE50)],
    ids=["size200_7slices", "size50_32slices"],
)
def test_date_plan_golden(size, golden):
    interval = auto_interval_ms(0, 193, 1000, size)
    plan = date_slicer_plan(_cf, 0, 193, interval, size, resolution="ms")
    assert [(p.start_ms, p.end_ms, p.count) for p in plan] == golden
    assert all(p.limit_ms == 193 for p in plan)
    assert sum(p.count for p in plan) == 1000


# --- id slicer goldens -------------------------------------------------------
GOLDEN_ID16 = [
    ("a", 58), ("b", 82), ("c", 64), ("d", 49), ("e", 59), ("f", 51),
    ("0", 70), ("1", 55), ("2", 55), ("3", 54), ("4", 68), ("5", 64),
    ("6", 52), ("7", 80), ("8", 75), ("9", 64),
]


def test_id_plan_16_slices_base64url_order():
    # default key_type is base64url: lowercase letters before numerics,
    # A-Z/g-z pruned as empty (slicer-spec.ts:101-118)
    assert id_slicer_plan(_pcf, "base64url", size=10000) == GOLDEN_ID16


def test_id_plan_key_range_subset():
    got = id_slicer_plan(_pcf, "base64url", key_set=["a", "b"], size=10000)
    assert got == [("a", 58), ("b", 82)]


def test_id_plan_descend_to_size():
    # hexadecimal order at depth 2, a2 (count 0) pruned (:157-173)
    got = id_slicer_plan(_pcf, "hexadecimal", key_set=["a"], size=40)
    assert got == [
        ("a0", 5), ("a1", 7), ("a3", 2), ("a4", 3), ("a5", 3), ("a6", 3),
        ("a7", 4), ("a8", 5), ("a9", 8), ("aa", 3), ("ab", 3), ("ac", 3),
        ("ad", 4), ("ae", 4), ("af", 1),
    ]


def test_id_plan_retry_resume():
    # I4: resume after lastSlice keys ['a6'] (:429-447)
    got = id_slicer_plan(
        _pcf, "base64url", key_set=["a"], size=10000, retry_key="a6"
    )
    assert got == [("a7", 4), ("a8", 5), ("a9", 8)]


GOLDEN_I3_FULL = [
    ("0[0-3]", 16), ("0[4-7]", 16), ("0[8-9a-b]", 19), ("0[c-f]", 19),
    ("1[0-3]", 18), ("1[4-7]", 10), ("1[8-9a-b]", 11), ("1[c-f]", 16),
    ("2[0-4]", 20), ("2[5-9]", 14), ("2[a-e]", 17), ("2[f]", 4),
    ("3[0-4]", 5), ("3[5-8]", 17), ("3[9a-b]", 16), ("3[c-e]", 12), ("3[f]", 4),
    ("4[0-3]", 14), ("4[4-7]", 17), ("4[8-9]", 12), ("4[a-b]", 15),
    ("4[c-d]", 5), ("4[e-f]", 5),
    ("5[0-3]", 18), ("5[4-7]", 17), ("5[8-9a-b]", 11), ("5[c-f]", 18),
    ("6[0-5]", 14), ("6[6-9a]", 18), ("6[b-f]", 20),
    ("7[0-3]", 17), ("7[4-7]", 20), ("7[8-9a]", 15), ("7[b-d]", 16),
    ("7[e-f]", 12),
    ("8[0-3]", 17), ("8[4-6]", 19), ("8[7-8]", 13), ("8[9a]", 11),
    ("8[b-c]", 5), ("8[d-e]", 6), ("8[f]", 4),
    ("9[0-2]", 13), ("9[3-5]", 16), ("9[6-8]", 11), ("9[9a-b]", 12),
    ("9[c-e]", 8), ("9[f]", 4),
    ("a[0-4]", 17), ("a[5-8]", 15), ("a[9a-c]", 17), ("a[d-f]", 9),
    ("b[0-2]", 7), ("b[3-5]", 15), ("b[6-8]", 18), ("b[9a-b]", 16),
    ("b[c-e]", 20), ("b[f]", 6),
    ("c[0-3]", 18), ("c[4-5]", 12), ("c[6-7]", 10), ("c[8-9]", 6),
    ("c[a-b]", 7), ("c[c-d]", 4), ("c[e-f]", 7),
    ("d[0-5]", 17), ("d[6-9a-b]", 19), ("d[c-f]", 13),
    ("e[0-3]", 18), ("e[4-7]", 15), ("e[8-9a-b]", 14), ("e[c-f]", 12),
    ("f[0-5]", 15), ("f[6-9a]", 18), ("f[b-f]", 18),
]


def test_i3_optimized_key_range_a():
    # "double recurses, first it takes 5 keys, then 4" (:197-202)
    got = id_slicer_plan_optimized(CCF, "hexadecimal", key_set=["a"], size=20)
    assert got == [
        ("a[0-4]", 17), ("a[5-8]", 15), ("a[9a-c]", 17), ("a[d-f]", 9)
    ]


def test_i3_optimized_full_index():
    # the 77-class whole-index plan (:227-303), exact
    got = id_slicer_plan_optimized(CCF, "hexadecimal", size=20)
    assert got == GOLDEN_I3_FULL
    assert sum(c for _, c in got) == 1000


def test_id_plan_starting_key_depth():
    # all 49 depth-3 slices under 'a', base64url DFS order (:327-377)
    got = id_slicer_plan(
        _pcf, "base64url", key_set=["a"], size=10000, starting_key_depth=3
    )
    golden = [
        ("aa5", 1), ("aa6", 1), ("aa7", 1), ("aba", 1), ("abc", 1), ("ab4", 1),
        ("ac3", 1), ("ac5", 1), ("ac8", 1), ("ad1", 1), ("ad4", 1), ("ad5", 1),
        ("ad6", 1), ("aea", 1), ("aef", 1), ("ae0", 1), ("ae8", 1), ("af4", 1),
        ("a0c", 1), ("a0f", 2), ("a01", 1), ("a04", 1), ("a1b", 1), ("a1c", 1),
        ("a1e", 1), ("a1f", 1), ("a11", 2), ("a17", 1), ("a36", 2), ("a4e", 1),
        ("a42", 1), ("a43", 1), ("a50", 1), ("a52", 1), ("a53", 1), ("a6d", 1),
        ("a6e", 1), ("a69", 1), ("a7a", 1), ("a7d", 2), ("a7e", 1), ("a8d", 1),
        ("a8f", 2), ("a89", 2), ("a9d", 1), ("a9e", 2), ("a94", 2), ("a95", 1),
        ("a97", 2),
    ]
    assert got == golden


# --- e2e reindex anchor (test/e2e/e2e-spec.ts:27-34,100-108) -----------------
def test_e2e_reindex_100k_in_32_slices(spark):
    """The reference's flagship integration test: 100 copies of the
    even-spread data (100,000 docs, same `created` distribution, fresh
    uuids) reindexed with the default reader size → EXACTLY 32 slices
    processed, zero failures, output count == input count."""
    import pandas as pd

    from elasticsearch_assets_spark.operators.date_slicer import (
        date_slicer_plan,
        make_date_slicer_ranges,
        spark_count_fn,
    )
    from elasticsearch_assets_spark.operators.reader import date_range_scan

    offs = ES.created_offsets_ms()
    pdf = pd.DataFrame(
        {
            "doc_id": range(100_000),
            "created": [
                pd.Timestamp("2019-04-26T15:00:23.201Z").tz_localize(None)
                + pd.Timedelta(milliseconds=offs[i % 1000])
                for i in range(100_000)
            ],
        }
    )
    df = spark.createDataFrame(pdf).cache()
    assert df.count() == 100_000

    # default reader size 5,000 (schema.ts:27-34); counts are 100x the
    # fixture, so every walk decision scales exactly → golden A's plan
    [rng] = make_date_slicer_ranges(df, "created", n_slicers=1, size=5000)
    assert rng["count"] == 100_000 and rng["interval_ms"] == 9
    cf = spark_count_fn(df, "created")
    plan = date_slicer_plan(
        cf, rng["start"], rng["limit"], rng["interval_ms"], 5000
    )
    assert len(plan) == 32  # _slicer_stats.processed == 32
    base = rng["start"]
    assert [(p.start_ms - base, p.end_ms - base, p.count) for p in plan] == [
        (s, e, 100 * c) for s, e, c in GOLDEN_SIZE50
    ]

    # "reindex": fetch each slice, write-merge, count parity (zero lost)
    total = 0
    for p in plan[:3] + plan[-2:]:  # spot-fetch head+tail slices
        got = date_range_scan(
            df,
            "created",
            pd.Timestamp(p.start_ms, unit="ms"),
            pd.Timestamp(p.end_ms, unit="ms"),
        ).count()
        assert got == p.count
    assert sum(p.count for p in plan) == 100_000
    df.unpersist()


# --- end-to-end through Spark (make_date_slicer_ranges + spark count fns) ----
def test_even_spread_through_spark(spark):
    from elasticsearch_assets_spark.operators.date_slicer import (
        make_date_slicer_ranges,
        spark_count_fn,
    )
    from elasticsearch_assets_spark.operators.id_slicer import (
        spark_prefix_count_fn,
    )

    df = ES.even_spread_df(spark).cache()
    assert df.count() == 1000
    [rng] = make_date_slicer_ranges(df, "created", n_slicers=1, size=50)
    assert rng["count"] == 1000
    assert rng["limit"] - rng["start"] == 193
    assert rng["interval_ms"] == 9
    # the full size-200 walk with counts served by Spark
    cf = spark_count_fn(df, "created")
    base = rng["start"]
    plan = date_slicer_plan(
        lambda a, b: cf(base + a, base + b), 0, 193, 38, 200
    )
    assert [(p.start_ms, p.end_ms, p.count) for p in plan] == GOLDEN_SIZE200
    # id plan through the Spark prefix counter
    pcf = spark_prefix_count_fn(df, "uuid")
    assert id_slicer_plan(pcf, "base64url", size=10000) == GOLDEN_ID16
    df.unpersist()
