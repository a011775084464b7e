"""ES search-API aggregations (operators/aggs.py): HLL cardinality
(accuracy, mergeability, partition-invariance, cross-engine estimate),
exact percentiles vs numpy, extended_stats vs pandas, terms bucket
ordering + sum_other_doc_count, composite pagination completeness,
histogram/geotile bucket math."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.operators import aggs


@pytest.fixture(scope="module")
def ids10k(spark):
    return spark.range(10_000).select(
        F.md5(F.col("id").cast("string")).alias("v"), F.col("id")
    )


# ---------------------------------------------------------------------------
# HLL cardinality
# ---------------------------------------------------------------------------


def test_hll_accuracy_linear_regime(spark, ids10k):
    row = aggs.cardinality(ids10k, "v", p=12).collect()[0]
    # p=12 linear-counting regime: std err ~1.6%, assert 3%
    assert abs(row["cardinality_est"] - 10_000) / 10_000 < 0.03
    assert row["regime"] == "linear"
    assert 0 < row["filled_registers"] <= 4096


def test_hll_accuracy_raw_regime(spark, ids10k):
    # p=8 (m=256): n/m ~ 39, far past 2.5m — raw harmonic-mean regime.
    # Classic HLL (no ++ bias table) keeps ~2x the 1.04/sqrt(m)=6.5%
    # std err; assert a 3-sigma-ish 20%.
    row = aggs.cardinality(ids10k, "v", p=8).collect()[0]
    assert row["regime"] == "raw"
    assert abs(row["cardinality_est"] - 10_000) / 10_000 < 0.20


def test_hll_partition_invariance(spark, ids10k):
    a = aggs.cardinality(ids10k, "v", p=12).collect()[0]
    b = aggs.cardinality(ids10k.repartition(17), "v", p=12).collect()[0]
    assert a["cardinality_est"] == b["cardinality_est"]
    assert a["filled_registers"] == b["filled_registers"]


def test_hll_merge_equals_union(spark, ids10k):
    lo = ids10k.where(F.col("id") < 6000)
    hi = ids10k.where(F.col("id") >= 4000)  # overlapping shards
    merged = aggs.hll_merge(
        aggs.hll_registers(lo, "v", 12), aggs.hll_registers(hi, "v", 12)
    )
    est_m = aggs.hll_estimate(merged, 12).collect()[0]
    est_u = aggs.cardinality(ids10k, "v", 12).collect()[0]
    assert est_m["cardinality_est"] == est_u["cardinality_est"]


def test_hll_duckdb_estimate_identical(spark, ids10k):
    """The determinism protocol end-to-end: DuckDB computing the same
    sketch over the same values produces the bit-identical estimate
    (pre-pins the driver oracle's SQL shape)."""
    import duckdb

    m, _, C = aggs.hll_constants(12)
    got = aggs.cardinality(ids10k, "v", p=12).collect()[0]
    sql = f"""
WITH h AS (SELECT md5(md5(id::VARCHAR)) AS hx FROM range(10000) t(id)),
r AS (SELECT ('0x' || substr(hx, 1, 3))::INT AS bucket,
             ('0x' || substr(hx, 4, 13))::BIGINT AS w FROM h),
regs AS (SELECT bucket,
                max(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS M
         FROM r GROUP BY bucket),
s AS (SELECT sum(((1::BIGINT) << (53 - M))::HUGEINT) AS snum,
             count(*) AS nz FROM regs),
e AS (SELECT nz,
             {C!r} / (snum::DOUBLE + ({m} - nz)::DOUBLE * {float(1 << 53)!r})
               AS raw FROM s)
SELECT round(CASE WHEN {m} - nz > 0 AND raw <= {2.5 * m}
             THEN {float(m)!r} * ln({float(m)!r} / ({m} - nz)::DOUBLE)
             ELSE raw END, 4) AS est,
       nz FROM e
"""
    est, nz = duckdb.sql(sql).fetchone()
    assert est == got["cardinality_est"]
    assert nz == got["filled_registers"]


def test_hll_bad_p_rejected():
    with pytest.raises(ValueError):
        aggs.hll_constants(10)


# ---------------------------------------------------------------------------
# percentiles / extended_stats
# ---------------------------------------------------------------------------


def test_percentiles_match_numpy(spark):
    vals = [((i * 37) % 1000) + 3 for i in range(777)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    ps = [0.25, 0.5, 0.75, 0.9, 0.99]
    got = {
        r["percent"]: r["value"]
        for r in aggs.percentiles(df, "v", ps).collect()
    }
    for p in ps:
        want = float(np.percentile(vals, p * 100, method="linear"))
        assert got[p] == pytest.approx(want, abs=1e-4)


def test_extended_stats_match_pandas(spark):
    vals = [((i * 13) % 211) for i in range(501)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    row = aggs.extended_stats(df, "v").collect()[0]
    s = pd.Series(vals)
    assert row["cnt"] == 501
    assert row["min"] == s.min() and row["max"] == s.max()
    assert row["sum"] == s.sum()
    assert row["avg"] == pytest.approx(s.mean(), abs=1e-4)
    assert row["var_pop"] == pytest.approx(s.var(ddof=0), abs=1e-3)
    assert row["var_samp"] == pytest.approx(s.var(ddof=1), abs=1e-3)
    assert row["std_pop"] == pytest.approx(s.std(ddof=0), abs=1e-3)


# ---------------------------------------------------------------------------
# terms / composite / histogram / geotile
# ---------------------------------------------------------------------------


def test_terms_ordering_and_other_count(spark):
    rows = [("a",)] * 5 + [("b",)] * 5 + [("c",)] * 3 + [("d",)] * 7
    df = spark.createDataFrame(rows, "k string")
    out = aggs.terms_agg(df, "k", size=2).collect()
    # count desc, key asc tie-break: d(7), then a(5) beats b(5)
    assert [(r["key"], r["doc_count"]) for r in out] == [("d", 7), ("a", 5)]
    assert all(r["sum_other_doc_count"] == 8 for r in out)  # b(5)+c(3)


def test_composite_pagination_walks_every_bucket(spark):
    rows = [(chr(97 + i % 5), i % 7) for i in range(300)]
    df = spark.createDataFrame(rows, "k1 string, k2 int")
    full = {
        (r["k1"], r["k2"]): r["doc_count"]
        for r in df.groupBy("k1", "k2").agg(F.count("*").alias("doc_count")).collect()
    }
    pages, after = {}, None
    for _ in range(100):
        page = aggs.composite_agg(df, ["k1", "k2"], size=6, after=after).collect()
        if not page:
            break
        for r in page:
            key = (r["k1"], r["k2"])
            assert key not in pages, "bucket served twice across pages"
            pages[key] = r["doc_count"]
        after = (page[-1]["k1"], page[-1]["k2"])
    assert pages == full  # every bucket exactly once, counts intact


def test_histogram_keys_and_conservation(spark):
    df = spark.createDataFrame([(float(i) / 3.0,) for i in range(200)], "v double")
    out = aggs.histogram(df, "v", 10.0).collect()
    assert sum(r["doc_count"] for r in out) == 200
    for r in out:
        assert r["key"] % 10.0 == 0.0


def test_geotile_points_fall_inside_their_tile(spark):
    pts = [(-37.81, 144.96), (40.71, -74.0), (51.5, -0.12), (0.0, 0.0), (89.9, 10.0)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    zoom = 6
    out = df.select(
        "lat", "lon", *(c.alias(n) for c, n in zip(aggs.geotile_xy(F.col("lat"), F.col("lon"), zoom), ("x", "y")))
    ).collect()
    n = 1 << zoom
    for r in out:
        assert 0 <= r["x"] < n and 0 <= r["y"] < n
        # invert the x tile: lon bounds
        lo = r["x"] / n * 360.0 - 180.0
        assert lo <= r["lon"] < lo + 360.0 / n
        # invert the y tile: lat bounds (mercator), clamped at the poles
        def tile_lat(y):
            return math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * y / n))))
        clat = min(max(r["lat"], -aggs._MAX_MERC_LAT), aggs._MAX_MERC_LAT)
        assert tile_lat(r["y"] + 1) - 1e-9 <= clat <= tile_lat(r["y"]) + 1e-9


def test_top_hits_per_bucket(spark):
    rows = [(chr(97 + i % 3), i, 100 - i) for i in range(30)]
    df = spark.createDataFrame(rows, "k string, id int, v int")
    out = aggs.top_hits(
        df, ["k"], [F.desc("v"), F.asc("id")], size=2, fields=["id", "v"]
    ).collect()
    assert len(out) == 6  # 3 buckets x 2 hits
    by_k = {}
    for r in out:
        by_k.setdefault(r["k"], []).append((r["hit_rank"], r["id"], r["v"]))
    # bucket 'a' holds ids 0,3,...,27; top-2 by v desc = ids 0 (v=100), 3 (v=97)
    assert sorted(by_k["a"]) == [(1, 0, 100), (2, 3, 97)]


def test_pipeline_aggs_over_histogram(spark):
    counts = [5, 3, 8, 2, 6]
    buckets = spark.createDataFrame(
        [(float(i * 10), c) for i, c in enumerate(counts)], "key double, doc_count long"
    )
    out = aggs.moving_avg(
        aggs.derivative(
            aggs.cumulative_sum(buckets, "doc_count", "key"), "doc_count", "key"
        ),
        "doc_count",
        "key",
        window=3,
    ).orderBy("key").collect()
    assert [r["cumulative_sum"] for r in out] == [5, 8, 16, 18, 24]
    assert [r["derivative"] for r in out] == [None, -2, 5, -6, 4]
    assert [r["moving_avg"] for r in out] == [5.0, 4.0, round(16 / 3, 4), round(13 / 3, 4), round(16 / 3, 4)]


def test_range_agg_overlap_and_empty_buckets(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    out = {
        r["key"]: r["doc_count"]
        for r in aggs.range_agg(
            df,
            "v",
            [
                ("low", None, 50.0),
                ("mid", 25.0, 75.0),  # overlaps low AND high
                ("high", 50.0, None),
                ("empty", 1000.0, 2000.0),
            ],
        ).collect()
    }
    # half-open [from, to): overlapping ranges each count their members,
    # empty buckets still come back with 0
    assert out == {"low": 50, "mid": 50, "high": 50, "empty": 0}
    assert sum(out.values()) == 150  # > n rows: overlap is real


def test_filters_agg_counts(spark):
    df = spark.createDataFrame(
        [(i, "err" if i % 3 == 0 else "ok") for i in range(30)], "id int, s string"
    )
    out = {
        r["key"]: r["doc_count"]
        for r in aggs.filters_agg(
            df,
            {
                "errors": F.col("s") == "err",
                "evens": F.col("id") % 2 == 0,
                "none": F.col("id") < 0,
            },
        ).collect()
    }
    assert out == {"errors": 10, "evens": 15, "none": 0}


def test_rare_terms_tail_only(spark):
    rows = [("a",)] * 5 + [("b",)] * 2 + [("c",)] + [("d",)] + [("e",)] * 2
    df = spark.createDataFrame(rows, "k string")
    out = [(r["key"], r["doc_count"]) for r in aggs.rare_terms(df, "k", 2).collect()]
    # count asc then key asc; a(5) excluded
    assert out == [("c", 1), ("d", 1), ("b", 2), ("e", 2)]


def test_significant_terms_jlh_brute_force(spark):
    # 40 docs; "anomaly" appears in 8/10 foreground docs and 2/30
    # background-only docs; "common" everywhere (zero lift, filtered);
    # "rare" once in fg (below min_doc_count)
    rows = []
    for i in range(40):
        fg = i < 10
        toks = ["common", "filler%d" % (i % 7)]
        if fg and i < 8:
            toks.append("anomaly")
        if not fg and i < 12:
            toks.append("anomaly")
        if i == 0:
            toks.append("rare")
        rows.append((i, " ".join(toks), fg))
    df = spark.createDataFrame(rows, "doc_id long, text string, is_fg boolean")
    out = aggs.significant_terms(
        df, "text", F.col("is_fg"), size=5, min_doc_count=3
    ).collect()
    import collections

    fg_n, bg_n = 10.0, 40.0
    cnt_fg: collections.Counter = collections.Counter()
    cnt_bg: collections.Counter = collections.Counter()
    for _, text, fg in rows:
        for t in set(text.split()):
            cnt_bg[t] += 1
            if fg:
                cnt_fg[t] += 1
    want = []
    for t, fgc in cnt_fg.items():
        if fgc < 3:
            continue
        fgp, bgp = fgc / fg_n, cnt_bg[t] / bg_n
        score = round((fgp - bgp) * (fgp / bgp), 4)
        if score > 0:
            want.append((-score, t, fgc, cnt_bg[t]))
    want.sort()
    assert [(r["term"], r["fg_count"], r["bg_count"], r["score"]) for r in out] == [
        (t, fgc, bgc, -s) for s, t, fgc, bgc in want[:5]
    ]
    assert out[0]["term"] == "anomaly"
    terms = {r["term"] for r in out}
    assert "common" not in terms and "rare" not in terms


def test_geotile_grid_counts(spark):
    pts = [(10.0 + 0.001 * i, 20.0) for i in range(10)] + [(-30.0, -60.0)] * 4
    df = spark.createDataFrame(pts, "lat double, lon double")
    out = aggs.geotile_grid(df, "lat", "lon", zoom=4, size=5).collect()
    assert sum(r["doc_count"] for r in out) == 14
    assert out[0]["doc_count"] == 10 and out[0]["key"].startswith("4/")


# ---------------------------------------------------------------------------
# percentile_ranks / weighted_avg / adjacency_matrix (r6 widening)
# ---------------------------------------------------------------------------


def test_percentile_ranks_exact_cdf(spark):
    vals = [1.0, 2.0, 2.0, 5.0, 10.0, 10.0, 10.0, 50.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = {
        r["value"]: r["rank"]
        for r in aggs.percentile_ranks(df, "x", [2.0, 9.99, 10.0, 100.0, 0.5]).collect()
    }
    n = len(vals)
    for v in (2.0, 9.99, 10.0, 100.0, 0.5):
        want = round(100.0 * sum(1 for x in vals if x <= v) / n, 4)
        assert out[v] == want
    assert out[100.0] == 100.0 and out[0.5] == 0.0


def test_percentile_ranks_ignores_nulls(spark):
    df = spark.createDataFrame([(1.0,), (None,), (3.0,)], "x double")
    out = aggs.percentile_ranks(df, "x", [2.0]).collect()[0]
    assert out["rank"] == 50.0  # null row not in the population


def test_weighted_avg_exact(spark):
    rows = [(10, 2), (20, 3), (None, 5), (30, None), (40, 1)]
    df = spark.createDataFrame(rows, "v long, w long")
    out = aggs.weighted_avg(df, "v", "w").collect()[0]
    # only fully-non-null rows participate (ES skips missing values)
    want = (10 * 2 + 20 * 3 + 40 * 1) / (2 + 3 + 1)
    assert out["weighted_avg"] == round(want, 4)
    assert out["weight_sum"] == 6


def test_adjacency_matrix_counts(spark):
    df = spark.createDataFrame(
        [(i, "error" if i % 3 == 0 else "view", float(i)) for i in range(30)],
        "id long, et string, v double",
    )
    out = {
        r["key"]: r["doc_count"]
        for r in aggs.adjacency_matrix(
            df,
            {
                "err": F.col("et") == "error",
                "big": F.col("v") >= 15.0,
                "none": F.col("v") < 0.0,
            },
        ).collect()
    }
    errs = {i for i in range(30) if i % 3 == 0}
    bigs = {i for i in range(30) if i >= 15}
    assert out["err"] == len(errs)
    assert out["big"] == len(bigs)
    # intersection key is sorted "a&b"; empty buckets omitted (ES shape)
    assert out["big&err"] == len(errs & bigs)
    assert "none" not in out and "err&none" not in out and "big&none" not in out
    assert list(out) == sorted(out)


# ---------------------------------------------------------------------------
# bucket pipeline ops (bucket_script / bucket_selector / bucket_sort)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bucket_frame(spark):
    rows = [("a", 10, 100.0), ("b", 40, 80.0), ("c", 20, 300.0), ("d", 5, 50.0)]
    return spark.createDataFrame(rows, "key string, doc_count long, total double")


def test_bucket_script(spark, bucket_frame):
    out = {
        r["key"]: r["avg_v"]
        for r in aggs.bucket_script(
            bucket_frame, "avg_v", F.col("total") / F.col("doc_count")
        ).collect()
    }
    assert out == {"a": 10.0, "b": 2.0, "c": 15.0, "d": 10.0}


def test_bucket_selector(spark, bucket_frame):
    out = aggs.bucket_selector(bucket_frame, F.col("doc_count") >= 10).collect()
    assert sorted(r["key"] for r in out) == ["a", "b", "c"]


def test_bucket_sort_topn_and_page(spark, bucket_frame):
    out = aggs.bucket_sort(bucket_frame, [("total", "desc")], size=2).collect()
    assert [r["key"] for r in out] == ["c", "a"]
    # from_ pagination (row_number path)
    out = aggs.bucket_sort(bucket_frame, [("total", "desc")], size=2, from_=1).collect()
    assert [r["key"] for r in out] == ["a", "b"]
    out = aggs.bucket_sort(
        bucket_frame, [("doc_count", "asc")], size=None, from_=2
    ).collect()
    assert [r["key"] for r in out] == ["c", "b"]


# ---------------------------------------------------------------------------
# matrix_stats / auto_date_histogram
# ---------------------------------------------------------------------------


def test_matrix_stats_brute_force(spark):
    import statistics as st

    rows = [(i, (i * 7) % 23, (i * i) % 31) for i in range(40)]
    rows += [(None, 1, 1), (1, None, 1)]  # dropped: missing a field
    df = spark.createDataFrame(rows, "x long, y long, z long")
    out = {
        (r["field_x"], r["field_y"]): r
        for r in aggs.matrix_stats(df, ["x", "y", "z"]).collect()
    }
    xs = [r for r in rows if None not in r]
    cols = {"x": [r[0] for r in xs], "y": [r[1] for r in xs], "z": [r[2] for r in xs]}
    assert len(out) == 6  # 3 diagonal + 3 pairs
    for (a, b), r in out.items():
        assert r["count"] == 40
        assert r["mean_x"] == round(st.mean(cols[a]), 4)
        assert r["mean_y"] == round(st.mean(cols[b]), 4)
        cov = st.covariance(cols[a], cols[b])
        assert r["cov"] == pytest.approx(round(cov, 4), abs=2e-4), (a, b)
        if a == b:
            assert r["corr"] == 1.0
        else:
            corr = st.correlation(cols[a], cols[b])
            assert r["corr"] == pytest.approx(round(corr, 4), abs=2e-4), (a, b)


def test_matrix_stats_validates(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError):
        aggs.matrix_stats(df, ["x"])


def test_integral_contract_enforced(spark):
    # ADVICE r6: a fractional DOUBLE silently truncated by the
    # decimal(38,0) cast must raise instead
    df = spark.createDataFrame([(1.5, 2), (2.5, 3)], "v double, w long")
    with pytest.raises(TypeError):
        aggs.weighted_avg(df, "v", "w")
    with pytest.raises(TypeError):
        aggs.matrix_stats(df, ["v", "w"])
    # integral stays fine
    ok = spark.createDataFrame([(1, 2), (2, 3)], "v long, w long")
    assert aggs.weighted_avg(ok, "v", "w").collect()[0]["weighted_avg"] is not None


def test_matrix_stats_degenerate_nulls(spark):
    # n=1 -> cov/corr NULL (not Inf/NaN)
    one = spark.createDataFrame([(1, 2)], "x long, y long")
    r = aggs.matrix_stats(one, ["x", "y"]).collect()
    assert all(row["cov"] is None and row["corr"] is None for row in r)
    # zero-variance column -> off-diagonal corr NULL, cov defined
    zv = spark.createDataFrame([(1, 1), (1, 2), (1, 3)], "x long, y long")
    rows = {(row["field_x"], row["field_y"]): row
            for row in aggs.matrix_stats(zv, ["x", "y"]).collect()}
    assert rows[("x", "y")]["corr"] is None
    assert rows[("x", "y")]["cov"] == 0.0
    assert rows[("y", "y")]["corr"] == 1.0


def test_auto_date_histogram_ladder_and_counts(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [(base + dt.timedelta(minutes=i),) for i in range(0, 300, 7)]
    df = spark.createDataFrame(rows, "ts timestamp")
    out = aggs.auto_date_histogram(df, "ts", buckets=6).collect()
    assert out, "no buckets"
    interval = out[0]["interval_ms"]
    # ~5h span / 6 buckets -> the 1h rung (3h gives 2-3, 30m gives 11)
    assert interval == 3_600_000
    assert len(out) <= 6
    # keys are UTC-aligned interval multiples and counts conserve rows
    assert all(r["key_ms"] % interval == 0 for r in out)
    assert sum(r["doc_count"] for r in out) == len(rows)
    # brute-force bucket equality
    from collections import Counter

    want = Counter(
        (int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1000) // interval)
        * interval
        for (t,) in rows
    )
    assert {r["key_ms"]: r["doc_count"] for r in out} == dict(want)


def test_auto_date_histogram_single_and_empty(spark):
    import datetime as dt

    one = spark.createDataFrame([(dt.datetime(2024, 3, 5, 12, 0, 1),)], "ts timestamp")
    out = aggs.auto_date_histogram(one, "ts", buckets=3).collect()
    assert len(out) == 1 and out[0]["doc_count"] == 1
    assert out[0]["interval_ms"] == aggs.AUTO_DH_LADDER_MS[0]  # smallest rung
    empty = spark.createDataFrame([], "ts timestamp")
    assert aggs.auto_date_histogram(empty, "ts", buckets=3).count() == 0
    with pytest.raises(ValueError):
        aggs.auto_date_histogram(one, "ts", buckets=0)
