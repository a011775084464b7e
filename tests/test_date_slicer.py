"""Date-slicer parity: golden scenarios mirrored from the reference's
unit spec (packages/elasticsearch-asset-apis/test/unit/
date_slicer_fn-spec.ts — MockClient scripted counts) + invariants over
real data."""

from __future__ import annotations

import pytest

from elasticsearch_assets_spark.operators.date_slicer import (
    date_slicer_plan_with_subslices,
    DateSlice,
    date_slicer_plan,
    determine_slice,
    spark_count_fn,
    split_time_ms,
)

MIN = 60_000  # 1 minute in ms


def scripted(seq, default):
    """MockClient analogue: scripted counts then a default forever."""
    it = iter(seq)

    def count(_s, _e):
        try:
            return next(it)
        except StopIteration:
            return default

    return count


# spec: 'with zero count at end of slice it expands' (line ~134)
def test_zero_count_expands_to_limit():
    # interval 5m, end=start+2m, limit=start+5m; counts: 0 forever
    s, e, c = determine_slice(
        scripted([0], 0), 0, 2 * MIN, 5 * MIN, 1000, 5 * MIN, resolution="s"
    )
    assert (s, e, c) == (0, 5 * MIN, 0)  # expanded straight to the limit


# spec: 'with zero count, then to big a count at end of slice' (~165)
def test_zero_then_oversized_resplits_from_prev_end():
    # end=start+2m, limit=start+3m; first count 0, then 2000 forever
    s, e, c = determine_slice(
        scripted([0], 2000), 0, 2 * MIN, 3 * MIN, 1000, 5 * MIN, resolution="s"
    )
    # bisects down from prevEnd (2m) to a single second
    assert (s, e, c) == (0, 2 * MIN + 1000, 2000)


# spec: 'with expanded slice count, then to large a size' (~196)
def test_oversized_bisects_to_resolution_floor():
    s, e, c = determine_slice(
        scripted([], 2000), 0, 2 * MIN, 5 * MIN, 1000, 5 * MIN, resolution="s"
    )
    assert (s, e, c) == (0, 1000, 2000)  # 1-second floor, count kept


# spec: 'with recursive optimization' (~228)
def test_recurse_optimization_ratio():
    size, large, recursive = 1000, 1300, 800
    diff = split_time_ms(0, 2 * MIN, 5 * MIN, "s", size / large)
    s, e, c = determine_slice(
        scripted([large], recursive), 0, 2 * MIN, 5 * MIN, size, 5 * MIN,
        resolution="s", recurse_optimization=True,
    )
    assert (s, e, c) == (0, diff, recursive)


def test_split_time_clamps_to_limit():
    assert split_time_ms(0, 100, 40, "ms", 0.5) == 40
    assert split_time_ms(0, 100, 1000, "ms", 0.5) == 50
    assert split_time_ms(0, 90_000, 500_000, "s", 0.5) == 45_000


def test_plan_partitions_range_and_conserves_counts():
    # synthetic skewed distribution: heavy burst in the middle
    import numpy as np

    rng = np.random.default_rng(7)
    ts = np.concatenate(
        [
            rng.integers(0, 10_000, 500),
            rng.integers(4_000, 4_100, 3_000),  # burst
            rng.integers(10_000, 20_000, 500),
        ]
    )
    ts.sort()

    def count(s, e):
        return int(np.searchsorted(ts, e) - np.searchsorted(ts, s))

    size = 400
    plan = date_slicer_plan(count, 0, 20_000, 2_000, size, resolution="ms")
    # partition: contiguous, covers [0, 20000)
    assert plan[0].start_ms == 0 and plan[-1].end_ms == 20_000
    for a, b in zip(plan, plan[1:]):
        assert a.end_ms == b.start_ms
    # conservation
    assert sum(p.count for p in plan) == len(ts)
    # every slice ≤ size unless already at 1ms width
    for p in plan:
        assert p.count <= size or (p.end_ms - p.start_ms) <= 1


def test_plan_with_holes_skips_processed_ranges():
    def count(s, e):
        return e - s  # 1 doc per ms

    plan = date_slicer_plan(
        count, 0, 1_000, 200, 500, resolution="ms", holes=[(200, 400)]
    )
    covered = [(p.start_ms, p.end_ms) for p in plan]
    # the hole [200,400) is never scanned
    for s, e in covered:
        assert not (s < 400 and e > 200 and s >= 200), covered
    assert sum(p.count for p in plan) == 1_000 - 200


def test_subslice_by_key_condensed():
    """D5: the condensed-spread case — 2000 docs within 2 ms forces
    sub-ms slices to hit the key threshold, then id-prefix sub-slicing
    (reference fixture shape: condensed-spread.ts:4-19)."""
    import hashlib

    import numpy as np

    # 2000 docs all at ts in {5000, 5001}, hex keys
    ts = np.array([5000 + (i % 2) for i in range(2000)])
    keys = [hashlib.md5(str(i).encode()).hexdigest() for i in range(2000)]
    order = np.argsort(ts, kind="stable")
    ts_sorted = ts[order]

    def count(s, e):
        return int(np.searchsorted(ts_sorted, e) - np.searchsorted(ts_sorted, s))

    karr = {}

    def key_count(prefix, s, e):
        sel = [k for k, t in zip(keys, ts) if s <= t < e and k.startswith(prefix)]
        return len(sel)

    plan = date_slicer_plan_with_subslices(
        count, key_count, 0, 10_000, 1_000, size=100,
        subslice_key_threshold=500, key_type="hexadecimal",
    )
    keyed = [p for p in plan if p["keys"]]
    assert keyed, "threshold must trigger key sub-slicing"
    assert sum(p["count"] for p in plan) == 2000
    # key sub-slicing brings every emitted slice under size
    for p in keyed:
        assert 0 < p["count"] <= 100
        assert len(p["keys"]) == 1 and len(p["keys"][0]) >= 1


def test_make_date_slicer_ranges(spark, sf_dir):
    """D1+D2+D3 composed: N slicer ranges partition [min, max+1unit),
    counts conserve, and running each slicer's plan covers its range."""
    from elasticsearch_assets_spark.operators.date_slicer import (
        make_date_slicer_ranges,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    total = ev.count()
    ranges = make_date_slicer_ranges(ev, "ts", n_slicers=3, size=150)
    assert len(ranges) == 3
    assert sum(r["count"] for r in ranges) == total
    for a, b in zip(ranges, ranges[1:]):
        assert a["end"] == b["start"]
    cf = spark_count_fn(ev, "ts")
    # each slicer's own walk conserves its range count
    r0 = ranges[0]
    plan = date_slicer_plan(
        cf, r0["start"], r0["limit"], r0["interval_ms"], 150, resolution="ms"
    )
    assert sum(p.count for p in plan) == r0["count"]


def test_plan_on_events_table(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    total = ev.count()
    cf = spark_count_fn(ev, "ts")
    import datetime

    lo = int(datetime.datetime(2024, 1, 1).timestamp() * 1000)
    hi = int(datetime.datetime(2024, 2, 1).timestamp() * 1000)
    plan = date_slicer_plan(cf, lo, hi, 24 * 3600 * 1000, 200, resolution="ms")
    assert sum(p.count for p in plan) == total
    assert all(
        p.count <= 200 or (p.end_ms - p.start_ms) <= 1 for p in plan
    )


# ---- condensed-spread fixture (the extreme-density case) --------------------
# The reference fixture (test/fixtures/data/condensed-spread.ts:4-19) packs
# 2,000 records into 2 milliseconds: 1,000 at base+1ms and 1,000 at base+2ms
# (base = 2019-04-26T15:00:23.207Z). Goldens from db-tests/condensed-data-
# spec.ts:78-134.
def _condensed_cf():
    import numpy as np

    ts = np.array([1] * 1000 + [2] * 1000, dtype=np.int64) + 207
    return lambda a, b: int(np.searchsorted(ts, b) - np.searchsorted(ts, a))


def test_condensed_auto_interval_floors_to_one_ms():
    # determineSliceInterval: 2000 docs / size 100 over a 2ms range →
    # floor(2/20) = 0 → clamped to [1,'ms'] (:78-96)
    from elasticsearch_assets_spark.operators.reader import auto_interval_ms

    assert auto_interval_ms(208, 210, total=2000, size=100) == 1


def test_condensed_two_oversized_slices():
    # size=100 but slices cannot shrink below 1ms: exactly two slices of
    # 1,000 docs each, then done (:98-134)
    plan = date_slicer_plan(_condensed_cf(), 208, 210, 1, 100, resolution="ms")
    assert [(p.start_ms, p.end_ms, p.count) for p in plan] == [
        (208, 209, 1000), (209, 210, 1000),
    ]


def test_empty_slice_then_oversized_burst_terminates():
    """An EMPTY 1ms slice followed by an over-`size` 1ms burst: the
    reference's expanded branch recurses forever here (dateSlicer.ts
    :113-142 has no `diff <= 0` floor guard, unlike :148-151); the
    engine's resolution clamp emits the oversized expanded slice and
    the walk keeps marching. Conservation + coverage hold."""
    import numpy as np

    counts = [0, 4000] + [0] * 10
    ts = np.repeat(np.arange(len(counts)), counts)

    def cf(a, b):
        return int(np.searchsorted(ts, b) - np.searchsorted(ts, a))

    plan = date_slicer_plan(cf, 0, len(counts), 1, 50, resolution="ms")
    assert plan[0].start_ms == 0 and plan[-1].end_ms == len(counts)
    assert sum(p.count for p in plan) == 4000
    # the burst emits as one oversized slice spanning the expansion
    assert (plan[0].start_ms, plan[0].end_ms, plan[0].count) == (0, 2, 4000)


def test_condensed_subslice_by_key_splits_density():
    # D5: the same density split by key prefix instead of emitting
    # oversized date slices (dateSlicer.ts:203-256)
    from elasticsearch_assets_spark.operators.date_slicer import (
        date_slicer_plan_with_subslices,
    )

    docs = [(208 + (i >= 1000), f"{i % 16:x}") for i in range(2000)]

    def key_count_fn(prefix, a, b):
        return sum(1 for ms, k in docs if a <= ms < b and k.startswith(prefix))

    out = date_slicer_plan_with_subslices(
        _condensed_cf(), key_count_fn, 208, 210, 1, 100,
        subslice_key_threshold=500, key_type="hexadecimal",
    )
    # both 1000-doc ms slices subsplit into 16 key slices of 62-63 docs
    assert len(out) == 32
    assert all(o["keys"] and o["count"] <= 100 for o in out)
    assert sum(o["count"] for o in out) == 2000
