"""D7 starting-point goldens: mirrors every case of the reference's
test/unit/starting_point-spec.ts:12-554 (determineDateSlicerRanges) in
integer ms — same-count recovery with all hole topologies, plus N→M
slicer redistribution. All times relative: LIMIT is an arbitrary epoch
anchor, MIN = 60_000 ms, SEC = 1_000 ms.
"""

from __future__ import annotations

from elasticsearch_assets_spark.operators.date_slicer import (
    determine_date_slicer_ranges,
    divide_range_ms,
    redistribute_dates,
)

SEC = 1_000
MIN = 60_000
LIMIT = 1_556_290_823_000  # any anchor; spec uses "now"


# --- same slicer counts -------------------------------------------------------
def test_no_recovery_single_slicer():
    start = LIMIT - 2 * MIN
    [d] = determine_date_slicer_ranges(start, LIMIT, 1, MIN)
    assert d == {"start": start, "end": start + MIN, "limit": LIMIT, "holes": []}


def test_no_recovery_two_slicers():
    start = LIMIT - 2 * MIN
    mid = start + MIN
    d1, d2 = determine_date_slicer_ranges(start, LIMIT, 2, MIN)
    assert d1 == {"start": start, "end": mid, "limit": mid, "holes": []}
    assert d2 == {"start": mid, "end": LIMIT, "limit": LIMIT, "holes": []}


def _recovery(start, end, limit, holes=()):
    return {"start": start, "end": end, "limit": limit, "holes": list(holes)}


def test_recovery_no_holes_single_slicer():
    start = LIMIT - 2 * MIN
    r_start = start + MIN - 30 * SEC
    r_end = r_start + MIN
    [d] = determine_date_slicer_ranges(
        start, LIMIT, 1, MIN, [_recovery(r_start, r_end, LIMIT)]
    )
    # resumes at recovered end; end clamps to limit (interval overshoots)
    assert d == {"start": r_end, "end": LIMIT, "limit": LIMIT, "holes": []}


def test_recovery_hole_in_middle():
    start = LIMIT - 2 * MIN
    r_start = start + MIN - 30 * SEC
    r_end = r_start + MIN
    hole = (r_end + 10 * SEC, r_end + 20 * SEC)
    [d] = determine_date_slicer_ranges(
        start, LIMIT, 1, MIN, [_recovery(r_start, r_end, LIMIT, [hole])]
    )
    # end stops AT the hole start; hole kept for the onward walk
    assert d == {"start": r_end, "end": hole[0], "limit": LIMIT, "holes": [hole]}


def test_recovery_hole_at_start():
    start = LIMIT - 2 * MIN
    r_start = start + MIN - 30 * SEC
    r_end = r_start + MIN
    hole = (r_end, r_end + 10 * SEC)
    [d] = determine_date_slicer_ranges(
        start, LIMIT, 1, MIN, [_recovery(r_start, r_end, LIMIT, [hole])]
    )
    # start jumps the hole; hole consumed
    assert d == {"start": hole[1], "end": LIMIT, "limit": LIMIT, "holes": []}


def test_recovery_hole_at_limit_overflows():
    start = LIMIT - 2 * MIN
    r_start = start + MIN - 30 * SEC
    r_end = r_start + MIN
    hole = (r_end + 10 * SEC, r_end + 10 * SEC + 5 * MIN)  # beyond limit
    [d] = determine_date_slicer_ranges(
        start, LIMIT, 1, MIN, [_recovery(r_start, r_end, LIMIT, [hole])]
    )
    # limit clamps to the hole start; hole kept for boundary increase
    assert d == {"start": r_end, "end": hole[0], "limit": hole[0], "holes": [hole]}


def test_recovery_hole_at_limit_exact_match():
    start = LIMIT - 2 * MIN
    r_start = start + MIN - 30 * SEC
    r_end = r_start + MIN
    hole = (r_end + 10 * SEC, LIMIT)
    [d] = determine_date_slicer_ranges(
        start, LIMIT, 1, MIN, [_recovery(r_start, r_end, LIMIT, [hole])]
    )
    # hole is encapsulated by the limit → tossed
    assert d == {"start": r_end, "end": hole[0], "limit": hole[0], "holes": []}


def test_recovery_hole_covers_rest_of_range():
    start = LIMIT - 2 * MIN
    r_start = start + MIN - 30 * SEC
    r_end = r_start + MIN
    hole = (r_end, LIMIT)
    [d] = determine_date_slicer_ranges(
        start, LIMIT, 1, MIN, [_recovery(r_start, r_end, LIMIT, [hole])]
    )
    assert d == {"start": r_end, "end": hole[0], "limit": hole[0], "holes": []}


def test_recovery_hole_covers_all_allotted_range():
    start = LIMIT - 2 * MIN
    r_start = start + MIN - 30 * SEC
    r_end = r_start + MIN
    hole = (r_end, LIMIT + MIN)  # starts at resume point, beyond limit
    [d] = determine_date_slicer_ranges(
        start, LIMIT, 1, MIN, [_recovery(r_start, r_end, LIMIT, [hole])]
    )
    # nothing processable: collapse to the hole start, keep the hole
    assert d == {
        "start": hole[0], "end": hole[0], "limit": hole[0], "holes": [hole]
    }


def test_recovery_two_points_two_slicers():
    start = LIMIT - 2 * MIN
    mid = start + MIN
    r1 = _recovery(mid - 30 * SEC, mid - 15 * SEC, mid)
    r2 = _recovery(mid + 30 * SEC, mid + 45 * SEC, LIMIT)
    d1, d2 = determine_date_slicer_ranges(start, LIMIT, 2, MIN, [r1, r2])
    assert d1 == {"start": r1["end"], "end": mid, "limit": mid, "holes": []}
    assert d2 == {"start": r2["end"], "end": LIMIT, "limit": LIMIT, "holes": []}


# --- different slicer counts (N→M redistribution) -----------------------------
def test_expand_1_to_2_slicers_no_holes():
    start = LIMIT - 2 * MIN
    r_start = start + MIN - 30 * SEC
    r_end = r_start + MIN
    expected = divide_range_ms(r_end, LIMIT, 2)
    d1, d2 = determine_date_slicer_ranges(
        start, LIMIT, 2, MIN, [_recovery(r_start, r_end, LIMIT)]
    )
    assert (d1["start"], d1["end"], d1["limit"]) == (
        r_end, expected[0][1], expected[0][1]
    )
    assert (d2["start"], d2["end"], d2["limit"]) == (
        expected[1][0], LIMIT, LIMIT
    )


def test_expand_1_to_2_slicers_hole_covers_everything():
    interval = 2 * MIN
    start = LIMIT - 6 * MIN
    step = start + interval
    r_start = step - 40 * SEC
    r_end = step - 20 * SEC
    hole = (r_end, LIMIT)
    d1, d2 = determine_date_slicer_ranges(
        start, LIMIT, 2, interval, [_recovery(r_start, r_end, LIMIT, [hole])]
    )
    # both slicers collapse straight to the hole start (nothing left)
    assert (d1["start"], d1["end"], d1["limit"]) == (hole[0],) * 3
    assert (d2["start"], d2["end"], d2["limit"]) == (hole[0],) * 3
    assert d2["holes"] == []


def test_compact_4_to_2_slicers_records_gap_holes():
    # compaction: consecutive old remainder ranges merge; the gaps
    # BETWEEN them become holes (date-helpers.ts:163-208)
    base = LIMIT - 10 * MIN
    rs = [
        _recovery(base + i * 2 * MIN, base + i * 2 * MIN + 30 * SEC,
                  base + (i + 1) * 2 * MIN)
        for i in range(4)
    ]
    nd0 = redistribute_dates(rs, 2, 0)
    nd1 = redistribute_dates(rs, 2, 1)
    assert nd0["start"] == rs[0]["end"] and nd0["limit"] == rs[1]["limit"]
    assert nd0["holes"] == [(rs[0]["limit"], rs[1]["end"])]
    assert nd1["start"] == rs[2]["end"] and nd1["limit"] == rs[3]["limit"]
    assert nd1["holes"] == [(rs[2]["limit"], rs[3]["end"])]


def test_slicer_plan_skips_holes_end_to_end():
    # feed a holey resume range through the count-driven walk: no slice
    # may overlap the hole
    import numpy as np

    ts = np.arange(0, 1000, 1)  # one doc per ms over [0, 1000)

    def cf(a, b):
        return int(np.searchsorted(ts, b) - np.searchsorted(ts, a))

    from elasticsearch_assets_spark.operators.date_slicer import date_slicer_plan

    hole = (300, 500)
    plan = date_slicer_plan(cf, 0, 1000, 250, 10 ** 6, holes=[hole])
    spans = [(p.start_ms, p.end_ms) for p in plan]
    for s, e in spans:
        assert not (s < hole[1] and hole[0] < e), (spans, hole)
    covered = sum(e - s for s, e in spans)
    assert covered == 1000 - (hole[1] - hole[0])
