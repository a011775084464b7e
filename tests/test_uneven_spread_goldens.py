"""Uneven-spread expansion goldens: the reference's three expansion
walks (test/elasticsearch_reader/slicer-spec.ts:639-1090) replayed
against the reconstructed fixture, exact slice-for-slice.

Emitted boundaries are compared TRUNCATED to seconds — the reference
formats emitted dates with dateFormatSeconds while the walk's internal
moments keep the start's sub-second fraction (see fixture docstring).
"""

from __future__ import annotations

from elasticsearch_assets_spark.fixtures import uneven_spread as US
from elasticsearch_assets_spark.operators.date_slicer import date_slicer_plan

B = US.BASE_MS - US.BASE_MS % 1000  # == BASE_MS (whole second)
START = US.BASE_MS + US.MIN_FRACTION_MS  # raw min date, fraction kept
CF = US.second_truncated_count_fn()
MIN_MS = 60_000


def _sec(ms: int) -> int:
    """seconds offset from 15:41:01 (display truncation)."""
    return (ms // 1000) - (US.BASE_MS // 1000)


def _walk(limit_ms: int, size: int):
    plan = date_slicer_plan(
        CF, START, limit_ms, MIN_MS, size, resolution="s"
    )
    return [(_sec(p.start_ms), _sec(p.end_ms), p.count) for p in plan]


# per-minute golden counts shared by all three walks
EVEN_MINUTES = [
    (0, 60, 13), (60, 120, 13), (120, 180, 5), (180, 240, 18),
    (240, 300, 9), (300, 360, 10), (360, 420, 6), (420, 480, 10),
    (480, 540, 9), (540, 600, 7),
]


def test_expansion_to_find_data():
    # size=100, end=16:00:00 (:639-787): the 3-empty-minute gap expands
    # into one [15:51:01, 15:55:01):4 slice; last slice clamps to limit
    limit = US.BASE_MS + 19 * MIN_MS - 1000  # 16:00:00.000
    got = _walk(limit, 100)
    assert got == EVEN_MINUTES + [
        (600, 840, 4),
        (840, 900, 20), (900, 960, 16), (960, 1020, 23), (1020, 1080, 18),
        (1080, 1139, 19),
    ]


def test_expansion_with_no_data_left():
    # size=100, end=15:52:48 (:790-907): expansion hits the limit with
    # nothing found → one final zero-count limit slice
    limit = US.BASE_MS + 11 * MIN_MS + 47_000  # 15:52:48.000
    got = _walk(limit, 100)
    assert got == EVEN_MINUTES + [(600, 707, 0)]
    assert got[-1][1] == 707  # 15:52:48


def test_recurse_to_smallest_factor_seconds():
    # size=10, interval 5m, start 16:04:00, end 16:06:00 (:1086-1109):
    # bisect + clamp down to a 1-second floor, then the oversized emit
    start = US.BASE_MS + 1_379_000  # 16:04:00.000 (explicit, whole sec)
    limit = US.BASE_MS + 1_499_000  # 16:06:00.000
    plan = date_slicer_plan(CF, start, limit, 5 * MIN_MS, 10, resolution="s")
    s0 = plan[0]
    assert (_sec(s0.start_ms), _sec(s0.end_ms), s0.count) == (1379, 1440, 100)


def test_recurse_to_smallest_factor_ms():
    # same but ms resolution (:1111-1133): recursion floors at 1 ms and
    # emits [16:04:00, 16:05:00.001):100 — every doc shares the same ms
    import numpy as np

    ts = np.array(US.created_ms_list(), dtype=np.int64)

    def cf_exact(a, b):
        return int(np.searchsorted(ts, b) - np.searchsorted(ts, a))

    start = US.BASE_MS + 1_379_000
    limit = US.BASE_MS + 1_499_000
    plan = date_slicer_plan(cf_exact, start, limit, 5 * MIN_MS, 10, resolution="ms")
    s0 = plan[0]
    assert s0.start_ms == start
    assert s0.end_ms == US.BASE_MS + 1_439_001  # 16:05:00.001
    assert s0.count == 100


def test_subslice_by_key_within_date_slice():
    # size=10, threshold 50, hexadecimal uuid subslice (:1136-1234): the
    # packed second splits into 16 per-prefix slices, hex order
    from elasticsearch_assets_spark.operators.date_slicer import (
        date_slicer_plan_with_subslices,
    )

    rows = US.uneven_rows()
    start = US.BASE_MS + 1_439_000  # 16:05:00.000 (config start)
    limit = US.BASE_MS + 1_440_000  # max+1s = 16:05:01.000

    def key_count_fn(prefix, a, b):
        a = (a // 1000) * 1000
        b = (b // 1000) * 1000
        return sum(1 for ts, u in rows if a <= ts < b and u.startswith(prefix))

    out = date_slicer_plan_with_subslices(
        CF, key_count_fn, start, limit, 5 * MIN_MS, 10,
        subslice_key_threshold=50, key_type="hexadecimal", resolution="s",
    )
    golden = [
        ("0", 9), ("1", 5), ("2", 4), ("3", 8), ("4", 9), ("5", 6),
        ("6", 7), ("7", 9), ("8", 7), ("9", 5), ("a", 6), ("b", 6),
        ("c", 2), ("d", 7), ("e", 4), ("f", 6),
    ]
    assert [(o["keys"][0], o["count"]) for o in out] == golden
    assert all(
        (_sec(o["start"]), _sec(o["end"])) == (1439, 1440) for o in out
    )


def test_recovery_resume_next_slice_even_fixture():
    # 'slicer can enter recovery and return to the last slice state'
    # (:1236-1268): even fixture, size 200, lastSlice [.315,.334):148 →
    # next emitted slice [.334,.372):199
    import numpy as np

    from elasticsearch_assets_spark.fixtures import even_spread as ES
    from elasticsearch_assets_spark.operators.date_slicer import (
        determine_date_slicer_ranges,
    )

    offs = np.array(ES.created_offsets_ms())

    def cf_even(a, b):
        return int(np.searchsorted(offs, b) - np.searchsorted(offs, a))

    [d] = determine_date_slicer_ranges(
        0, 193, 1, 38,
        recovery=[{"start": 114, "end": 133, "limit": 193, "holes": []}],
    )
    assert (d["start"], d["end"], d["limit"]) == (133, 171, 193)
    plan = date_slicer_plan(cf_even, d["start"], d["limit"], 38, 200)
    assert (plan[0].start_ms, plan[0].end_ms, plan[0].count) == (133, 171, 199)


def test_expansion_with_large_slices():
    # size=50, no end (:909-1090): limit = max+1s = 16:05:01; the packed
    # 100-doc second forces repeated clamp/bisect with zero-count emits
    # at fraction-shifted boundaries, then the oversized diff<=0 emit
    limit = US.BASE_MS + 24 * MIN_MS  # 16:05:01.000
    got = _walk(limit, 50)
    assert got == EVEN_MINUTES + [
        (600, 840, 4),
        (840, 900, 20), (900, 960, 16), (960, 1020, 23), (1020, 1080, 18),
        (1080, 1140, 19),
        (1140, 1409, 0),    # [16:00:01, 16:04:30)
        (1409, 1431, 0),    # [16:04:30, 16:04:52)
        (1431, 1437, 0),    # [16:04:52, 16:04:58)
        (1437, 1438, 0),    # [16:04:58, 16:04:59)
        (1438, 1440, 100),  # [16:04:59, 16:05:01) — count > size emitted
    ]
