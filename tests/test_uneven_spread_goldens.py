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
