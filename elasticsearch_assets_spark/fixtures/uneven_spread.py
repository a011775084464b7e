"""The reference's "uneven spread" fixture (UnevenDateData),
reconstructed from the expansion-test goldens
(test/elasticsearch_reader/slicer-spec.ts:639-1090).

Shape derived from the three golden walks (size=100/end=16:00:00,
size=100/end=15:52:48, size=50/no end):

- 300 docs spanning 2020-08-12T15:41:01.xxx .. 16:05:00.xxx
- per-minute-window counts [HH:MM:01, HH:MM+1:01):
  13,13,5,18,9,10,6,10,9,7 for minutes 41-50
- a 3-minute gap (the expansion trigger), then 4 docs in
  [15:54:01, 15:55:01)
- 20,16,23,18 for minutes 55-58, then 19 docs in [15:59:01, 16:00:00)
  (NOTHING at 16:00:00 — the two tests' differing last slices pin this)
- a ~5-minute gap, then the "big slice": 100 docs packed at 16:05:00
  (> size, forces the diff<=0 oversized emit at the limit)

CRITICAL reconstruction detail: the golden boundaries (16:04:30 /
16:04:52 / 16:04:58 / 16:04:59 and the oversized final emit) only
reproduce if the range START carries a SUB-SECOND fraction: the
reference truncates the max date to seconds when building the limit
(getIndexDate formats with dateFormatSeconds) but uses the raw min date
as the start, while count queries truncate both bounds to seconds
(getCount formats with dateFormat). Every split therefore measures a
span of (whole seconds - fraction), and floor(span/2) lands one second
LOWER than fraction-free arithmetic would. Any fraction in (0, 1s)
satisfies all the goldens; this fixture uses .250.
"""

from __future__ import annotations

# epoch ms of 2020-08-12T15:41:01.000Z
BASE_MS = 1_597_246_861_000
MIN_FRACTION_MS = 250  # sub-second offset of the first (min) doc

# (offset from BASE_MS of the minute-window start, count) — windows are
# [xx:01, xx+1:01) like the golden slices
_MINUTE_COUNTS = [
    (0, 13), (60_000, 13), (120_000, 5), (180_000, 18), (240_000, 9),
    (300_000, 10), (360_000, 6), (420_000, 10), (480_000, 9), (540_000, 7),
    # minutes 51-53 empty (expansion), 4 docs in [15:54:01, 15:55:01)
    (780_000, 4),
    (840_000, 20), (900_000, 16), (960_000, 23), (1_020_000, 18),
]
# 19 docs in [15:59:01, 16:00:00) — NOT touching second 16:00:00
_LAST_EVEN_WINDOW = (1_080_000, 19, 59_000)
# the big slice: 100 docs at EXACTLY 16:05:00.000 (= BASE + 23:59) —
# the ms-resolution smallest-factor golden emits
# [16:04:00, 16:05:00.001):100, so every doc shares the same millisecond
_BIG_SLICE = (1_439_000, 100)
# uuid first hex chars of the big-slice docs — the subslice-by-key
# golden (slicer-spec.ts:1136-1234): per-prefix counts within the slice
_BIG_UUID_PREFIX_COUNTS = {
    "0": 9, "1": 5, "2": 4, "3": 8, "4": 9, "5": 6, "6": 7, "7": 9,
    "8": 7, "9": 5, "a": 6, "b": 6, "c": 2, "d": 7, "e": 4, "f": 6,
}
assert sum(_BIG_UUID_PREFIX_COUNTS.values()) == 100


def uneven_rows() -> list[tuple[int, str]]:
    """All 300 docs as (created epoch ms, uuid), ascending by created."""
    import hashlib

    def mk_uuid(prefix: str, i: int) -> str:
        h = hashlib.md5(f"uneven:{prefix}:{i}".encode()).hexdigest()
        raw = (prefix + h)[:32]
        return f"{raw[:8]}-{raw[8:12]}-{raw[12:16]}-{raw[16:20]}-{raw[20:32]}"

    out: list[tuple[int, str]] = []
    k = 0
    for w_start, n in _MINUTE_COUNTS:
        for j in range(n):
            if w_start == 0 and j == 0:
                ts = BASE_MS + MIN_FRACTION_MS  # the min doc
            else:
                # spread over seconds 2..58 of the window, +500ms
                sec = 2 + (j * 57) // max(n, 1)
                ts = BASE_MS + w_start + sec * 1000 + 500
            out.append((ts, mk_uuid("%x" % (k % 16), k)))
            k += 1
    w_start, n, width = _LAST_EVEN_WINDOW
    for j in range(n):
        sec = 1 + (j * (width // 1000 - 2)) // max(n, 1)
        out.append((BASE_MS + w_start + sec * 1000 + 500, mk_uuid("%x" % (k % 16), k)))
        k += 1
    big_start, _ = _BIG_SLICE
    for pref, n in _BIG_UUID_PREFIX_COUNTS.items():
        for i in range(n):
            out.append((BASE_MS + big_start, mk_uuid(pref, 10_000 + i)))
    out.sort(key=lambda r: r[0])
    assert len(out) == 300
    return out


def created_ms_list() -> list[int]:
    """All 300 doc timestamps (epoch ms), ascending."""
    return [ts for ts, _ in uneven_rows()]


def second_truncated_count_fn():
    """count(start_ms, end_ms) that truncates BOTH bounds to whole
    seconds first — getCount formats with dateFormatSeconds at 's'
    resolution, so the reference's ES count query sees truncated
    boundaries even though the walk's moments keep milliseconds."""
    import numpy as np

    ts = np.array(created_ms_list(), dtype=np.int64)

    def count(start_ms: int, end_ms: int) -> int:
        a = (start_ms // 1000) * 1000
        b = (end_ms // 1000) * 1000
        return int(np.searchsorted(ts, b) - np.searchsorted(ts, a))

    return count
