"""Parity-mode date slicer (SURVEY.md D4): the reference's count-driven
bisection/expansion walk, re-implemented from its observable behavior.

The declarative engine replaces this with repartitionByRange + AQE
(operators/reader.py); this module exists for PLAN parity — it produces
the same {start, end, limit, count} slice sequences as
`algorithms/dateSlicer.ts:40-410`, verified against the scripted-count
golden scenarios in the reference's unit spec
(packages/elasticsearch-asset-apis/test/unit/date_slicer_fn-spec.ts).

Semantics (once mode):
- count(start, end) > size  → bisect: end = start + floor(span·ratio),
  ratio = 0.5 (or size/count with recurse_optimization); stop
  splitting at one resolution unit (diff ≤ 0 → emit oversized slice)
- count == 0                → expand end by one interval; reaching the
  limit makes it a "limit query" (one final count, no more expansion);
  an expanded slice that then over-counts re-splits from the PREVIOUS
  end, and the emitted slice keeps the original start
- emitted slice advances start; next end = start + interval clamped to
  limit (adjustDates), skipping recorded holes

All arithmetic in integer ms; `resolution` ('ms'|'s') quantizes splits
exactly like the reference's splitTime (date-helpers.ts:470-490).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class DateSlice:
    start_ms: int
    end_ms: int
    limit_ms: int
    count: int


def split_time_ms(
    start: int, end: int, limit: int, resolution: str, ratio: float
) -> int:
    """date-helpers.ts:470-490: floor((end−start)·ratio) clamped to the
    limit, quantized to the resolution."""
    diff = int((end - start) * ratio)
    if start + diff > limit:
        diff = limit - start
    if resolution == "ms":
        return diff
    return (diff // 1000) * 1000


def _unit_ms(resolution: str) -> int:
    return 1 if resolution == "ms" else 1000


def determine_slice(
    count_fn,
    start: int,
    end: int,
    limit: int,
    size: int,
    interval_ms: int,
    resolution: str = "ms",
    recurse_optimization: bool = False,
    holes: list[tuple[int, int]] | None = None,
    once: bool = True,
    _prev_end: int | None = None,
    _expanded: bool = False,
    _limit_query: bool = False,
) -> tuple[int, int, int]:
    """dateSlicer.ts:86-201 determineSlice → (start, end, count)."""
    holes = holes or []
    count = count_fn(start, end)

    if count > size:
        ratio = (size / count) if recurse_optimization else 0.5
        if _expanded:
            new_start = _prev_end
            diff = split_time_ms(new_start, end, limit, resolution, ratio)
            # cycle breaker (engine fix): the reference's expanded branch
            # lacks the `diff <= 0` guard its non-expanded branch has
            # (dateSlicer.ts:148-151). Its zero-width split (newEnd ==
            # newStart) usually terminates — count 0 → range expansion
            # marches on — and that observable walk is golden-pinned
            # (test_expansion_with_large_slices boundary 1437→1438). But
            # when the expansion step itself re-splits to zero width the
            # state recurs exactly: zero-width [x,x) → expand to
            # [x, x+interval) → diff 0 → [x,x) → … (an empty slice
            # followed by an over-`size` burst within one interval of
            # one resolution unit hangs the reference forever). The
            # recurring state is precisely `new_start == start` with
            # diff <= 0 — emit the oversized slice there and only there.
            if diff <= 0 and new_start == start:
                return (start, end, count)
            new_end = new_start + diff
            s2, e2, c2 = determine_slice(
                count_fn, new_start, new_end, limit, size, interval_ms,
                resolution, recurse_optimization, holes, once,
                _limit_query=_limit_query,
            )
            return (start, e2, c2)
        diff = split_time_ms(start, end, limit, resolution, ratio)
        new_end = start + diff
        if diff <= 0:
            return (start, end, count)
        return determine_slice(
            count_fn, start, new_end, limit, size, interval_ms,
            resolution, recurse_optimization, holes, once,
            _limit_query=_limit_query,
        )

    if once and not _limit_query and count == 0:
        prev_end = end
        new_end = end + interval_ms
        make_limit = False
        if new_end >= limit:
            make_limit = True
            new_end = limit
        elif holes and new_end >= holes[0][0]:
            make_limit = True
            new_end = holes[0][0]
        return determine_slice(
            count_fn, start, new_end, limit, size, interval_ms,
            resolution, recurse_optimization, holes, once,
            _prev_end=prev_end, _expanded=True, _limit_query=make_limit,
        )

    return (start, end, count)


def date_slicer_plan(
    count_fn,
    start: int,
    limit: int,
    interval_ms: int,
    size: int,
    resolution: str = "ms",
    recurse_optimization: bool = False,
    holes: list[tuple[int, int]] | None = None,
) -> list[DateSlice]:
    """The full once-mode slice walk (dateSlicer.ts:355-403 + adjustDates
    :308-335). count_fn(start_ms, end_ms) → docs in [start, end)."""
    holes = list(holes or [])
    out: list[DateSlice] = []
    cur = start
    end = min(cur + interval_ms, limit)

    def adjust(cur: int) -> tuple[int, int]:
        if holes and cur >= holes[0][0]:
            hole = holes.pop(0)
            cur = min(hole[1], limit)
        e = cur + interval_ms
        if e >= limit:
            e = limit
        elif holes and e >= holes[0][0]:
            e = holes[0][0]
        return cur, e

    while cur < limit:
        s, e, c = determine_slice(
            count_fn, cur, end, limit, size, interval_ms,
            resolution, recurse_optimization, holes,
        )
        out.append(DateSlice(s, e, limit, c))
        cur = e
        cur, end = adjust(cur)
    return out


def date_slicer_plan_with_subslices(
    count_fn,
    key_count_fn,
    start: int,
    limit: int,
    interval_ms: int,
    size: int,
    subslice_key_threshold: int = 50_000,
    key_type: str = "hexadecimal",
    resolution: str = "ms",
) -> list[dict]:
    """D5 hybrid slicing (dateSlicer.ts:203-256,381-394): a date slice
    whose count still reaches `subslice_key_threshold` (even at minimal
    width — the condensed-spread case, 2000 docs in 2 ms) is split by
    id-prefix WITHIN the date range.

    key_count_fn(prefix, start_ms, end_ms) → count of docs with the key
    prefix inside the date range. Returns dicts {start, end, keys,
    count} — keys empty for plain date slices.
    """
    from elasticsearch_assets_spark.operators.id_slicer import id_slicer_plan

    out: list[dict] = []
    for sl in date_slicer_plan(
        count_fn, start, limit, interval_ms, size, resolution=resolution
    ):
        if sl.count >= subslice_key_threshold:
            sub = id_slicer_plan(
                lambda p: key_count_fn(p, sl.start_ms, sl.end_ms),
                key_type=key_type,
                size=size,
            )
            for prefix, c in sub:
                out.append(
                    {
                        "start": sl.start_ms,
                        "end": sl.end_ms,
                        "keys": [prefix],
                        "count": c,
                    }
                )
        else:
            out.append(
                {"start": sl.start_ms, "end": sl.end_ms, "keys": [], "count": sl.count}
            )
    return out


# ---------------------------------------------------------------------------
# D7 recovery redistribution + starting points
# (algorithms/date-helpers.ts:147-240 redistributeDates,
#  :287-388 compareRangeToRecoveryData, :400-468 determineDateSlicerRange)
# ---------------------------------------------------------------------------


def divide_range_ms(start_ms: int, limit_ms: int, n: int) -> list[tuple[int, int]]:
    """date-helpers.ts:242-264 divideRange: float step added CUMULATIVELY
    to a single mutating moment (`step.add(range,'ms')`), and moment's
    underlying JS Date truncates fractional ms at EVERY add (TimeClip).
    So each boundary advances by trunc(cur + rng) from the PREVIOUS
    truncated boundary — the accumulated fraction is dropped each step,
    not carried (e.g. 0..8 over 5 slicers → boundaries 1,2,3,4, last
    pinned to 8; NOT 1,3,4,6). Final limit pinned exactly."""
    rng = (limit_ms - start_ms) / n
    out = []
    cur = start_ms
    for _ in range(n):
        nxt = int(cur + rng)  # trunc toward zero == JS Date TimeClip
        out.append((cur, nxt))
        cur = nxt
    out[-1] = (out[-1][0], limit_ms)
    return out


def _determine_divisions(n_divisions: int, ending: int) -> list[int]:
    """date-helpers.ts:147-162: deal `ending` units round-robin across
    n_divisions buckets (each starts at 1)."""
    buckets = [1] * n_divisions
    remaining = ending - n_divisions
    i = 0
    while remaining > 0:
        buckets[i] += 1
        i = 0 if i + 1 > n_divisions - 1 else i + 1
        remaining -= 1
    return buckets


def redistribute_dates(
    recovery: list[dict], num_slicers: int, slicer_id: int
) -> dict:
    """N→M slicer redistribution (date-helpers.ts:225-240).

    recovery items: {start, end, limit, holes} in ms (the last slice each
    previous slicer emitted). More slicers → each old remainder range
    [end, limit) is subdivided; fewer → consecutive old ranges compact
    into one, recording the gaps BETWEEN them as holes."""
    if num_slicers > len(recovery):
        buckets = _determine_divisions(len(recovery), num_slicers)
        ranges: list[dict] = []
        for r, n_div in zip(recovery, buckets):
            for s, e in divide_range_ms(r["end"], r["limit"], n_div):
                ranges.append({"start": s, "limit": e})
        return ranges[slicer_id]
    buckets = _determine_divisions(num_slicers, len(recovery))
    pockets: list[list[dict]] = []
    it = iter(recovery)
    for n_take in buckets:
        pockets.append([next(it) for _ in range(n_take)])
    segment = pockets[slicer_id]
    holes: list[tuple[int, int]] = []
    for cur, nxt in zip(segment, segment[1:]):
        holes.append((cur["limit"], nxt["end"]))
        holes.extend(tuple(h) for h in cur.get("holes") or [])
    out = {"start": segment[0]["end"], "limit": segment[-1]["limit"]}
    if holes:
        out["holes"] = holes
    return out


def _hole_affects_range(start: int, limit: int, hole: tuple[int, int]) -> bool:
    """date-helpers.ts:291-302 (isBetween is EXCLUSIVE both ends)."""
    hs, he = hole
    if start < hs < limit or start < he < limit:
        return True
    if hs < limit < he:
        return True
    if hs == start or he == limit:
        return True
    return False


def _compare_range_to_recovery(
    new_dates: dict,
    recovery: list[dict],
    interval_ms: int,
    slicer_id: int,
    num_slicers: int,
) -> dict:
    """date-helpers.ts:309-388 compareRangeToRecoveryData: resume point,
    hole skipping/encapsulation, limit clamping."""
    start = new_dates["start"]
    limit = new_dates["limit"]
    # compaction holes (inter-range gaps) ride along untouched unless the
    # processing below replaces them — Object.assign semantics (:317)
    carried = [tuple(h) for h in new_dates.get("holes") or []]
    holes: list[tuple[int, int]] = []

    if slicer_id < len(recovery) and len(recovery) >= num_slicers:
        # exact match / compaction: resume from recoveryData[id].end
        start = recovery[slicer_id]["end"]
        end = start + interval_ms
        holes.extend(tuple(h) for h in recovery[slicer_id].get("holes") or [])
    else:
        # expansion: ranges already account for ends; holes compared
        # against ALL recovery entries (each covered range is a hole)
        end = start + interval_ms
        temp: list[tuple[int, int]] = []
        for r in recovery:
            temp.append((r["start"], r["end"]))
            temp.extend(tuple(h) for h in r.get("holes") or [])
        holes.extend(h for h in temp if _hole_affects_range(start, limit, h))

    if holes:
        final_hole = holes[-1]
        if limit == final_hole[1]:
            # hole ends exactly at the limit: encapsulated, drop it
            limit = final_hole[0]
            holes.pop()
        elif limit < final_hole[1]:
            # hole overflows the limit: clamp, keep for future boundary
            limit = final_hole[0]
            if start >= limit:
                start = limit
                end = limit
        if holes and start >= holes[0][0]:
            # previous end sat at/inside a hole: jump it
            new_start = holes[0][1]
            if new_start > limit:
                new_start = holes[0][0]
            else:
                holes.pop(0)
            if new_start == limit:
                new_start = holes[0][0]
            start = new_start
        end = start + interval_ms
        if holes and end >= holes[0][0]:
            end = holes[0][0]
        carried = holes

    end = min(end, limit)
    start = min(start, limit)
    return {"start": start, "end": end, "limit": limit, "holes": carried}


def determine_date_slicer_ranges(
    start_ms: int,
    limit_ms: int,
    num_slicers: int,
    interval_ms: int,
    recovery: list[dict] | None = None,
) -> list[dict]:
    """date-helpers.ts:400-468 determineDateSlicerRanges: per-slicer
    {start, end, limit, holes} resume points, handling N→M slicer-count
    changes and recorded holes. Feed each result to date_slicer_plan
    (holes= supported there)."""
    recovery = recovery or []
    out = []
    for sid in range(num_slicers):
        if recovery:
            if num_slicers != len(recovery):
                nd = redistribute_dates(recovery, num_slicers, sid)
            else:
                s, e = divide_range_ms(start_ms, limit_ms, num_slicers)[sid]
                nd = {"start": s, "limit": e}
            out.append(
                _compare_range_to_recovery(
                    nd, recovery, interval_ms, sid, num_slicers
                )
            )
        else:
            s, lim = divide_range_ms(start_ms, limit_ms, num_slicers)[sid]
            end = min(s + interval_ms, lim)
            out.append({"start": s, "end": end, "limit": lim, "holes": []})
    return out


def make_date_slicer_ranges(
    df,
    date_col: str,
    n_slicers: int,
    size: int,
    resolution: str = "ms",
) -> list[dict]:
    """The full slicer-setup pipeline (ElasticsearchReaderAPI.ts:475-563
    makeDateSlicerRanges): min/max probe (D1) → divideRange across N
    slicers (D3) → per-range auto interval (D2). Returns per-slicer
    {start, end, limit, interval_ms, count} ready for date_slicer_plan.
    One Spark aggregation + N cheap counts vs the reference's 2+2N ES
    round trips."""
    from pyspark.sql import functions as F

    from elasticsearch_assets_spark.operators.reader import (
        auto_interval_ms,
        divide_range,
    )

    agg = df.agg(
        F.unix_micros(F.min(date_col).cast("timestamp")).alias("mn"),
        F.unix_micros(F.max(date_col).cast("timestamp")).alias("mx"),
        F.count("*").alias("n"),
    ).collect()[0]
    if agg["n"] == 0:
        return []
    unit = _unit_ms(resolution)
    start = agg["mn"] // 1000
    # +1 resolution unit on max → end-exclusive (ElasticsearchReaderAPI
    # getIndexDate :713-717)
    limit = agg["mx"] // 1000 + unit

    cf = spark_count_fn(df, date_col)
    out = []
    for s, e in divide_range(start, limit, n_slicers):
        cnt = cf(s, e)
        out.append(
            {
                "start": s,
                "end": e,
                "limit": e,
                "interval_ms": auto_interval_ms(s, e, cnt, size),
                "count": cnt,
            }
        )
    return out


PARITY_COLLECT_MAX_ROWS = 10_000_000


def _guard_parity_collect(df, max_rows: int, declarative: str) -> None:
    """These count oracles collect a full column to the driver — parity
    mode ONLY. Refuse beyond max_rows so a stray call at production
    scale fails fast instead of OOMing the driver."""
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"parity count oracle refuses to collect >{max_rows:,} rows "
            f"to the driver; use the declarative path ({declarative}) "
            "for production-scale slicing"
        )


def spark_count_fn(df, date_col: str, max_rows: int = PARITY_COLLECT_MAX_ROWS):
    """Driver-side count oracle for parity runs: collect the timestamp
    multiset once (ms), then every count is a numpy searchsorted — the
    reference pays one ES round trip per count instead. Refuses above
    `max_rows` (reader.date_histogram is the declarative path)."""
    import numpy as np
    from pyspark.sql import functions as F

    _guard_parity_collect(df, max_rows, "reader.date_histogram")
    ts = np.sort(
        np.array(
            [
                r[0]
                for r in df.select(
                    F.unix_micros(F.col(date_col).cast("timestamp"))
                ).collect()
            ],
            dtype=np.int64,
        )
        // 1000
    )

    def count(start_ms: int, end_ms: int) -> int:
        return int(
            np.searchsorted(ts, end_ms, "left") - np.searchsorted(ts, start_ms, "left")
        )

    return count
