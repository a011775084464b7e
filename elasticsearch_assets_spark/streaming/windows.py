"""Persistent-mode streaming semantics (SURVEY.md D8/D9/D6).

The reference's persistent reader processes tumbling windows at a fixed
latency behind wall clock: window = [now − delay − interval,
now − delay) (date-helpers.ts:267-285), with a lock-step barrier across
slicers (WindowState.ts) and hole tracking for gaps.

Spark-native:
- batch-incremental: `delayed_window_bounds` is the same pure function
  of `now`; `covered_windows` enumerates all complete windows; a window
  manifest + `window_holes` anti-join gives the reference's hole
  recovery (D6).
- Structured Streaming: `stream_delayed_windows` = readStream →
  withWatermark(delay) → window(interval) agg → append sink. The
  watermark is exactly the reference's `delay` (late data excluded by
  design, same contract), and the micro-batch is the D9 barrier.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def delayed_window_bounds(
    now: datetime, delay: timedelta, interval: timedelta
) -> tuple[datetime, datetime]:
    """D8 delayedStreamSegment: the newest COMPLETE window at fixed
    latency `delay` behind `now`, aligned to interval boundaries from
    the epoch (alignment makes windows stable across calls)."""
    watermark = now - delay
    iv = interval.total_seconds()
    end_s = (int(watermark.timestamp()) // int(iv)) * int(iv)
    end = datetime.utcfromtimestamp(end_s)
    return end - interval, end


def covered_windows(
    start: datetime, watermark: datetime, interval: timedelta
) -> list[tuple[datetime, datetime]]:
    """All complete windows in [start, watermark)."""
    out = []
    cur = start
    while cur + interval <= watermark:
        out.append((cur, cur + interval))
        cur += interval
    return out


def window_holes(
    processed: list[tuple[datetime, datetime]],
    start: datetime,
    watermark: datetime,
    interval: timedelta,
) -> list[tuple[datetime, datetime]]:
    """D6 hole tracking: complete windows not yet processed. The
    reference stores holes explicitly; here they're the anti-set of the
    processed-window manifest."""
    done = set(processed)
    return [w for w in covered_windows(start, watermark, interval) if w not in done]


def window_scan(df: DataFrame, date_col: str, window: tuple[datetime, datetime]) -> DataFrame:
    """Fetch one window: start-inclusive, end-exclusive (Q3 contract)."""
    s, e = window
    return df.where((F.col(date_col) >= F.lit(s)) & (F.col(date_col) < F.lit(e)))


def stream_delayed_windows(
    spark: SparkSession,
    input_path: str,
    schema,
    date_col: str,
    delay: str = "30 seconds",
    interval: str = "10 seconds",
    agg_exprs: list | None = None,
):
    """Structured Streaming variant: file-source stream → watermark
    (the reference's delay) → tumbling-window aggregation.

    Returns the streaming DataFrame; caller attaches writeStream (tests
    use format("memory") + trigger(availableNow=True)).
    """
    stream = spark.readStream.schema(schema).parquet(input_path)
    aggs = agg_exprs or [F.count("*").alias("count")]
    out = (
        stream.withWatermark(date_col, delay)
        .groupBy(F.window(F.col(date_col), interval).alias("win"))
        .agg(*aggs)
    )
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *[c for c in out.columns if c != "win"],
    )


class WindowState:
    """D9 multi-slicer window barrier, behavior-identical to the
    reference's WindowState (WindowState.ts:11-55): every slicer checks
    in when it finishes window W; `checkin(id)` returns True only once
    all slicers have completed the window, releasing that slicer into
    W+1. In Spark a micro-batch is this barrier implicitly; this class
    exists for parity with the reference's persistent-mode coordination
    (and drives multi-reader loops outside Structured Streaming).
    """

    def __init__(self, num_slicers: int):
        self._state = {
            i: {"has_called": False, "can_restart": False}
            for i in range(num_slicers)
        }

    def checkin(self, slicer_id: int) -> bool:
        meta = self._state.get(slicer_id)
        if meta is None:
            raise KeyError(f"Window metadata for id {slicer_id} is not defined")
        out = False
        meta["has_called"] = True
        if all(m["has_called"] for m in self._state.values()):
            for m in self._state.values():
                m["can_restart"] = True
                m["has_called"] = False
        if meta["can_restart"]:
            meta["can_restart"] = False
            meta["has_called"] = True
            out = True
        return out
