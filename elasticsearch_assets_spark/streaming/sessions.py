"""Custom stateful streaming operator: gap-based sessionization via
applyInPandasWithState (the Structured Streaming escape hatch for
operators watermark+window can't express — SURVEY.md §1.5 maps the
reference's persistent-mode custom state to exactly this).

Sessions: consecutive events of a user with gaps < `gap_sec` form one
session; state carries the open session across micro-batches and a
processing-time timeout flushes idle sessions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_end", T.TimestampType(), False),
        T.StructField("n_events", T.IntegerType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), True),
        T.StructField("end_us", T.LongType(), True),
        T.StructField("n", T.IntegerType(), True),
    ]
)


def _session_fn(gap_sec: float):
    gap_us = int(gap_sec * 1_000_000)

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                }
            )
            return

        ts = (
            pd.concat([p["ts"] for p in pdfs])
            .sort_values()
            .astype("datetime64[us]")
            .astype("int64")
        )
        cur = state.get if state.exists else None
        closed = []
        for t in ts:
            if cur is None:
                cur = (int(t), int(t), 1)
            elif t - cur[1] < gap_us:
                cur = (cur[0], int(t), cur[2] + 1)
            else:
                closed.append(cur)
                cur = (int(t), int(t), 1)
        if cur is not None:
            state.update(cur)
            state.setTimeoutDuration(int(gap_sec * 1000))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return fn


def drain_closed_sessions(query, timeout_sec: float = 120.0) -> None:
    """Wait until the first data micro-batch commits, then stop.

    With trigger(availableNow) + ProcessingTimeTimeout, Spark does NOT
    terminate after the available data: it loops "no new data but
    cleaning up state" micro-batches until every registered timeout
    fires (observed: ~1 batch/0.6 s indefinitely for long gaps), so
    both awaitTermination and processAllAvailable block for their full
    timeout. The closed sessions are all in the sink once the first
    data batch commits — poll for that, then stop() (which interrupts
    the in-flight cleanup batch; the logged CANNOT_COMMIT from that
    interrupt is benign)."""
    import time as _t

    deadline = _t.time() + timeout_sec
    while _t.time() < deadline:
        if query.lastProgress is not None and not query.status["isDataAvailable"]:
            break
        _t.sleep(0.2)
    query.stop()


def stream_sessions(
    spark: SparkSession,
    input_path: str,
    schema,
    gap_sec: float = 3600.0,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """readStream → stateful sessionize. Caller attaches writeStream
    (tests use memory sink + availableNow). Closed sessions emit as
    they close; the open session flushes on the processing-time timeout."""
    stream = spark.readStream.schema(schema).parquet(input_path)
    events = stream.select(
        F.col(user_col).alias("user_id"), F.col(ts_col).cast("timestamp").alias("ts")
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_sec),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
