"""Hot-bucket capping with OBSERVABLE drops.

Every banded/bucketed pair generator in this engine bounds its
quadratic term by dropping buckets larger than `max_bucket` (a
degenerate bucket of near-identical content at 10^9 rows would
otherwise explode to ~10^15 candidate pairs). A silent drop is
wrong-by-omission at 100 TB — the hottest buckets are exactly the
most-duplicated documents a dedup run exists to find — so the cap is
centralized here with an optional `DropCounter` that reports exactly
what was dropped.

Why NOT `df.observe(Observation, ...)`: measured on this Spark 4
build, a CollectMetrics node placed under an LSH self-join is
unreliable — AQE's empty-relation propagation elides the node entirely
when the downstream result is provably empty (`Observation.get` then
throws on a schema-less row), and even with AQE off the doubly-
referenced subtree can report metrics from the wrong traversal. The
counter instead holds a tiny one-row aggregate DataFrame over the SAME
sized frame the cap filtered; reading it is a second, explicitly
lazy pass (operators that persist their banded frame — e.g.
minhash_lsh_candidates — serve it from cache).

Usage:
    ctr = DropCounter()
    pairs = minhash_lsh_candidates(df, ..., drop_obs=ctr)
    pairs.count()
    stats = ctr.stats()   # {'dropped_rows': .., 'dropped_buckets': ..,
                          #  'largest_dropped_bucket': ..}
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class DropCounter:
    """Deferred drop accounting for one capped query. `stats()` runs a
    small aggregate job on first call (cached afterwards): count of
    dropped rows, number of oversized buckets, and the largest bucket's
    size — the triage numbers for 'did the cap eat my duplicates'."""

    def __init__(self, name: str = "bucket_drops") -> None:
        self.name = name
        self._stats_df: DataFrame | None = None
        self._stats: dict[str, int] | None = None

    def _attach(self, sized: DataFrame, max_bucket: int, size_col: str) -> None:
        dropped = F.col(size_col) > max_bucket
        self._stats_df = sized.agg(
            F.coalesce(
                F.sum(F.when(dropped, F.lit(1)).otherwise(F.lit(0))), F.lit(0)
            ).alias("dropped_rows"),
            F.coalesce(
                # exact distinct-bucket count without a second groupBy:
                # each dropped bucket of size s contributes s * (1/s) = 1
                F.sum(F.when(dropped, F.lit(1.0) / F.col(size_col))), F.lit(0.0)
            ).alias("dropped_buckets"),
            F.coalesce(F.max(F.when(dropped, F.col(size_col))), F.lit(0)).alias(
                "largest_dropped_bucket"
            ),
        )

    def stats(self) -> dict[str, int]:
        if self._stats is None:
            if self._stats_df is None:
                raise ValueError(
                    f"DropCounter {self.name!r} was never attached to a "
                    "capped query (pass it as drop_obs=)"
                )
            row = self._stats_df.collect()[0]
            self._stats = {
                "dropped_rows": int(row["dropped_rows"]),
                "dropped_buckets": int(round(row["dropped_buckets"])),
                "largest_dropped_bucket": int(row["largest_dropped_bucket"]),
            }
        return self._stats


def drop_observation(name: str = "bucket_drops") -> DropCounter:
    """A fresh counter for one capped query."""
    return DropCounter(name)


def cap_buckets(
    df: DataFrame,
    keys: list[str],
    max_bucket: int,
    drop_obs: DropCounter | None = None,
    size_col: str = "_bs",
) -> DataFrame:
    """Drop rows of buckets (groups of `keys`) larger than max_bucket.
    The surviving frame keeps `size_col` (callers drop it or reuse it).
    With drop_obs, the counter is attached to the pre-filter sized
    frame; its stats() runs one tiny aggregate job on demand."""
    sized = df.withColumn(
        size_col, F.count("*").over(Window.partitionBy(*keys))
    )
    if drop_obs is not None:
        drop_obs._attach(sized, max_bucket, size_col)
    return sized.where(F.col(size_col) <= max_bucket)


def drop_stats(obs: DropCounter) -> dict[str, int]:
    """Materialized drop counts for a counter passed to cap_buckets."""
    return obs.stats()
