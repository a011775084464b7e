"""Deterministic sampling and dataset splitting for training pipelines.

`df.sample()` is partition-dependent (a repartition or a source-file
re-split changes which rows survive) — useless for reproducible
train/val/test assignment at 100 TB. These operators key every decision
on a content hash of the row's id, so the assignment is a pure function
of (id, seed): stable under re-partitioning, re-runs, engine versions,
and incremental re-processing (a doc keeps its split when new data
arrives — the property that keeps eval sets leak-free over time).

Hash = md5 (cross-engine: DuckDB has no xxhash64), first 13 hex chars
(52 bits) mod 1e6 — the same HLL-style hashing protocol used across the
repo. Pure column expressions; the DuckDB mirror is
``('0x' || substr(md5(seed || ':' || id), 1, 13))::BIGINT % 1000000``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BUCKETS = 1_000_000


def hash_bucket(id_col: Column | str, seed: str) -> Column:
    """Uniform bucket in [0, 1e6) from (seed, id) — partition-
    independent and engine-portable."""
    h = F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    return F.pmod(
        F.conv(F.substring(h, 1, 13), 16, 10).cast("long"), F.lit(BUCKETS)
    )


def hash_sample(
    df: DataFrame, id_col: str, rate: float, seed: str = "sample"
) -> DataFrame:
    """Deterministic ``rate`` sample: keep rows whose bucket falls
    below rate*1e6. Nested rates are supersets (a 1% sample is a subset
    of the 10% sample with the same seed) — the property that lets a
    pipeline debug on 0.1% and scale the same selection up."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.where(hash_bucket(id_col, seed) < F.lit(int(round(rate * BUCKETS))))


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split with the given
    weights (must sum to 1). Assignment = cumulative-threshold walk
    over the hash bucket, in ``weights`` insertion order — one when()
    chain, no shuffle, no state."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    b = hash_bucket(id_col, seed)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = b < F.lit(int(round(cum * BUCKETS)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)
