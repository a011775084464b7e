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


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str,
    seed: str = "strat",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling — the domain-rebalancing op
    (downsample an over-represented source/language to a target mix
    without touching the rest). Keep a row iff its hash bucket falls
    under its stratum's rate; strata absent from ``rates`` use
    ``default_rate`` (0.0 = drop, 1.0 = pass through).

    Same guarantees as hash_sample, per stratum: partition-independent,
    engine-portable, and nested (a stratum's 1% sample is inside its
    10% sample under the same seed) — so a mix can be tightened
    incrementally without reshuffling previous selections. The rate
    table is query-sized: ONE when() chain, zero joins, zero shuffle.
    A NULL stratum uses default_rate (no when() arm matches NULL)."""
    for k, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    thresh = None
    for name in sorted(rates):
        cond = F.col(strata_col) == name
        lim = F.lit(int(round(rates[name] * BUCKETS)))
        thresh = F.when(cond, lim) if thresh is None else thresh.when(cond, lim)
    default_lim = F.lit(int(round(default_rate * BUCKETS)))
    thresh = default_lim if thresh is None else thresh.otherwise(default_lim)
    return df.where(hash_bucket(id_col, seed) < thresh)


def rebalance_rates(
    counts: dict[str, int], target_shares: dict[str, float]
) -> dict[str, float]:
    """Driver-side helper: per-stratum keep-rates that move observed
    ``counts`` to ``target_shares`` by DOWNSAMPLING only (never
    upweights — pure filtering keeps the pipeline deterministic). The
    binding stratum is the one whose observed share falls shortest of
    its target; it keeps rate 1.0 and every other stratum is scaled to
    match: rate_s = (target_s / share_s) / max_t(target_t / share_t).
    Output size = total * share_binding / target_binding (the largest
    corpus achievable at the exact target mix)."""
    total = sum(counts.values())
    if total <= 0:
        raise ValueError("counts must be non-empty and positive")
    missing = set(counts) - set(target_shares)
    if missing:
        raise ValueError(f"no target share for strata: {sorted(missing)}")
    ratios = {}
    for s, n in counts.items():
        if n == 0:
            continue
        share = n / total
        t = target_shares[s]
        if t <= 0:
            ratios[s] = 0.0
        else:
            ratios[s] = t / share
    bind = max(ratios.values())
    return {s: (r / bind if bind > 0 else 0.0) for s, r in ratios.items()}
