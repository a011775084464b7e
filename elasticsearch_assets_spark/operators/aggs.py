"""ES search-API aggregations, Spark-first.

The reference's readers are one half of every real elasticsearch-assets
job; the other half is the aggregation the user runs over what was read
(the reference itself leans on ES aggs internally: dateSlicer's count
walk is a date_histogram, idSlicer's prefix descent is a terms agg —
ElasticsearchReaderAPI.ts count/minmax probes). This module re-expresses
the core ES aggregation surface as Spark groupBys so a reference user
can move those queries over:

- ``cardinality``  -> deterministic HyperLogLog sketch (ES uses HLL++;
  we implement classic HLL with the linear-counting small-range
  correction, md5-hashed so the estimate is bit-identical across
  Spark / DuckDB / Python — the same cross-engine-determinism protocol
  as the rest of the repo). The register table is MERGEABLE (per-bucket
  max), which is the whole point at 100 TB: a cardinality probe is a
  4096-row shuffle instead of a full-width distinct.
- ``percentiles``   -> exact type-7 interpolation (ES ships t-digest
  approximations; Spark's exact ``percentile`` matches DuckDB's
  ``quantile_cont`` bit-for-bit, so we give exact answers where ES
  gives approximate ones).
- ``extended_stats`` -> exact integer/decimal sums, variance derived
  from them in one pinned expression (never the streaming var_pop,
  whose float association is partition-order-dependent).
- ``terms``         -> ES bucket ordering (count desc, key asc) +
  sum_other_doc_count.
- ``composite``     -> after-key pagination over the full bucket space
  (ES's scalable way to enumerate buckets without deep windows — the
  right shape for walking a 10^9-bucket space page by page).
- ``histogram`` / ``geotile_grid`` -> fixed-interval and slippy-map
  tile bucketing as pure column arithmetic.

All float outputs follow the repo's determinism protocol: exact
integer/decimal accumulation where possible, single-expression double
derivation mirrored verbatim in the DuckDB oracles, round(4) at the
result surface.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

# ---------------------------------------------------------------------------
# cardinality — HyperLogLog
# ---------------------------------------------------------------------------

_W_HEX = 13  # 52 bits of rho-material after the bucket prefix
_W_BITS = 4 * _W_HEX


def hll_constants(p: int) -> tuple[int, float, float]:
    """(m, alpha_m, C) for 2**p registers, where the raw estimate is
    ``C / denom`` with ``denom = snum_double + V * 2**53`` — every
    register contributes 2**(53-M) to the exact integer numerator and
    an empty register has M=0. Exposed so oracles can embed the exact
    same C literal: repr(C) round-trips to the identical double in
    DuckDB."""
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError("p must be a multiple of 4 in [4, 16]")
    m = 1 << p
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    return m, alpha, alpha * m * m * float(1 << (_W_BITS + 1))


def _rho(w: Column) -> Column:
    """Position of the leftmost 1-bit in the 52-bit suffix, 1-indexed
    from the high bit; all-zero suffix = 53. Integer-only (binary
    string length), so it cannot drift across engines the way a
    floor(log2(w)) would."""
    return F.when(w == 0, F.lit(_W_BITS + 1)).otherwise(
        F.lit(_W_BITS + 1) - F.length(F.bin(w))
    )


def hll_registers(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """The HLL register table: (bucket, M) with one row per NON-EMPTY
    register, M = max rho seen. md5-hashed (cross-engine); bucket = the
    first p bits, rho over the next 52.

    This is the mergeable sketch: registers of a union of frames ==
    per-bucket max of the parts' registers, so shards/segments/days can
    be sketched independently and combined with a 2**p-row agg.
    """
    hx = F.md5(F.col(col).cast("string"))
    bucket = F.conv(F.substring(hx, 1, p // 4), 16, 10).cast("int")
    w = F.conv(F.substring(hx, p // 4 + 1, _W_HEX), 16, 10).cast("long")
    return (
        df.select(bucket.alias("bucket"), w.alias("w"))
        .groupBy("bucket")
        .agg(F.max(_rho(F.col("w"))).alias("M"))
    )


def hll_merge(*register_frames: DataFrame) -> DataFrame:
    """Merge sketches built by hll_registers (same p): per-bucket max."""
    out = register_frames[0]
    for r in register_frames[1:]:
        out = out.unionByName(r)
    return out.groupBy("bucket").agg(F.max("M").alias("M"))


def hll_estimate(regs: DataFrame, p: int = 12) -> DataFrame:
    """One row (cardinality_est double round(4), filled_registers int,
    regime string) from a register table.

    Determinism: the harmonic-mean denominator is accumulated as an
    EXACT integer — sum of 2**(53-M) per filled register (decimal, no
    float association) — then converted to double once; empty registers
    contribute V * 2**53 exactly (a power-of-two scale of an int <=
    2**p is exact in double). The raw estimate is a single division of
    two identical doubles, so the linear-counting branch condition
    evaluates identically in every engine.
    """
    m, _, C = hll_constants(p)
    snum = F.sum(
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {_W_BITS + 1} - M)").cast(
            "decimal(38,0)"
        )
    )
    agg = regs.agg(snum.alias("snum"), F.count("*").alias("nz"))
    V = F.lit(m) - F.col("nz")
    denom = F.col("snum").cast("double") + V.cast("double") * F.lit(
        float(1 << (_W_BITS + 1))
    )
    raw = F.lit(C) / denom
    linear = (V > 0) & (raw <= F.lit(2.5 * m))
    est = F.when(
        linear, F.lit(float(m)) * F.log(F.lit(float(m)) / V.cast("double"))
    ).otherwise(raw)
    return agg.select(
        F.round(est, 4).alias("cardinality_est"),
        F.col("nz").cast("int").alias("filled_registers"),
        F.when(linear, F.lit("linear")).otherwise(F.lit("raw")).alias("regime"),
    )


def cardinality(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """ES ``cardinality`` agg: HLL estimate of count-distinct(col).
    Two aggregations total — a 2**p-key groupBy (map-side partial max,
    ~2**p rows shuffled regardless of input size) and a one-row fold."""
    return hll_estimate(hll_registers(df, col, p), p)


# ---------------------------------------------------------------------------
# percentiles / extended_stats
# ---------------------------------------------------------------------------


def percentiles(df: DataFrame, col: str, percents: list[float]) -> DataFrame:
    """ES ``percentiles`` agg, exact: one row per requested percent
    (percent double, value double round(4)). Spark's exact
    ``percentile`` is type-7 interpolation (pos = p*(n-1)), the same
    definition as DuckDB quantile_cont — verified bit-identical."""
    qs = df.agg(
        F.percentile(F.col(col), F.array(*[F.lit(float(p)) for p in percents])).alias(
            "qs"
        )
    )
    pairs = F.arrays_zip(
        F.array(*[F.lit(float(p)) for p in percents]).alias("percent"),
        F.col("qs").alias("value"),
    )
    return qs.select(F.explode(pairs).alias("pv")).select(
        F.col("pv.percent").alias("percent"),
        F.round(F.col("pv.value"), 4).alias("value"),
    )


def extended_stats(df: DataFrame, col: str) -> DataFrame:
    """ES ``extended_stats`` over an integral column: count/min/max/sum
    exact; avg, variance (population + sampling), std derived from the
    exact decimal sums in one pinned double expression — NOT the
    streaming var_pop/stddev builtins, whose float accumulation order
    depends on partitioning."""
    d = F.col(col).cast("decimal(38,0)")
    agg = df.agg(
        F.count(col).alias("cnt"),
        F.min(col).alias("min"),
        F.max(col).alias("max"),
        F.sum(d).alias("s"),
        F.sum(d * d).alias("ss"),
    )
    n = F.col("cnt").cast("double")
    s = F.col("s").cast("double")
    ss = F.col("ss").cast("double")
    var_pop = (ss - s * s / n) / n
    var_samp = (ss - s * s / n) / (n - F.lit(1.0))
    return agg.select(
        F.col("cnt"),
        F.col("min").cast("long").alias("min"),
        F.col("max").cast("long").alias("max"),
        F.col("s").cast("long").alias("sum"),
        F.round(s / n, 4).alias("avg"),
        F.round(var_pop, 4).alias("var_pop"),
        F.round(var_samp, 4).alias("var_samp"),
        F.round(F.sqrt(var_pop), 4).alias("std_pop"),
    )


# ---------------------------------------------------------------------------
# terms / composite buckets
# ---------------------------------------------------------------------------


def terms_agg(df: DataFrame, col: str, size: int = 10) -> DataFrame:
    """ES ``terms`` agg: top-``size`` buckets by (doc_count desc, key
    asc) plus the sum_other_doc_count column (docs outside the returned
    buckets — ES reports it so a truncated bucket list is never
    mistaken for the whole distribution). One groupBy; the top-k is a
    TakeOrderedAndProject over the bucket frame, and the other-count
    rides along as total - sum(window over the kept rows) without a
    second scan."""
    buckets = df.groupBy(F.col(col).alias("key")).agg(
        F.count("*").alias("doc_count")
    )
    top = buckets.orderBy(F.desc("doc_count"), F.asc("key")).limit(size)
    total = df.count()  # metadata-free count; one job, no shuffle
    kept = top.agg(F.sum("doc_count").alias("k")).collect()[0]["k"] or 0
    return top.withColumn(
        "sum_other_doc_count", F.lit(int(total - kept)).cast("long")
    )


def _after_pred(keys: list[str], after: tuple) -> Column:
    """Lexicographic (k1,...,kn) > after, composed as the standard
    OR-of-prefix-equalities so each leg can push down."""
    pred = F.lit(False)
    for i in range(len(keys)):
        leg = F.col(keys[i]) > F.lit(after[i])
        for j in range(i):
            leg = (F.col(keys[j]) == F.lit(after[j])) & leg
        pred = pred | leg
    return pred


def composite_agg(
    df: DataFrame, keys: list[str], size: int, after: tuple | None = None
) -> DataFrame:
    """ES ``composite`` agg: the bucket space over ``keys`` ordered by
    the key tuple asc, paginated ``size`` buckets at a time from
    ``after`` (exclusive). This is how ES enumerates unbounded bucket
    spaces without deep result windows, and the Spark shape keeps that
    property: the after-key filter lands BEFORE the groupBy (row
    pruning at the scan when keys are partition/sort columns), and the
    page is a TakeOrderedAndProject — never a full sort."""
    src = df.where(_after_pred(keys, after)) if after is not None else df
    page = (
        src.groupBy(*[F.col(k) for k in keys])
        .agg(F.count("*").alias("doc_count"))
        .orderBy(*[F.asc(k) for k in keys])
        .limit(size)
    )
    return page


def histogram(df: DataFrame, col: str, interval: float) -> DataFrame:
    """ES numeric ``histogram``: fixed-interval buckets keyed by the
    bucket's lower bound (floor(v/interval)*interval, ES's key
    definition). Empty buckets are omitted (min_doc_count=1)."""
    key = F.floor(F.col(col) / F.lit(float(interval))) * F.lit(float(interval))
    return (
        df.groupBy(key.alias("key"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy("key")
    )


# ---------------------------------------------------------------------------
# top_hits + pipeline aggregations
# ---------------------------------------------------------------------------


def top_hits(
    df: DataFrame,
    keys: list[str],
    sort: list,
    size: int,
    fields: list[str] | None = None,
) -> DataFrame:
    """ES ``top_hits`` sub-aggregation: the top-``size`` documents of
    every bucket, ranked by ``sort`` (list of Columns, e.g.
    ``[F.desc("ts"), F.asc("event_id")]`` — always include a unique
    tie-break). One window pass, partial per-bucket: the shuffle is the
    groupBy's own hash exchange, and rank <= size prunes before any
    further stage touches the rows."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*sort)
    out = df.withColumn("hit_rank", F.row_number().over(w)).where(
        F.col("hit_rank") <= size
    )
    if fields is not None:
        out = out.select(*keys, *fields, "hit_rank")
    return out


def cumulative_sum(
    buckets: DataFrame, value_col: str, sort_col: str
) -> DataFrame:
    """ES ``cumulative_sum`` pipeline agg over an ordered bucket frame
    (histogram/date_histogram output). Integer-exact running sum.

    Pipeline aggs (this, derivative, moving_avg) run a global-order
    window: fine BY CONSTRUCTION because their input is a bucket frame
    — already reduced to one row per bucket by the parent agg — never
    the raw table. A 100 TB scan feeding a 10k-bucket histogram leaves
    a 10k-row window."""
    from pyspark.sql import Window

    w = Window.orderBy(sort_col).rowsBetween(Window.unboundedPreceding, 0)
    return buckets.withColumn(
        "cumulative_sum", F.sum(value_col).over(w).cast("long")
    )


def derivative(buckets: DataFrame, value_col: str, sort_col: str) -> DataFrame:
    """ES ``derivative`` pipeline agg: bucket-over-bucket delta (null
    for the first bucket, like ES)."""
    from pyspark.sql import Window

    w = Window.orderBy(sort_col)
    return buckets.withColumn(
        "derivative",
        (F.col(value_col) - F.lag(value_col, 1).over(w)).cast("long"),
    )


def moving_avg(
    buckets: DataFrame, value_col: str, sort_col: str, window: int
) -> DataFrame:
    """ES ``moving_fn``/``moving_avg`` pipeline agg: trailing-window
    mean over the ``window`` buckets ending at the current one (fewer
    at the head, like ES's simple model). Exact integer sum / count —
    one division, engine-deterministic; round(4) at the surface."""
    from pyspark.sql import Window

    w = Window.orderBy(sort_col).rowsBetween(-(window - 1), 0)
    return buckets.withColumn(
        "moving_avg",
        F.round(
            F.sum(value_col).over(w).cast("double")
            / F.count(value_col).over(w).cast("double"),
            4,
        ),
    )


# ---------------------------------------------------------------------------
# range / filters / rare_terms buckets
# ---------------------------------------------------------------------------


def range_agg(
    df: DataFrame, col: str, ranges: list[tuple[str, float | None, float | None]]
) -> DataFrame:
    """ES ``range`` agg: one bucket per requested ``(key, from, to)``
    half-open interval (None = open end; from inclusive, to exclusive —
    the reference's own gte/lt convention, utils.ts:55-63). ES evaluates
    every range independently — buckets may OVERLAP, a doc lands in all
    that contain it, and every requested bucket comes back even when
    empty. One scan: per-row array of matched bucket keys, explode +
    count; a literal bucket frame left-joins the counts (broadcast — the
    bucket list is the query, never data-sized) so empty buckets survive
    with doc_count 0."""
    c = F.col(col)

    def member(lo: float | None, hi: float | None) -> Column:
        cond = c.isNotNull()
        if lo is not None:
            cond = cond & (c >= F.lit(lo))
        if hi is not None:
            cond = cond & (c < F.lit(hi))
        return cond

    matched = F.array_compact(
        F.array(*[F.when(member(lo, hi), F.lit(k)) for k, lo, hi in ranges])
    )
    counts = (
        df.select(F.explode(matched).alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("cnt"))
    )
    buckets = df.sparkSession.createDataFrame(
        [(k,) for k, _, _ in ranges], "key string"
    )
    return (
        buckets.join(counts, "key", "left")
        .select(
            "key", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("doc_count")
        )
        .orderBy("key")
    )


def filters_agg(df: DataFrame, filters: dict[str, Column]) -> DataFrame:
    """ES ``filters`` agg: one named bucket per predicate; a doc counts
    toward every filter it matches. Single scan, single one-row partial
    agg (sum-of-when per filter — no shuffle wider than one row), then a
    driver-free unpivot to (key, doc_count) rows."""
    agg = df.agg(
        *[
            F.sum(F.when(c, 1).otherwise(0)).cast("long").alias(k)
            for k, c in filters.items()
        ]
    )
    pairs = F.explode(
        F.array(
            *[
                F.struct(F.lit(k).alias("key"), F.col(k).alias("doc_count"))
                for k in filters
            ]
        )
    ).alias("b")
    return agg.select(pairs).select("b.key", "b.doc_count").orderBy("key")


def rare_terms(df: DataFrame, col: str, max_doc_count: int = 1) -> DataFrame:
    """ES ``rare_terms`` agg: the long tail — buckets with doc_count <=
    ``max_doc_count``, ordered count asc, key asc. ES approximates this
    with a CuckooFilter to bound memory; a Spark groupBy is already an
    exact distributed count with map-side partials, so we give the exact
    answer at the same scan cost."""
    return (
        df.groupBy(F.col(col).alias("key"))
        .agg(F.count("*").alias("doc_count"))
        .where(F.col("doc_count") <= F.lit(max_doc_count))
        .orderBy(F.asc("doc_count"), F.asc("key"))
    )


def percentile_ranks(df: DataFrame, col: str, values: list[float]) -> DataFrame:
    """ES ``percentile_ranks`` agg, exact: for each requested value v,
    the percentage of docs with ``col`` <= v (the CDF at v, times 100).
    ES interpolates between t-digest centroids; like ``percentiles``,
    we return the exact fraction at the same one-scan cost — the
    conditional sums all ride one one-row partial agg, and the
    requested-value frame is query-sized, never data-sized."""
    agg = df.agg(
        F.count(col).alias("_n"),
        *[
            F.sum(F.when(F.col(col) <= F.lit(float(v)), 1).otherwise(0))
            .cast("double")
            .alias(f"_le{i}")
            for i, v in enumerate(values)
        ],
    )
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(float(v)).alias("value"),
                    F.round(
                        F.col(f"_le{i}") * F.lit(100.0) / F.col("_n").cast("double"),
                        4,
                    ).alias("rank"),
                )
                for i, v in enumerate(values)
            ]
        )
    ).alias("p")
    return agg.select(pairs).select("p.value", "p.rank")


def _require_integral(df: DataFrame, cols, op: str) -> None:
    """The exact-decimal accumulation contract: a fractional DOUBLE
    input would be silently truncated by the decimal(38,0) cast,
    producing a wrong aggregate with no error (ADVICE r6) — enforce
    the documented 'integral columns' precondition loudly."""
    from pyspark.sql.types import (
        BooleanType, ByteType, DecimalType, IntegerType, LongType,
        ShortType,
    )

    ok = (ByteType, ShortType, IntegerType, LongType, BooleanType)
    for c in cols:
        dt = df.schema[c].dataType
        if isinstance(dt, DecimalType) and dt.scale == 0:
            continue
        if not isinstance(dt, ok):
            raise TypeError(
                f"{op} requires integral columns (exact decimal "
                f"accumulation); {c!r} is {dt.simpleString()}"
            )


def weighted_avg(df: DataFrame, value_col: str, weight_col: str) -> DataFrame:
    """ES ``weighted_avg`` agg: sum(value*weight) / sum(weight) over
    integral columns — both sums accumulate as exact decimals (the
    extended_stats discipline: the streaming double sum is
    partition-order-dependent and would make the result flap across
    shuffles), with ONE double division + round(4) at the end."""
    _require_integral(df, (value_col, weight_col), "weighted_avg")
    v = F.col(value_col).cast("decimal(38,0)")
    w = F.col(weight_col).cast("decimal(38,0)")
    agg = df.where(F.col(value_col).isNotNull() & F.col(weight_col).isNotNull()).agg(
        F.sum(v * w).alias("_vw"), F.sum(w).alias("_w")
    )
    return agg.select(
        F.round(
            F.col("_vw").cast("double") / F.col("_w").cast("double"), 4
        ).alias("weighted_avg"),
        F.col("_w").cast("long").alias("weight_sum"),
    )


def adjacency_matrix(df: DataFrame, filters: dict[str, Column]) -> DataFrame:
    """ES ``adjacency_matrix`` agg: one bucket per named filter plus one
    per pairwise intersection, keyed "a&b" in ES's sorted-key format;
    empty buckets are omitted (ES behavior). Same shape as filters_agg —
    every count is a sum-of-when on ONE one-row partial agg (k + k(k-1)/2
    conditional sums; the filter list is the query, so the row stays
    tiny), then a driver-free unpivot."""
    keys = sorted(filters)
    cells: list[tuple[str, Column]] = [(k, filters[k]) for k in keys]
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            cells.append((f"{a}&{b}", filters[a] & filters[b]))
    agg = df.agg(
        *[
            F.sum(F.when(c, 1).otherwise(0)).cast("long").alias(f"_b{i}")
            for i, (_, c) in enumerate(cells)
        ]
    )
    pairs = F.explode(
        F.array(
            *[
                F.struct(F.lit(k).alias("key"), F.col(f"_b{i}").alias("doc_count"))
                for i, (k, _) in enumerate(cells)
            ]
        )
    ).alias("b")
    return (
        agg.select(pairs)
        .select("b.key", "b.doc_count")
        .where(F.col("doc_count") > 0)
        .orderBy("key")
    )


# ---------------------------------------------------------------------------
# bucket pipeline ops (bucket_script / bucket_selector / bucket_sort)
# ---------------------------------------------------------------------------


def bucket_script(buckets: DataFrame, name: str, expr: Column) -> DataFrame:
    """ES ``bucket_script`` pipeline agg: a per-bucket computed metric
    from the bucket's sibling metrics (the Column references the bucket
    frame's columns — the buckets_path equivalent). Input is a bucket
    frame (one row per bucket by construction), so this is a pure
    projection — zero jobs, zero shuffle."""
    return buckets.withColumn(name, F.round(expr, 4))


def bucket_selector(buckets: DataFrame, pred: Column) -> DataFrame:
    """ES ``bucket_selector`` pipeline agg: keep only buckets whose
    metrics satisfy the predicate. Pure filter on the bucket frame."""
    return buckets.where(pred)


def bucket_sort(
    buckets: DataFrame,
    sorts: list[tuple[str, str]],
    size: int | None = None,
    from_: int = 0,
) -> DataFrame:
    """ES ``bucket_sort`` pipeline agg: order the parent's buckets by
    metric columns and truncate (from / size). The input is a bucket
    frame — already one row per bucket — so the row_number window is
    over thousands of rows at most, never the raw table (same argument
    as cumulative_sum above); with from_=0 it stays a plain
    TakeOrderedAndProject."""
    order = [F.asc(c) if d == "asc" else F.desc(c) for c, d in sorts]
    if from_ == 0:
        out = buckets.orderBy(*order)
        return out.limit(size) if size is not None else out
    from pyspark.sql import Window

    w = Window.orderBy(*order)
    out = (
        buckets.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") > F.lit(from_))
    )
    if size is not None:
        out = out.where(F.col("_rn") <= F.lit(from_ + size))
    return out.orderBy("_rn").drop("_rn")


def matrix_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """ES ``matrix_stats`` agg: pairwise covariance/correlation over
    numeric fields. One row per unordered pair (field_x <= field_y,
    diagonal included): (field_x, field_y, count, mean_x, mean_y, cov,
    corr) — sample covariance (n-1 denominator, ES MatrixStatsResults),
    diagonal corr = 1 by construction.

    ES streams Welford-style moments (merge-order-dependent doubles);
    here every input to the final expressions is an EXACT decimal sum
    (the extended_stats discipline): k sums + k squares + k(k-1)/2
    cross-products, ALL on one one-row partial agg — a 100 TB scan
    reduces map-side to a single row of exact integers, then the
    covariance matrix is driver-free pure arithmetic. Exactness holds
    for integral columns (cast decimal(38,0)); ES drops docs missing
    any field, mirrored by the all-non-null filter."""
    if len(cols) < 2:
        raise ValueError("matrix_stats needs at least 2 columns")
    _require_integral(df, cols, "matrix_stats")
    base = df
    for c in cols:
        base = base.where(F.col(c).isNotNull())
    dec = {c: F.col(c).cast("decimal(38,0)") for c in cols}
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(dec[c]).alias(f"_s{i}"))
    for i in range(len(cols)):
        for j in range(i, len(cols)):
            aggs.append(F.sum(dec[cols[i]] * dec[cols[j]]).alias(f"_p{i}_{j}"))
    g = base.agg(*aggs)

    n = F.col("_n").cast("double")

    def _mean(i: int) -> Column:
        return F.col(f"_s{i}").cast("double") / n

    def _cov(i: int, j: int) -> Column:
        # ((Sxy) - (Sx * Sy) / n) / (n - 1): pinned op order, every
        # operand an exact-decimal-to-double conversion
        return (
            F.col(f"_p{i}_{j}").cast("double")
            - (F.col(f"_s{i}").cast("double") * F.col(f"_s{j}").cast("double")) / n
        ) / (n - F.lit(1.0))

    # degenerate-input guards (ADVICE r6): n < 2 leaves cov/corr
    # undefined (division by n-1) and a zero-variance column leaves
    # corr undefined (0/0) — emit NULL instead of Inf/NaN rows
    rows = []
    for i in range(len(cols)):
        for j in range(i, len(cols)):
            n_ok = n >= F.lit(2.0)
            cov_ij = F.when(n_ok, _cov(i, j))
            if i == j:
                corr = F.when(n_ok, F.lit(1.0))
            else:
                corr = F.when(
                    n_ok & (_cov(i, i) > 0) & (_cov(j, j) > 0),
                    _cov(i, j) / F.sqrt(_cov(i, i) * _cov(j, j)),
                )
            rows.append(
                F.struct(
                    F.lit(cols[i]).alias("field_x"),
                    F.lit(cols[j]).alias("field_y"),
                    F.col("_n").cast("long").alias("count"),
                    F.round(_mean(i), 4).alias("mean_x"),
                    F.round(_mean(j), 4).alias("mean_y"),
                    F.round(cov_ij, 4).alias("cov"),
                    F.round(corr, 4).alias("corr"),
                )
            )
    pairs = F.explode(F.array(*rows)).alias("p")
    return g.select(pairs).select(
        "p.field_x", "p.field_y", "p.count", "p.mean_x", "p.mean_y",
        "p.cov", "p.corr",
    )


# ES auto_date_histogram rounding ladder (seconds..years, the
# published interval progression), in ms
AUTO_DH_LADDER_MS = [
    1_000, 5_000, 10_000, 30_000,
    60_000, 300_000, 600_000, 1_800_000,
    3_600_000, 3 * 3_600_000, 12 * 3_600_000,
    86_400_000, 7 * 86_400_000, 30 * 86_400_000,
    90 * 86_400_000, 365 * 86_400_000,
]


def auto_date_histogram(
    df: DataFrame, ts_col: str, buckets: int = 10
) -> DataFrame:
    """ES ``auto_date_histogram``: pick the smallest ladder interval
    whose UTC-aligned bucket span fits in ``buckets``, then one
    groupBy. (key_ms, doc_count, interval_ms), keys = epoch-floor
    multiples of the chosen interval (ES rounds to interval
    boundaries, not to the data min).

    The min/max probe is the D1 one-job aggregate (two scalars to the
    driver — the same collect the reference's date slicer starts
    with); the histogram itself is one partial-aggregatable groupBy of
    a pure column key. Returns an empty frame (correct schema) for an
    empty/all-null input."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    ts = F.col(ts_col).cast("timestamp")
    row = df.agg(
        F.min(F.unix_micros(ts)).alias("mn"), F.max(F.unix_micros(ts)).alias("mx")
    ).collect()[0]
    out_schema = "key_ms long, doc_count long, interval_ms long"
    if row["mn"] is None:
        return df.sparkSession.createDataFrame([], out_schema)
    mn_ms, mx_ms = row["mn"] // 1000, row["mx"] // 1000
    interval = AUTO_DH_LADDER_MS[-1]
    for i in AUTO_DH_LADDER_MS:
        if (mx_ms // i) - (mn_ms // i) + 1 <= buckets:
            interval = i
            break
    # integer bucket math: us - pmod(us, interval_us) is an exact
    # multiple of the interval (double-exact below 2^53), so the /1000
    # is an exact integer quotient — no floor-misround risk at
    # epoch-microsecond magnitudes, and pmod keeps pre-1970 keys
    # floor-aligned too
    us = F.unix_micros(ts)
    m = F.lit(interval * 1000)
    key = ((us - F.pmod(us, m)) / F.lit(1000)).cast("long")
    return (
        df.where(ts.isNotNull())
        .groupBy(key.alias("key_ms"))
        .agg(F.count("*").alias("doc_count"))
        .withColumn("interval_ms", F.lit(interval).cast("long"))
    )


# ---------------------------------------------------------------------------
# significant_terms
# ---------------------------------------------------------------------------


def significant_terms(
    df: DataFrame,
    text_col: str,
    foreground: Column,
    size: int = 10,
    min_doc_count: int = 3,
) -> DataFrame:
    """ES ``significant_terms`` over an analyzed text field with the
    default JLH heuristic: terms whose document frequency in the
    foreground set (docs matching ``foreground``) is anomalously high
    vs the background (the whole frame; background INCLUDES foreground,
    as in ES). score = (fgp - bgp) * (fgp / bgp) with fgp/bgp the
    foreground/background doc-frequency fractions.

    Shape at scale: one pass over the analyzed token stream computes
    BOTH frequencies (sum-of-when for the foreground leg — no second
    scan of the corpus), one tiny one-row sizes agg cross-joined in
    (never collected), and the result page is a TakeOrderedAndProject.
    Float determinism: both fractions are single double divisions and
    the score one subtraction, one multiplication, one division in
    pinned order — mirrored verbatim in the DuckDB oracle — with
    round(4) + term tie-break at the ranked surface."""
    from ..indexing.arrowtf import encode_tf

    # r7: per-doc DISTINCT terms come from the Arrow encoder's terms[]
    # (identical set to array_distinct(analyze_col) — encoder groups
    # are per-(doc, term)); the JVM regex chain was the whole cost of
    # this agg at the 100x probe (17.8 s -> RE2 batch kernels). The
    # foreground predicate is evaluated BEFORE the encoder so arbitrary
    # df columns stay usable without shipping them through Arrow.
    toks = encode_tf(
        df.select(foreground.alias("fg"), F.col(text_col)),
        text_col,
        keep=["fg"],
    ).select(F.explode("terms").alias("term"), F.col("fg"))
    per_term = toks.groupBy("term").agg(
        F.sum(F.when(F.col("fg"), 1).otherwise(0)).cast("long").alias("fg_count"),
        F.count("*").alias("bg_count"),
    )
    sizes = df.agg(
        F.count("*").cast("double").alias("superset"),
        F.sum(F.when(foreground, 1).otherwise(0)).cast("double").alias("subset"),
    )
    fgp = F.col("fg_count").cast("double") / F.col("subset")
    bgp = F.col("bg_count").cast("double") / F.col("superset")
    score = (fgp - bgp) * (fgp / bgp)
    return (
        per_term.crossJoin(F.broadcast(sizes))
        .where(F.col("fg_count") >= F.lit(min_doc_count))
        .withColumn("score", F.round(score, 4))
        .where(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(size)
        .select("term", "fg_count", "bg_count", "score")
    )


# ---------------------------------------------------------------------------
# geotile_grid
# ---------------------------------------------------------------------------

_MAX_MERC_LAT = 85.05112878


def geotile_xy(lat: Column, lon: Column, zoom: int) -> tuple[Column, Column]:
    """Slippy-map tile coordinates (ES geotile_grid keys). asinh is
    spelled ln(t + sqrt(t*t + 1)) so both engines execute the identical
    arithmetic; the integer clamp absorbs the only inputs that could
    sit on a tile boundary (the mercator lat clamp itself)."""
    n = float(1 << zoom)
    x = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n)).cast("long")
    clat = F.least(F.greatest(lat, F.lit(-_MAX_MERC_LAT)), F.lit(_MAX_MERC_LAT))
    t = F.tan(F.radians(clat))
    y = F.floor(
        (F.lit(1.0) - F.log(t + F.sqrt(t * t + F.lit(1.0))) / F.lit(math.pi))
        / F.lit(2.0)
        * F.lit(n)
    ).cast("long")
    hi = F.lit((1 << zoom) - 1).cast("long")
    zero = F.lit(0).cast("long")
    return (
        F.least(F.greatest(x, zero), hi),
        F.least(F.greatest(y, zero), hi),
    )


def geotile_grid(
    df: DataFrame, lat_col: str, lon_col: str, zoom: int, size: int = 10
) -> DataFrame:
    """ES ``geotile_grid`` agg: bucket points into zoom-level slippy
    tiles, top-``size`` by (doc_count desc, key asc). Key format is
    ES's "zoom/x/y" string."""
    x, y = geotile_xy(F.col(lat_col), F.col(lon_col), zoom)
    key = F.concat_ws("/", F.lit(str(zoom)), x.cast("string"), y.cast("string"))
    return (
        df.groupBy(key.alias("key"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("key"))
        .limit(size)
    )
