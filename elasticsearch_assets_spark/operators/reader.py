"""Reader-semantics operators (SURVEY.md §2.1/§2.3/§2.4).

The reference's slicers buy partition plans with ES count round-trips;
in Spark the same semantics are declarative predicates + aggregations,
with Catalyst/AQE doing the partition planning. What remains valuable —
and is implemented here — is the *semantics contract*:

- date ranges are start-inclusive, end-EXCLUSIVE
  (utils.ts:58-61 range gte/lt)
- auto interval = total_range / ceil(count/size)
  (ElasticsearchReaderAPI.ts:225-285, determineSliceInterval)
- divideRange splits [start,limit) evenly, last slicer takes remainder
  (algorithms/date-helpers.ts:242-264)
- id slicing groups by key prefix over a known alphabet
  (algorithms/idSlicer.ts, id-utils/keys.ts)
- geo box / distance with haversine + distance sort
  (utils.ts:102-247)
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# key alphabets — reference id-utils/keys.ts:96-119 ("base64 based:
# upper, lower, numbers then special chars"; hexadecimal: numbers first)
ALPHABETS = {
    "base64url": (
        [chr(c) for c in range(ord("A"), ord("Z") + 1)]
        + [chr(c) for c in range(ord("a"), ord("z") + 1)]
        + [str(d) for d in range(10)]
        + ["-", "_"]
    ),
    "base64": (
        [chr(c) for c in range(ord("A"), ord("Z") + 1)]
        + [chr(c) for c in range(ord("a"), ord("z") + 1)]
        + [str(d) for d in range(10)]
        + ["-", "_", "+", "/"]
    ),
    "hexadecimal": [str(d) for d in range(10)] + list("abcdef"),
    "HEXADECIMAL": [str(d) for d in range(10)] + list("ABCDEF"),
}


def date_range_pred(date_col: str, start, end) -> Column:
    """Q3: start-inclusive, end-exclusive — the reference's gte/lt."""
    return (F.col(date_col) >= F.lit(start)) & (F.col(date_col) < F.lit(end))


def date_range_scan(
    df: DataFrame, date_col: str, start, end, fields: list[str] | None = None
) -> DataFrame:
    """S1 fetch path: filtered scan + _source projection (Q10).
    Catalyst pushes both to the parquet scan."""
    out = df.where(date_range_pred(date_col, start, end))
    if fields:
        out = out.select(*fields)
    return out


def minmax_probe(df: DataFrame, date_col: str) -> DataFrame:
    """Q15/D1: index date extent in ONE job (the reference runs two
    sorted size-1 probes; an aggregate is strictly better)."""
    return df.agg(
        F.min(date_col).alias("min_date"), F.max(date_col).alias("max_date")
    )


def count_query(df: DataFrame, pred: Column | None = None) -> int:
    """Q13: exact count for arbitrary predicate (ES size=0 search)."""
    return (df.where(pred) if pred is not None else df).count()


DEFAULT_MAX_RESULT_WINDOW = 10_000


def validate_window_size(
    size: int, max_result_window: int = DEFAULT_MAX_RESULT_WINDOW, index: str = ""
) -> int:
    """Q16 setWindowSize guard (ElasticsearchReaderAPI.ts:287-295):
    a slice size larger than the index's max_result_window is refused
    up front (same error shape as the reference), not discovered
    mid-fetch."""
    if size > max_result_window:
        raise ValueError(
            f"Invalid parameter size: {size}, it cannot exceed the "
            f'"index.max_result_window" index setting of '
            f"{max_result_window} for index {index or '<default>'}"
        )
    return size


def index_matcher(index: str):
    """indexMatcher (ElasticsearchReaderAPI.ts:809-815): a wildcard
    config index glob-matches candidate index names; a plain name
    matches by substring CONTAINMENT (indexVal.includes(index)) — not
    equality, mirroring the reference exactly.

    '?' maps to an OPTIONAL single character (`.?`), matching
    @terascope/utils' wildCardToRegex (ADVICE r4; the package is not
    vendored here, but its glob treats '?' as zero-or-one, unlike
    ES/Lucene wildcards where '?' is exactly one — query-side wildcard
    in query/exec.py keeps the Lucene semantics)."""
    import re as _re

    if "*" in index or "?" in index:
        out = []
        for ch in index:
            if ch == "*":
                out.append(".*")
            elif ch == "?":
                out.append(".?")
            elif ch in ".^$+{}[]|()\\":
                out.append("\\" + ch)
            else:
                out.append(ch)
        rx = _re.compile("^" + "".join(out) + "$")
        return lambda v: rx.match(v) is not None
    return lambda v: index in v


def _max_result_window_from_settings(settings) -> object:
    """_getMaxResultWindowFromSettings (ElasticsearchReaderAPI.ts:
    740-753): settings may be flat {'index.max_result_window': N} or
    state-prefixed {'index': {'index.max_result_window': N}}."""
    key = "index.max_result_window"
    if not isinstance(settings, dict):
        return None
    if "index" in settings and isinstance(settings["index"], dict):
        return settings["index"].get(key)
    return settings.get(key)


def get_window_size(
    index: str, settings: dict, default_size: int
) -> int:
    """getWindowSize (ElasticsearchReaderAPI.ts:760-778): walk the
    per-index settings map in order; the FIRST index name the config
    index matches yields its max_result_window, with the explicit
    `settings` path overriding `defaults`; no match (or no window on
    any match) falls back to the configured slice size.

    `settings` mirrors the ES get-settings response shape:
    {index_name: {"settings": {...}, "defaults": {...}}}.
    """
    matcher = index_matcher(index)
    for key, configs in settings.items():
        if not matcher(key):
            continue
        config_path = _max_result_window_from_settings(
            (configs or {}).get("settings")
        )
        default_path = _max_result_window_from_settings(
            (configs or {}).get("defaults")
        )
        # config goes first as it overrides any defaults. JS truthiness
        # (`if (configPath) return ...`): an explicit 0 or '' is FALSY
        # and falls through to the defaults path / next index, exactly
        # like the reference (ADVICE r4) — Python truthiness mirrors JS
        # for every value this path can see (0, 0.0, '', None, False)
        for v in (config_path, default_path):
            if v:
                try:
                    return int(v)
                except (TypeError, ValueError):
                    # toIntegerOrThrow
                    raise ValueError(
                        f"Expected {v!r} to be parsed to an integer"
                    ) from None
    return default_size


def validate_window_size_for_index(
    size: int, index: str, settings: dict, default_size: int = DEFAULT_MAX_RESULT_WINDOW
) -> int:
    """Q16 with the reference's per-index resolution: resolve the
    window through the wildcard/containment matcher, then apply the
    setWindowSize guard with that index's own limit."""
    window = get_window_size(index, settings, default_size)
    return validate_window_size(size, window, index)


def bounded_count(df: DataFrame, pred: Column | None, n: int) -> int:
    """Q14 track_total_hits=N: bounded-cost count — stops at n via
    limit(n), never scans past the bound."""
    base = df.where(pred) if pred is not None else df
    return base.limit(n).count()


def fetch_with_expansion(
    df: DataFrame,
    pred: Column | None,
    count: int | None = None,
    max_result_window: int = DEFAULT_MAX_RESULT_WINDOW,
    retries: int = 5,
):
    """F1 fetch with size-expansion retry (ElasticsearchReaderAPI.ts
    fetch :104-178): query at ceil(count·1.5); a result of EXACTLY the
    query size may be truncated, so grow ×1.5 and refetch, up to
    `retries` times, refusing sizes past the window. Spark reads are
    exact, so truncation here is simulated with limit() — the semantics
    (stale slice counts racing concurrent writers) and the error shapes
    are the reference's; real deployments can call the plain scan.

    Returns the collected rows ('the fetcher successfully retrieves all
    8 records' behavior when the set grew after slicing).
    """
    import math

    base = df.where(pred) if pred is not None else df
    query_size = 10_000
    if count:
        expanded = math.ceil(count * 1.5)
        if expanded >= max_result_window:
            raise ValueError(
                f"The query size, {expanded}, is greater than the "
                f"index.max_result_window: {max_result_window}"
            )
        query_size = expanded

    last_err: Exception | None = None
    # `retries` TOTAL attempts — pinned by the reference's own golden
    # (test/elasticsearch_reader/fetcher-spec.ts:199-227): the size walk
    # is 6→9→14→21→32 (five attempts) and the FINAL error names 48 as
    # the next size never attempted; with npm-p-retry semantics
    # (initial + 5 retries = 6 attempts) the sixth attempt at 48 would
    # have thrown "...exactly 48 ... size: 72" instead. Terascope's
    # pRetry counts attempts, not retries-after-initial (the spec's own
    # comment flags "a bug in pRetry" as the reason the message is the
    # inner error) — we match the observable behavior.
    for _attempt in range(retries):
        rows = base.limit(query_size).collect()
        if len(rows) != query_size:
            return rows
        expanded = math.ceil(query_size * 1.5)
        if expanded >= max_result_window:
            raise ValueError(
                f"The query size, {expanded}, is greater than the "
                f"index.max_result_window: {max_result_window}"
            )
        last_err = ValueError(
            f"The result set contained exactly {len(rows)} records, "
            f"searching again with size: {expanded}"
        )
        query_size = expanded
    raise last_err


def auto_interval_ms(
    start_ms: int, end_ms: int, total: int, size: int, resolution: str = "ms"
) -> int:
    """D2 determineSliceInterval("auto"): numOfSlices = ceil(count/size);
    interval = FLOOR(range/numOfSlices), min one resolution unit
    (ElasticsearchReaderAPI.ts:252-284 — golden: 1000 docs/193 ms/size 50
    → [9,'ms']). 's' resolution floors to whole seconds (returned in ms).
    total==0 is the caller's special case (reference returns null)."""
    if total <= 0:
        return max(1, end_ms - start_ms)
    n_slices = math.ceil(total / size)
    interval = (end_ms - start_ms) // n_slices
    if resolution == "s":
        return max(1000, (interval // 1000) * 1000)
    return max(1, interval)


def date_histogram(
    df: DataFrame, date_col: str, start, interval_ms: int
) -> DataFrame:
    """The slice plan as data: bucket each row into fixed intervals from
    `start` and count — the declarative equivalent of dateSlicer's
    count-driven walk (D4). Feed the result to repartitionByRange or
    use it as a slice manifest."""
    delta_ms = (
        F.col(date_col).cast("double") - F.lit(start).cast("timestamp").cast("double")
    ) * 1000.0
    bucket = F.floor(delta_ms / F.lit(float(interval_ms))).cast("long")
    return (
        df.withColumn("slice_id", bucket)
        .groupBy("slice_id")
        .agg(F.count("*").alias("count"))
        .orderBy("slice_id")
    )


def divide_range(start_ms: int, limit_ms: int, n: int) -> list[tuple[int, int]]:
    """D3 divideRange (date-helpers.ts:242-264): float step truncated to
    ms, final limit pinned exactly — bit-identical to the reference's
    moment arithmetic."""
    from elasticsearch_assets_spark.operators.date_slicer import divide_range_ms

    return divide_range_ms(start_ms, limit_ms, n)


def id_slice_counts(
    df: DataFrame, key_col: str, depth: int = 1
) -> DataFrame:
    """I2 idSlicer as an aggregation: per key-prefix doc counts at a
    given depth. The reference walks the prefix tree with one count
    query per node; one groupBy computes the whole level."""
    return (
        df.groupBy(F.substring(F.col(key_col), 1, depth).alias("key_prefix"))
        .agg(F.count("*").alias("count"))
        .orderBy("key_prefix")
    )


def id_slicer_ranges(key_type: str, n_slicers: int) -> list[list[str]]:
    """I1 determineIDSlicerRanges: round-robin deal the alphabet across
    slicers (id-utils/utils.ts:25-52)."""
    alphabet = ALPHABETS[key_type]
    out: list[list[str]] = [[] for _ in range(n_slicers)]
    for i, ch in enumerate(alphabet):
        out[i % n_slicers].append(ch)
    return out


def id_prefix_pred(key_col: str, keys: list[str]) -> Column:
    """Q4: OR of prefix wildcards (the slice's `keys`).

    A trailing `$` marks an exact-key slice (the id slicers'
    conserve_exact extension, operators/id_slicer.py): `ab$` matches
    docs whose key IS `ab`, not keys prefixed by the literal two-char
    string "ab$" (which exists in no reference keyspace alphabet)."""
    cond = None
    for kpref in keys:
        if kpref.endswith("$"):
            c = F.col(key_col) == kpref[:-1]
        else:
            c = F.col(key_col).startswith(kpref)
        cond = c if cond is None else (cond | c)
    return cond if cond is not None else F.lit(False)


def _point_py(v) -> tuple[float, float]:
    """Driver-side geo point: '"lat, lon"' string or (lat, lon) pair."""
    if isinstance(v, (tuple, list)):
        return float(v[0]), float(v[1])
    lat, lon = (p.strip() for p in str(v).split(","))
    return float(lat), float(lon)


def build_slice_query(
    df: DataFrame, op_config: dict, slice_params: dict
) -> DataFrame:
    """The reference's central ES-DSL assembly (utils.ts:9-110
    buildQuery/_buildRangeQuery) as ONE composed DataFrame plan: every
    clause lands in the same WHERE so Catalyst pushes the conjunction
    into the scan together.

    - params.start/end        → range gte/lt on date_field_name
    - params.keys             → OR over id_field_name prefixes: wildcard
                                `key*` by default, regexp `key.*` when
                                recurse_optimization (utils.ts:66-90)
    - op_config.query         → lucene query_string over the columns
                                (the reference passes it verbatim to ES)
    - op_config.geo_*         → bounding-box or distance query, with the
                                reference's _geo_distance sort rules
    - op_config.fields        → _source projection

    Parity notes: params.count is required (reference error) but the
    returned frame is NOT truncated to it — Spark reads are exact, so
    the size cap + expansion-retry live in fetch_with_expansion (F1).
    """
    if slice_params.get("count") is None:
        raise ValueError("Expected count to buildQuery")

    out = df
    start, end = slice_params.get("start"), slice_params.get("end")
    if start and end:
        out = out.where(date_range_pred(op_config["date_field_name"], start, end))

    keys = slice_params.get("keys") or []
    if keys:
        id_field = op_config.get("id_field_name")
        if not isinstance(id_field, str):
            raise ValueError("Missing id_field_name for id slicer")
        if op_config.get("recurse_optimization"):
            cond = None
            for k in keys:
                if k.endswith("$"):
                    # conserve_exact marker (operators/id_slicer.py):
                    # an exact-key slice, translated to equality rather
                    # than relying on `$` doubling as a regex anchor
                    c = F.col(id_field) == k[:-1]
                else:
                    c = F.col(id_field).rlike(f"^{k}.*$")
                cond = c if cond is None else (cond | c)
            out = out.where(cond)
        else:
            out = out.where(id_prefix_pred(id_field, keys))

    if op_config.get("query"):
        from elasticsearch_assets_spark.sources.spaces import spaces_filter

        out = spaces_filter(out, op_config["query"])

    if op_config.get("geo_field"):
        from elasticsearch_assets_spark.sources.jobconfig import (
            validate_geo_parameters,
        )

        validate_geo_parameters(op_config)
        gf = op_config["geo_field"]
        lat, lon = f"{gf}.lat", f"{gf}.lon"
        if dict(out.dtypes).get(gf, "").startswith("string"):
            out = out.withColumn(f"_{gf}_pt", parse_geo_point(gf))
            lat, lon = f"_{gf}_pt.lat", f"_{gf}_pt.lon"
        out = out.withColumn("_glat", F.col(lat)).withColumn("_glon", F.col(lon))
        if op_config.get("geo_box_top_left"):
            out = geo_bounding_box(
                out,
                "_glat",
                "_glon",
                _point_py(op_config["geo_box_top_left"]),
                _point_py(op_config["geo_box_bottom_right"]),
            )
            if op_config.get("geo_sort_point"):
                p = _point_py(op_config["geo_sort_point"])
                d = haversine_m(
                    F.lit(p[0]), F.lit(p[1]), F.col("_glat"), F.col("_glon")
                )
                order = op_config.get("geo_sort_order", "asc")
                out = out.withColumn("_distance_m", d).orderBy(
                    F.col("_distance_m").asc()
                    if order == "asc"
                    else F.col("_distance_m").desc()
                )
        else:
            # distance query always carries a _geo_distance sort, around
            # geo_sort_point when given else the query point (utils.ts
            # geoSearch)
            sp = op_config.get("geo_sort_point") or op_config["geo_point"]
            import re as _re

            m = _re.fullmatch(
                r"([\d.]+)\s*([a-z]*)", str(op_config["geo_distance"]).strip()
            )
            if not m:
                raise ValueError(
                    f"invalid geo_distance: {op_config['geo_distance']!r}"
                )
            dist = float(m.group(1))
            unit = m.group(2) or op_config.get("geo_sort_unit", "m")
            if unit not in UNIT_M:
                # fail fast like the reference's geo parsing — a typo'd
                # unit ('50kn') must not silently become meters
                raise ValueError(
                    f"invalid geo_distance unit: {unit!r} "
                    f"(expected one of {sorted(UNIT_M)})"
                )
            out = geo_distance(
                out,
                "_glat",
                "_glon",
                _point_py(op_config["geo_point"]),
                dist,
                unit,
                op_config.get("geo_sort_order", "asc"),
            )
            if op_config.get("geo_sort_point") and sp != op_config["geo_point"]:
                p = _point_py(sp)
                d = haversine_m(
                    F.lit(p[0]), F.lit(p[1]), F.col("_glat"), F.col("_glon")
                )
                out = out.withColumn("_sort_m", d).orderBy(
                    F.col("_sort_m").asc()
                    if op_config.get("geo_sort_order", "asc") == "asc"
                    else F.col("_sort_m").desc()
                )

    if op_config.get("fields"):
        out = out.select(*op_config["fields"])
    return out


# ---- geo (Q7-Q9) ---------------------------------------------------------
def parse_geo_point(col: Column | str) -> Column:
    """Parse the reference's geo-point string form '"lat, lon"'
    (validated at asset/src/elasticsearch_reader_api/schema.ts:311-323)
    into struct<lat double, lon double>; malformed input → null fields."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(F.regexp_replace(c, r"\s+", ""), ",")
    valid = F.size(parts) == 2
    lat = F.when(valid, F.element_at(parts, 1).cast("double"))
    lon = F.when(valid, F.element_at(parts, 2).cast("double"))
    lat = F.when(lat.between(-90.0, 90.0), lat)
    lon = F.when(lon.between(-180.0, 180.0), lon)
    return F.struct(lat.alias("lat"), lon.alias("lon"))



EARTH_RADIUS_M = 6371000.0
UNIT_M = {"m": 1.0, "km": 1000.0, "mi": 1609.344, "yd": 0.9144, "ft": 0.3048}


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters — built-in trig only."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlon / 2)
        * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def geo_bounding_box(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    top_left: tuple[float, float],
    bottom_right: tuple[float, float],
) -> DataFrame:
    """Q7: docs with point inside the box (lat N→S, lon W→E)."""
    n, w = top_left
    s, e = bottom_right
    return df.where(
        F.col(lat_col).between(s, n) & F.col(lon_col).between(w, e)
    )


def geo_distance(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    point: tuple[float, float],
    distance: float,
    unit: str = "m",
    sort: str | None = "asc",
) -> DataFrame:
    """Q8+Q9: haversine ≤ distance, sorted by distance (the reference
    always attaches a _geo_distance sort — utils.ts:231-247).

    sort=None skips the global sort (r7): set-semantics consumers (the
    fetch path feeding a downstream shuffle, count queries) otherwise
    pay a rangepartition exchange + range-sampling job for an ordering
    the next operator destroys. The sorted variant stays the default
    (reference parity)."""
    plat, plon = point
    d = haversine_m(F.lit(plat), F.lit(plon), F.col(lat_col), F.col(lon_col))
    out = df.withColumn("_distance_m", d).where(
        F.col("_distance_m") <= distance * UNIT_M[unit]
    )
    if sort is None:
        return out
    order = F.col("_distance_m").asc() if sort == "asc" else F.col("_distance_m").desc()
    return out.orderBy(order)
