"""Corpus-hygiene operators for training-data pipelines: PII detection
and redaction, URL extraction/normalization, and benchmark
decontamination.

All pure column expressions (JVM codegen, zero UDFs) with exact DuckDB
mirrors. Regexes are restricted to the construct subset Java regex
(Spark) and RE2 (DuckDB) evaluate IDENTICALLY: no lookaround, no
backreferences, explicit whitespace classes (Java's \\s includes \\x0B,
RE2's does not), ASCII \\b (same semantics in both).

Scale notes: every operator here is a single narrow projection over the
text column — no shuffle, no collect; decontamination is one
broadcast-hash semi-join of the document shingle stream against the
benchmark n-gram set (the blocklist is query-sized: ~10^6 n-grams for a
benchmark suite, far under broadcast limits; pass ``broadcast=False``
for blocklists that aren't).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import shingles

# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------

# detection order matters for redaction: ssn before phone so a redacted
# pattern can never re-match a later, looser pattern
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\+[0-9]{7,15}\b",
}


def pii_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document PII match counts: (<id>, n_email, n_ipv4, n_ssn,
    n_phone, n_pii). regexp_count — no match-array allocation; NULL
    text coalesced to '' (0 counts, same as the SQL mirror)."""
    from ..indexing.arrowtf import ensure_scan_parallelism

    df = ensure_scan_parallelism(df)
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = {
        k: F.regexp_count(t, F.lit(p)).cast("long") for k, p in PII_PATTERNS.items()
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        *[c.alias(f"n_{k}") for k, c in counts.items()],
        total.alias("n_pii"),
    )


def redact_pii(
    df: DataFrame, text_col: str, id_col: str, out_col: str = "redacted"
) -> DataFrame:
    """Replace every PII match with a typed placeholder (``<EMAIL>``,
    ``<IPV4>``, ``<SSN>``, ``<PHONE>``) — the standard pre-training
    scrub. Chained regexp_replace in PII_PATTERNS order (Spark
    regexp_replace is global; the DuckDB mirror needs the 'g' flag)."""
    from ..indexing.arrowtf import ensure_scan_parallelism

    df = ensure_scan_parallelism(df)
    out: Column = F.coalesce(F.col(text_col), F.lit(""))
    for k, p in PII_PATTERNS.items():
        out = F.regexp_replace(out, p, f"<{k.upper()}>")
    return df.select(F.col(id_col), out.alias(out_col))


# ---------------------------------------------------------------------------
# URLs
# ---------------------------------------------------------------------------

URL_REGEX = r"""https?://[^ \t\n\f\r"'<>]+"""
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def extract_urls(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(<id>, url) — one row per URL occurrence in the text."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    from ..indexing.arrowtf import ensure_scan_parallelism

    df = ensure_scan_parallelism(df)
    return df.select(
        F.col(id_col), F.explode(F.regexp_extract_all(t, F.lit(URL_REGEX), 0)).alias("url")
    )


def normalize_url(url: Column) -> Column:
    """Canonical URL form: fragment stripped, scheme + authority
    lowercased, default port removed (:80 for http, :443 for https),
    empty path normalized to '/'. Pure string/regex ops mirrored
    verbatim in SQL — the canonical key for URL-level dedup."""
    u = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    auth = F.lower(F.regexp_extract(rest, "^([^/?]+)", 1))
    tail = F.regexp_replace(rest, "^[^/?]+", "")
    auth = F.when(scheme == "http", F.regexp_replace(auth, ":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(auth, ":443$", "")).otherwise(auth)
    )
    return F.concat(
        scheme,
        F.lit("://"),
        auth,
        F.when(tail == "", F.lit("/")).otherwise(tail),
    )


def url_host(url: Column) -> Column:
    """Lowercased host of a URL (port and userinfo stripped)."""
    auth = F.lower(F.regexp_extract(F.regexp_replace(url, _SCHEME_RE, ""), "^([^/?#]+)", 1))
    no_user = F.regexp_replace(auth, "^[^@]*@", "")
    return F.regexp_replace(no_user, ":[0-9]+$", "")


def registered_domain(host: Column) -> Column:
    """Last-two-labels registered-domain heuristic (a public-suffix
    list lookup is a broadcast join away; the heuristic keeps the
    operator dependency-free). Single-label hosts pass through."""
    labels = F.split(host, r"\.")
    return F.when(
        F.size(labels) >= 2, F.concat_ws(".", F.slice(labels, -2, 2))
    ).otherwise(host)


def doc_urls(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(<id>, url, url_norm, host, reg_domain) — the URL-analysis frame
    a crawl pipeline feeds into host-level stats and URL dedup."""
    u = extract_urls(df, text_col, id_col)
    host = url_host(F.col("url"))
    return u.select(
        id_col,
        "url",
        normalize_url(F.col("url")).alias("url_norm"),
        host.alias("host"),
        registered_domain(host).alias("reg_domain"),
    )


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def contamination_hits(
    docs: DataFrame,
    blocklist,
    text_col: str,
    id_col: str,
    n: int = 3,
    broadcast: bool = True,
) -> DataFrame:
    """Documents overlapping a benchmark n-gram blocklist — the
    test-set-decontamination primitive (GPT-3 appendix-C style: drop or
    flag any training doc sharing an n-gram with an eval set).

    ``blocklist``: list[str] of space-joined n-grams, or a DataFrame
    with a ``shingle`` column. Returns (<id>, n_contaminated, matched)
    with ``matched`` the sorted distinct matching n-grams, comma-joined
    (engine-portable string, not an array).

    Shape: document shingle stream (analyzer n-grams, distinct per doc)
    broadcast-semi-joined against the blocklist, then one groupBy(id).
    The corpus side never shuffles its text — only (id, shingle) rows
    that actually match survive the join."""
    sh = shingles(docs, text_col, id_col, n)
    if isinstance(blocklist, (list, tuple)):
        bl = docs.sparkSession.createDataFrame(
            [(s,) for s in blocklist], "shingle string"
        )
    else:
        bl = blocklist.select("shingle")
    if broadcast:
        bl = F.broadcast(bl)
    hits = sh.join(bl, "shingle")
    return hits.groupBy(id_col).agg(
        F.count("*").alias("n_contaminated"),
        F.array_join(F.sort_array(F.collect_set("shingle")), ",").alias("matched"),
    )


def decontaminate(
    docs: DataFrame,
    blocklist,
    text_col: str,
    id_col: str,
    n: int = 3,
    broadcast: bool = True,
) -> DataFrame:
    """The apply half: docs with every contaminated document removed
    (left anti-join against the hit set)."""
    hits = contamination_hits(docs, blocklist, text_col, id_col, n, broadcast)
    return docs.join(hits.select(id_col), id_col, "left_anti")
