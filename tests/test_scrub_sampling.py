"""operators/scrub.py + operators/sampling.py: PII counts/redaction
round-trip, URL normalization goldens, decontamination end-to-end,
hash sampling/splitting determinism + the DuckDB bucket mirror."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.operators import sampling, scrub


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        (1, "mail a.b+c@ex-ample.co.uk and x@y.io thanks"),
        (2, "server at 10.0.255.1 and 192.168.1.254, ok"),
        (3, "ssn 123-45-6789 call +14155550100 now"),
        (4, "clean text, no pii at all"),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_counts_match_python_re(pii_df):
    got = {r["doc_id"]: r for r in scrub.pii_stats(pii_df, "text", "doc_id").collect()}
    for r in pii_df.collect():
        t = r["text"] or ""
        for kind, pat in scrub.PII_PATTERNS.items():
            want = len(re.findall(pat, t))
            assert got[r["doc_id"]][f"n_{kind}"] == want, (r["doc_id"], kind)
    assert got[4]["n_pii"] == 0 and got[5]["n_pii"] == 0
    assert got[1]["n_email"] == 2 and got[2]["n_ipv4"] == 2
    assert got[3]["n_ssn"] == 1 and got[3]["n_phone"] == 1


def test_redact_round_trip(pii_df):
    red = {r["doc_id"]: r["redacted"] for r in scrub.redact_pii(pii_df, "text", "doc_id").collect()}
    # no pattern survives redaction
    for t in red.values():
        for pat in scrub.PII_PATTERNS.values():
            assert not re.search(pat, t), (t, pat)
    assert red[1].count("<EMAIL>") == 2
    assert red[2].count("<IPV4>") == 2
    assert "<SSN>" in red[3] and "<PHONE>" in red[3]
    assert red[4] == "clean text, no pii at all"
    assert red[5] == ""


# ---------------------------------------------------------------------------
# URLs
# ---------------------------------------------------------------------------


def test_url_normalize_goldens(spark):
    cases = [
        ("HTTPS://Example.COM:443/Path/X?q=1#frag", "https://example.com/Path/X?q=1"),
        ("http://A.B.org:80", "http://a.b.org/"),
        ("http://a.b.org:8080/x/", "http://a.b.org:8080/x/"),
        ("https://example.com", "https://example.com/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["n"] for r in df.select(scrub.normalize_url(F.col("url")).alias("n")).collect()]
    assert got == [w for _, w in cases]


def test_doc_urls_hosts_and_domains(spark):
    df = spark.createDataFrame(
        [
            (1, "see https://sub.Example.com/a and http://user@Other.ORG:80/b#z"),
            (2, "bare host http://localhost:9200/_search"),
            (3, "none here"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["url"]): (r["url_norm"], r["host"], r["reg_domain"])
        for r in scrub.doc_urls(df, "text", "doc_id").collect()
    }
    assert got[(1, "https://sub.Example.com/a")] == (
        "https://sub.example.com/a", "sub.example.com", "example.com")
    assert got[(1, "http://user@Other.ORG:80/b#z")] == (
        "http://user@other.org/b", "other.org", "other.org")
    assert got[(2, "http://localhost:9200/_search")] == (
        "http://localhost:9200/_search", "localhost", "localhost")
    assert not any(d == 3 for d, _ in got)


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_contamination_hits_and_apply(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "quick brown fox somewhere else entirely"),
            (3, "totally unrelated content about spark plans"),
            (4, "short"),
        ],
        "doc_id long, text string",
    )
    bl = ["quick brown fox", "lazy dog sleeps", "spark plans optimize"]
    hits = {
        r["doc_id"]: (r["n_contaminated"], r["matched"])
        for r in scrub.contamination_hits(docs, bl, "text", "doc_id").collect()
    }
    assert hits == {1: (1, "quick brown fox"), 2: (1, "quick brown fox")}
    kept = {r["doc_id"] for r in scrub.decontaminate(docs, bl, "text", "doc_id").collect()}
    assert kept == {3, 4}


# ---------------------------------------------------------------------------
# sampling / splitting
# ---------------------------------------------------------------------------


def test_hash_sample_nested_and_partition_invariant(spark):
    df = spark.range(20_000).select(F.col("id").alias("doc_id"))
    s10 = {r["doc_id"] for r in sampling.hash_sample(df, "doc_id", 0.10).collect()}
    s01 = {r["doc_id"] for r in sampling.hash_sample(df, "doc_id", 0.01).collect()}
    assert s01 <= s10  # nested supersets
    assert abs(len(s10) - 2000) < 200 and abs(len(s01) - 200) < 70
    rep = {
        r["doc_id"]
        for r in sampling.hash_sample(df.repartition(13), "doc_id", 0.10).collect()
    }
    assert rep == s10  # partitioning cannot change the selection
    other = {r["doc_id"] for r in sampling.hash_sample(df, "doc_id", 0.10, seed="x").collect()}
    assert other != s10  # seed matters


def test_hash_split_exactly_one_and_proportions(spark):
    df = spark.range(30_000).select(F.col("id").alias("doc_id"))
    out = sampling.hash_split(
        df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    counts = {r["split"]: r["c"] for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 30_000
    assert abs(counts["train"] - 24_000) < 500
    assert abs(counts["val"] - 3_000) < 250
    assert abs(counts["test"] - 3_000) < 250


def test_hash_split_validates_weights(spark):
    df = spark.range(5).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        sampling.hash_split(df, "doc_id", {"a": 0.5, "b": 0.4})


def test_bucket_matches_duckdb_mirror(spark):
    import duckdb

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    got = {
        r["doc_id"]: r["b"]
        for r in df.select("doc_id", sampling.hash_bucket("doc_id", "split").alias("b")).collect()
    }
    want = dict(
        duckdb.sql(
            "SELECT id, ('0x' || substr(md5('split:' || id::VARCHAR), 1, 13))::BIGINT % 1000000 "
            "FROM range(500) t(id)"
        ).fetchall()
    )
    assert got == want


def test_stratified_sample_matches_per_stratum_hash_sample(spark):
    df = spark.range(3000).selectExpr(
        "id", "CASE WHEN id % 3 = 0 THEN 'en' WHEN id % 3 = 1 THEN 'de' "
        "ELSE 'fr' END AS lang"
    )
    rates = {"en": 0.2, "de": 1.0, "fr": 0.0}
    got = sampling.stratified_sample(df, "lang", rates, "id", seed="s1")
    rows = got.collect()
    # per-stratum equality with hash_sample under the same seed
    for lang, rate in rates.items():
        want = {
            r["id"]
            for r in sampling.hash_sample(
                df.where(F.col("lang") == lang), "id", rate, seed="s1"
            ).collect()
        }
        assert {r["id"] for r in rows if r["lang"] == lang} == want
    # nested: tightening a stratum's rate keeps a subset
    tighter = sampling.stratified_sample(
        df, "lang", {**rates, "en": 0.05}, "id", seed="s1"
    )
    en_tight = {r["id"] for r in tighter.collect() if r["lang"] == "en"}
    en_loose = {r["id"] for r in rows if r["lang"] == "en"}
    assert en_tight <= en_loose


def test_stratified_sample_default_rate_and_nulls(spark):
    df = spark.range(600).selectExpr(
        "id", "CASE WHEN id % 2 = 0 THEN 'a' ELSE NULL END AS g"
    )
    # unknown strata (NULL here) fall to default_rate
    none_kept = sampling.stratified_sample(df, "g", {"a": 1.0}, "id").collect()
    assert all(r["g"] == "a" for r in none_kept)
    all_kept = sampling.stratified_sample(
        df, "g", {"a": 1.0}, "id", default_rate=1.0
    )
    assert all_kept.count() == 600
    with pytest.raises(ValueError):
        sampling.stratified_sample(df, "g", {"a": 1.5}, "id")


def test_rebalance_rates():
    counts = {"web": 8000, "code": 1500, "wiki": 500}
    target = {"web": 0.5, "code": 0.3, "wiki": 0.2}
    rates = sampling.rebalance_rates(counts, target)
    # binding stratum keeps everything
    assert max(rates.values()) == 1.0
    kept = {s: counts[s] * rates[s] for s in counts}
    tot = sum(kept.values())
    for s in counts:
        assert kept[s] / tot == pytest.approx(target[s], rel=1e-9)
    # wiki is the scarcest vs target -> it binds
    assert rates["wiki"] == 1.0
    with pytest.raises(ValueError):
        sampling.rebalance_rates({"a": 1}, {})
