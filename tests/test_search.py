"""query/search.py: field collapse (best hit per group, partial-agg
shape), search_after pagination (exactly-once full walk), more_like_this
(interesting-term selection + seed-excluded BM25), term suggester
(distance/frequency ranking) — all brute-forced against OracleIndex."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from elasticsearch_assets_spark.query import bm25
from elasticsearch_assets_spark.query import exec as qx
from elasticsearch_assets_spark.query import search as qs
from elasticsearch_assets_spark.functions.analyzer import analyze_text


def _round4(x: float) -> float:
    """Spark F.round on doubles = BigDecimal.valueOf(x) (shortest repr)
    + HALF_UP — python round() is HALF_EVEN and would diverge on .5s."""
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP))


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_collapse_best_per_group(corpus):
    index, oracle = corpus
    terms = sorted(set(analyze_text("parse_date mergeBatch return")))
    scored = qx.scored_terms(index, terms).join(
        index.doc_norms.select("doc_id", "lang"), "doc_id"
    )
    got = [
        (r["lang"], r["doc_id"], r["score"])
        for r in qs.collapse_best_hits(scored, "lang", 3).collect()
    ]
    langs = {
        r["doc_id"]: r["lang"]
        for r in index.doc_norms.select("doc_id", "lang").collect()
    }
    best: dict[str, tuple[float, int]] = {}
    for d, (s, _) in oracle.score_terms(terms).items():
        lang = langs[d]
        # best hit per group: score desc, doc_id asc tie-break
        if lang not in best or (-s, d) < (-best[lang][0], best[lang][1]):
            best[lang] = (s, d)
    want = sorted(
        ((lang, d, s) for lang, (s, d) in best.items()),
        key=lambda x: (-x[2], x[1]),
    )[:3]
    assert got == want
    # one hit per collapse value, by construction
    assert len({lang for lang, _, _ in got}) == len(got)


def test_search_after_full_walk_exactly_once(corpus):
    index, _ = corpus
    df = index.doc_norms.select("doc_id", "dl")
    rows = [(r["dl"], r["doc_id"]) for r in df.collect()]
    want = sorted(rows, key=lambda x: (-x[0], x[1]))
    sorts = [("dl", "desc"), ("doc_id", "asc")]
    walked, after = [], None
    for _ in range(100):
        page = qs.search_after(df, sorts, after, 37).collect()
        if not page:
            break
        walked += [(r["dl"], r["doc_id"]) for r in page]
        after = (page[-1]["dl"], page[-1]["doc_id"])
    assert walked == want  # every row exactly once, in the total order


def test_interesting_terms_and_mlt(corpus, spark):
    from elasticsearch_assets_spark.corpus import generate_corpus_pandas
    from elasticsearch_assets_spark.indexing.build import with_doc_id

    index, oracle = corpus
    docs = with_doc_id(spark.createDataFrame(generate_corpus_pandas(400, seed=42)))
    seed = min(oracle.dl)

    cand = []
    for t, postings in oracle.tf.items():
        if seed not in postings:
            continue
        tf, df = postings[seed], len(postings)
        if df < 2:
            continue
        w = _round4(tf * bm25.idf(oracle.n_docs, df))
        cand.append((-w, t, tf, df))
    cand.sort()
    want_terms = [(t, tf, df, -w) for w, t, tf, df in cand[:25]]

    got_terms = [
        (r["term"], r["tf"], r["df"], r["weight"])
        for r in qs.interesting_terms(
            index, docs, seed, text_col="content", min_doc_freq=2
        ).collect()
    ]
    assert got_terms == want_terms

    sc = oracle.score_terms(sorted(t for t, _, _, _ in want_terms))
    want_hits = sorted(
        ((d, s) for d, (s, _) in sc.items() if d != seed),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    got_hits = [
        (r["doc_id"], r["score"])
        for r in qs.more_like_this(
            index, docs, seed, k=10, text_col="content", min_doc_freq=2
        ).collect()
    ]
    assert [d for d, _ in got_hits] == [d for d, _ in want_hits]
    for (gd, gs), (_, ws) in zip(got_hits, want_hits):
        assert gs == ws, (gd, gs, ws)  # bit-identical fold
    assert seed not in {d for d, _ in got_hits}


def test_suggest_ranking(corpus):
    index, oracle = corpus
    q = "confg"  # 1 edit from 'config'
    got = [
        (r["term"], r["distance"], r["doc_freq"])
        for r in qs.suggest_terms(index, q, max_edits=2, size=5).collect()
    ]
    cand = []
    for t, postings in oracle.tf.items():
        if t == q:
            continue
        d = _lev(t, q)
        if d <= 2:
            cand.append((d, -len(postings), t))
    cand.sort()
    want = [(t, d, -ndf) for d, ndf, t in cand[:5]]
    assert got == want
    assert got and got[0][0] == "config"


def test_suggest_excludes_exact_match(corpus):
    index, _ = corpus
    got = {r["term"] for r in qs.suggest_terms(index, "config", size=10).collect()}
    assert "config" not in got and got  # neighbors only
