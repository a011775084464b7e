"""query/compound.py (dis_max / match_phrase_prefix / function_score
decay) + bool minimum_should_match — all brute-forced against
OracleIndex with the repo's bit-exact float-fold protocol."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.functions.analyzer import analyze_text
from elasticsearch_assets_spark.query import compound as qc
from elasticsearch_assets_spark.query import exec as qx


# ---------------------------------------------------------------------------
# dis_max
# ---------------------------------------------------------------------------


def _oracle_dismax(oracle, subqueries, tie):
    subs = [sorted(set(s)) for s in subqueries]
    per_sub = [oracle.score_terms(s) for s in subs]
    docs = set()
    for ps in per_sub:
        docs.update(ps)
    out = {}
    for d in docs:
        scores = [ps.get(d, (0.0, 0))[0] for ps in per_sub]
        best = max(scores)
        total = scores[0]
        for s in scores[1:]:
            total = total + s
        out[d] = best + tie * (total - best)
    return out


@pytest.mark.parametrize("tie", [0.0, 0.3, 1.0])
def test_dismax_matches_oracle(corpus, tie):
    index, oracle = corpus
    subs = [
        analyze_text("parse_date mergeBatch"),
        analyze_text("return value result"),
    ]
    got = {
        r["doc_id"]: r["score"]
        for r in qc.dis_max_query(index, subs, tie_breaker=tie, k=10**9).collect()
    }
    want = _oracle_dismax(oracle, subs, tie)
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d] == pytest.approx(s, abs=1e-12), d


def test_dismax_tie_zero_is_best_subquery(corpus):
    index, oracle = corpus
    subs = [analyze_text("mergeBatch"), analyze_text("splitKey shard")]
    got = {
        r["doc_id"]: r["score"]
        for r in qc.dis_max_query(index, subs, tie_breaker=0.0, k=10**9).collect()
    }
    a = oracle.score_terms(sorted(set(subs[0])))
    b = oracle.score_terms(sorted(set(subs[1])))
    for d, s in got.items():
        assert s == pytest.approx(
            max(a.get(d, (0.0, 0))[0], b.get(d, (0.0, 0))[0]), abs=1e-12
        )


def test_dismax_topk_ranking(corpus):
    index, oracle = corpus
    subs = [analyze_text("return self"), analyze_text("def import")]
    rows = qc.dis_max_query(index, subs, tie_breaker=0.5, k=7).collect()
    want = sorted(
        _oracle_dismax(oracle, subs, 0.5).items(), key=lambda x: (-x[1], x[0])
    )[:7]
    assert [(r["doc_id"]) for r in rows] == [d for d, _ in want]


def test_dismax_empty_terms(corpus):
    index, _ = corpus
    assert qc.dis_max_query(index, [[]], k=5).count() == 0


# ---------------------------------------------------------------------------
# boosting / constant_score
# ---------------------------------------------------------------------------


def test_boosting_demotes_not_excludes(corpus):
    index, oracle = corpus
    pos = sorted(set(analyze_text("merge batch")))
    neg = sorted(set(analyze_text("return")))
    got = {
        r["doc_id"]: r["score"]
        for r in qc.boosting_query(index, pos, neg, negative_boost=0.25, k=10**9).collect()
    }
    base = oracle.score_terms(pos)
    neg_docs = set(oracle.score_terms(neg))
    assert got.keys() == base.keys()  # nothing excluded
    for d, (s, _) in base.items():
        want = s * 0.25 if d in neg_docs else s
        assert got[d] == pytest.approx(want, abs=1e-12), d
    assert neg_docs & set(got), "fixture went trivial: no demoted docs"


def test_boosting_empty_negative_is_plain_match(corpus):
    index, _ = corpus
    pos = ["merge", "batch"]
    a = qc.boosting_query(index, pos, [], k=10**9).collect()
    b = qx.match_query(index, "merge batch", k=10**9).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]


def test_constant_score(corpus):
    index, oracle = corpus
    terms = ["mergebatch"] + sorted(set(analyze_text("splitKey")))
    got = qc.constant_score_query(index, terms, boost=1.7, k=10**9).collect()
    want = set()
    for t in terms:
        want.update(oracle.tf.get(t, {}))
    assert {r["doc_id"] for r in got} == want
    assert all(r["score"] == 1.7 for r in got)
    # equal scores rank by doc_id asc: top-k = k smallest matching ids
    top3 = qc.constant_score_query(index, terms, boost=1.7, k=3).collect()
    assert [r["doc_id"] for r in top3] == sorted(want)[:3]


def test_constant_score_empty(corpus):
    index, _ = corpus
    assert qc.constant_score_query(index, [], k=5).count() == 0


# ---------------------------------------------------------------------------
# match_phrase_prefix
# ---------------------------------------------------------------------------


def _oracle_phrase_prefix(oracle, text, max_expansions=50):
    terms = analyze_text(text)
    fixed, pref = terms[:-1], terms[-1]
    expanded = sorted(t for t in oracle.tf if t.startswith(pref))[:max_expansions]
    exp_set = set(expanded)
    matched = []
    base = oracle.positions.get(fixed[0], {}) if fixed else {}
    for doc_id, pos0 in base.items():
        starts = set(pos0)
        for i, t in enumerate(fixed[1:], start=1):
            nxt = set(oracle.positions.get(t, {}).get(doc_id, []))
            starts = {p for p in starts if p + i in nxt}
            if not starts:
                break
        # expansion slot: ANY expanded term at p + len(fixed)
        ok = False
        for p in starts:
            slot = p + len(fixed)
            for t in exp_set:
                if slot in set(oracle.positions.get(t, {}).get(doc_id, [])):
                    ok = True
                    break
            if ok:
                break
        if ok:
            matched.append(doc_id)
    scores = oracle.score_terms(sorted(set(fixed)))
    return {d: scores[d][0] for d in matched}


def test_phrase_prefix_matches_oracle(corpus):
    index, oracle = corpus
    # head-token chain + a syllable prefix: guaranteed dense enough to
    # be a meaningful test (asserted non-empty below)
    for text in ("return sel", "def par", "import mer"):
        got = {
            r["doc_id"]: r["score"]
            for r in qc.match_phrase_prefix(index, text, k=10**9).collect()
        }
        want = _oracle_phrase_prefix(oracle, text)
        assert set(got) == set(want), text
        for d, s in want.items():
            assert got[d] == pytest.approx(s, abs=1e-12), (text, d)
    assert _oracle_phrase_prefix(oracle, "return sel"), "fixture went trivial"


def test_phrase_prefix_respects_max_expansions(corpus):
    index, oracle = corpus
    # tiny expansion budget: only the FIRST dictionary term with the
    # prefix participates — oracle mirrors the same truncation
    text = "return pa"
    got = {
        r["doc_id"]
        for r in qc.match_phrase_prefix(index, text, k=10**9, max_expansions=1).collect()
    }
    want = set(_oracle_phrase_prefix(oracle, text, max_expansions=1))
    assert got == want
    full = set(_oracle_phrase_prefix(oracle, text, max_expansions=50))
    assert want <= full


def test_phrase_prefix_single_term_is_prefix_wildcard(corpus):
    index, _ = corpus
    got = qc.match_phrase_prefix(index, "merge", k=10**9).collect()
    want = qx.wildcard_query(index, "merge*", k=10**9).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_phrase_prefix_no_expansion_empty(corpus):
    index, _ = corpus
    assert qc.match_phrase_prefix(index, "return zzzzqqq", k=10).count() == 0


# ---------------------------------------------------------------------------
# function_score decay
# ---------------------------------------------------------------------------


def _eval_decay(spark, value, **kw):
    df = spark.createDataFrame([(float(value),)], "v double")
    return df.select(
        qc.decay_multiplier(F.col("v"), **kw).alias("m")
    ).collect()[0]["m"]


@pytest.mark.parametrize("fn", ["gauss", "exp", "linear"])
def test_decay_anchor_points(spark, fn):
    # ES decay contract: multiplier is 1.0 at the origin (and anywhere
    # inside offset), exactly `decay` at origin +/- (offset + scale)
    kw = dict(origin=10.0, scale=5.0, offset=2.0, decay=0.5, fn=fn)
    assert _eval_decay(spark, 10.0, **kw) == pytest.approx(1.0, abs=1e-12)
    assert _eval_decay(spark, 11.5, **kw) == pytest.approx(1.0, abs=1e-12)
    for v in (10.0 + 2.0 + 5.0, 10.0 - 2.0 - 5.0):
        assert _eval_decay(spark, v, **kw) == pytest.approx(0.5, rel=1e-12), fn


def test_decay_formulas(spark):
    kw = dict(origin=0.0, scale=10.0, offset=0.0, decay=0.5)
    for v in (1.0, 3.7, 25.0):
        sigma2 = -(10.0 * 10.0) / (2.0 * math.log(0.5))
        assert _eval_decay(spark, v, fn="gauss", **kw) == pytest.approx(
            math.exp(-(v * v) / (2.0 * sigma2)), rel=1e-12
        )
        assert _eval_decay(spark, v, fn="exp", **kw) == pytest.approx(
            math.exp(math.log(0.5) / 10.0 * v), rel=1e-12
        )
        s = 10.0 / (1.0 - 0.5)
        assert _eval_decay(spark, v, fn="linear", **kw) == pytest.approx(
            max(0.0, (s - v) / s), rel=1e-12
        )
    # linear clamps to exactly 0 past s (gauss/exp never reach 0)
    assert _eval_decay(spark, 100.0, fn="linear", **kw) == 0.0


def test_decay_unknown_fn_raises(spark):
    with pytest.raises(ValueError):
        _eval_decay(spark, 1.0, origin=0.0, scale=1.0, fn="cosine")


def test_function_score_decay_combines(corpus, spark):
    index, oracle = corpus
    terms = sorted(set(analyze_text("mergeBatch return")))
    scored = qx.scored_terms(index, terms).select("doc_id", "score")
    values = index.doc_norms.select("doc_id", F.col("dl").cast("double").alias("dl"))
    for mode in ("multiply", "sum"):
        got = {
            r["doc_id"]: r["score"]
            for r in qc.function_score_decay(
                scored, values, "dl", origin=40.0, scale=20.0, fn="gauss",
                boost_mode=mode,
            ).collect()
        }
        base = oracle.score_terms(terms)
        sigma2 = -(20.0 * 20.0) / (2.0 * math.log(0.5))
        for d, (s, _) in base.items():
            dist = max(0.0, abs(float(oracle.dl[d]) - 40.0))
            m = math.exp(-(dist * dist) / (2.0 * sigma2))
            want = s * m if mode == "multiply" else s + m
            assert got[d] == pytest.approx(want, rel=1e-9), (mode, d)


# ---------------------------------------------------------------------------
# bool minimum_should_match
# ---------------------------------------------------------------------------


def _oracle_bool_msm(oracle, must, should, msm):
    must = sorted(set(must or []))
    should = sorted(set(should or []))
    scored = oracle.score_terms(sorted(set(must) | set(should)))
    must_scored = oracle.score_terms(must) if must else {}
    should_scored = oracle.score_terms(should)
    out = {}
    for d, (s, _n) in scored.items():
        if must and must_scored.get(d, (0, 0))[1] != len(must):
            continue
        if should_scored.get(d, (0, 0))[1] < msm:
            continue
        out[d] = s
    return out


def test_msm_resolution():
    assert qx.resolve_msm(2, 5) == 2
    assert qx.resolve_msm(9, 5) == 5  # clamped
    assert qx.resolve_msm("50%", 5) == 2  # floor(2.5)
    assert qx.resolve_msm("75%", 4) == 3
    assert qx.resolve_msm("100%", 3) == 3
    with pytest.raises(ValueError):
        qx.resolve_msm("half", 4)
    # ADVICE r6: the ES negative form is unimplemented — fail loudly
    # instead of clamping to match-anything
    with pytest.raises(ValueError):
        qx.resolve_msm(-2, 5)
    with pytest.raises(ValueError):
        qx.resolve_msm("-25%", 4)


@pytest.mark.parametrize("msm", [1, 2, 3, "67%"])
def test_msm_pure_should(corpus, msm):
    index, oracle = corpus
    # rare identifier tokens (df ~31/400 each): the analyzer splits
    # camelCase/underscore names into corpus-wide-common pieces, which
    # made every doc match >=2 — these keep the msm gate biting at
    # every tested level (86/7/1 docs at msm 1/2/3)
    should = sorted(set(analyze_text("index70 retry9 query0")))
    got = {
        r["doc_id"]: r["score"]
        for r in qx.bool_query(
            index, should=should, k=10**9, minimum_should_match=msm
        ).collect()
    }
    want = _oracle_bool_msm(oracle, [], should, qx.resolve_msm(msm, len(should)))
    assert got.keys() == want.keys()
    for d, s in want.items():
        assert got[d] == pytest.approx(s, abs=1e-12)
    # the gate actually bites at msm >= 2 on this fixture
    if qx.resolve_msm(msm, len(should)) >= 2:
        loose = _oracle_bool_msm(oracle, [], should, 1)
        assert len(want) < len(loose)


def test_msm_with_must(corpus):
    index, oracle = corpus
    must = analyze_text("return")
    should = sorted(set(analyze_text("mergeBatch parse_date splitKey")))
    got = {
        r["doc_id"]: r["score"]
        for r in qx.bool_query(
            index, must=must, should=should, k=10**9, minimum_should_match=2
        ).collect()
    }
    want = _oracle_bool_msm(oracle, must, should, 2)
    assert got.keys() == want.keys()
    for d, s in want.items():
        assert got[d] == pytest.approx(s, abs=1e-12)


def test_msm_none_is_backcompat(corpus):
    index, _ = corpus
    should = sorted(set(analyze_text("mergeBatch parse_date")))
    a = qx.bool_query(index, should=should, k=10**9).collect()
    b = qx.bool_query(index, should=should, k=10**9, minimum_should_match=1).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]


def test_dismax_wide_fallback_matches_oracle(corpus):
    """>32 union terms must route through the array-fold fallback
    (VERDICT r6 item 4: a wide multi-field dis_max previously built one
    conditional-sum aggregate per term — plan-compile stall territory)
    and still score bit-identically to the oracle."""
    index, oracle = corpus
    base = [
        "parse", "date", "merge", "batch", "return", "value", "result",
        "index", "retry", "query", "config", "load", "stream", "table",
        "scan", "row", "key", "agg", "spark", "commit", "path", "repo",
        "data", "file", "count", "sum", "filter", "sort", "join", "map",
        "group", "write", "read", "cache", "plan", "stage", "task",
        "shuffle", "bucket", "term", "doc", "score", "rank", "hash",
        "block",
    ]
    assert len(set(base)) > 32
    subs = [sorted(base[:15]), sorted(base[15:30]), sorted(base[30:])]
    got = {
        r["doc_id"]: r["score"]
        for r in qc.dis_max_query(index, subs, tie_breaker=0.4, k=10**9).collect()
    }
    want = _oracle_dismax(oracle, subs, 0.4)
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d] == pytest.approx(s, abs=1e-12), d
    # and the plan must NOT contain a per-term conditional-sum chain:
    # one collect_list aggregate, folds per subquery only
    plan = qc.dis_max_query(index, subs, tie_breaker=0.4, k=10**9)._jdf \
        .queryExecution().optimizedPlan().toString()
    assert "collect_list" in plan
