"""Text-analysis operators: language-ID, quality scoring, token
counting, document fingerprinting.

All pure column expressions (JVM codegen) with exact DuckDB-SQL
equivalents so every operator is value-checked by the driver oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from elasticsearch_assets_spark.functions.analyzer import analyze_col

# marker words per language for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]


# GPT-2-style pretokenizer, restricted to constructs Java regex (Spark)
# and RE2 (DuckDB) evaluate IDENTICALLY: contractions, space-prefixed
# letter/digit runs, space-prefixed punctuation runs, whitespace runs.
# The real GPT-2 pattern's trailing-space lookahead (\s+(?!\S)) is
# dropped — RE2 has no lookahead — so this is deliberately "BPE-ish":
# a stable cross-engine token-budget estimator, not a tokenizer.
# explicit whitespace class: Java's \s includes \x0B, RE2's does not —
# spell the class out so both engines see the same set
BPE_ISH_REGEX = (
    "'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+|"
    " ?[^ \t\n\f\rA-Za-z0-9]+|[ \t\n\f\r]+"
)


def token_count(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Token counts: analyzer tokens + whitespace words + BPE-ish
    pretokenizer pieces (the LLM token-budget estimate). (<id>,
    n_tokens, n_words, n_bpe).

    text is coalesced to '' so NULL rows count as 0/1/0 in both
    engines (Spark's size(NULL) is -1, DuckDB's len(NULL) is NULL —
    neither is what a pipeline wants).  n_bpe uses regexp_count
    (Spark >=3.5): counts matches without materializing the piece
    array — at 100 TB doc sizes the allocation matters.
    """
    from ..indexing.arrowtf import ensure_scan_parallelism

    df = ensure_scan_parallelism(df)
    text = F.coalesce(F.col(text_col), F.lit(""))
    return df.select(
        F.col(id_col),
        F.size(analyze_col(text)).alias("n_tokens"),
        F.size(F.split(F.trim(text), r"\s+")).alias("n_words"),
        F.regexp_count(text, F.lit(BPE_ISH_REGEX)).alias("n_bpe"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic quality features + composite score (rounded 4dp):
    - len_chars, n_words
    - mean word length
    - stopword ratio (fluency signal)
    - alpha ratio (symbol-spam signal)
    """
    from ..indexing.arrowtf import ensure_scan_parallelism

    df = ensure_scan_parallelism(df)
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    # materialize the token array as its own projection (r7): `toks`
    # is referenced twice below, and inlined raw it re-ran the full
    # analyzer chain per reference (interpreted — the stop-count
    # lambda keeps this node out of codegen). As a multi-referenced
    # expensive alias, CollapseProject keeps it an attribute.
    base = df.select(F.col(id_col), F.col(text_col), analyze_col(text_col).alias("_toks"))
    toks = F.col("_toks")
    n_words = F.size(words)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    len_chars = F.length(text_col)
    n_alpha = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    mean_wlen = (len_chars - (n_words - 1)) / n_words  # chars excl separators
    stop_ratio = n_stop / F.greatest(F.size(toks), F.lit(1))
    alpha_ratio = n_alpha / F.greatest(len_chars, F.lit(1))
    score = (
        F.least(stop_ratio * 2.0, F.lit(1.0)) * 0.4
        + alpha_ratio * 0.4
        + F.when((n_words >= 10) & (n_words <= 100000), 0.2).otherwise(0.0)
    )
    return base.select(
        F.col(id_col),
        len_chars.alias("len_chars"),
        n_words.alias("n_words"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(score, 4).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Marker-word language ID: argmax over per-language marker hit
    counts; ties and zero evidence → 'und'. (<id>, lang_pred)."""
    # materialized like quality_score's _toks (r7): `toks` is
    # referenced once PER LANGUAGE below — inlined raw, that was
    # len(LANG_MARKERS) interpreted analyzer runs per row.
    from ..indexing.arrowtf import ensure_scan_parallelism

    df = ensure_scan_parallelism(df)
    df = df.select(
        F.col(id_col), analyze_col(text_col).alias("_toks")
    )
    toks = F.col("_toks")
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scores.append(
            F.struct(
                (-hits).alias("neg_hits"),
                F.lit(lang).alias("lang"),
                hits.alias("hits"),
            )
        )
    # argmax, ties → lang asc: sort structs ascending by (-hits, lang)
    best = F.element_at(F.array_sort(F.array(*scores)), 1)
    return df.select(
        F.col(id_col),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["hits"].alias("marker_hits"),
    )


def repetition(
    df: DataFrame, text_col: str, id_col: str, ns: tuple[int, ...] = (2, 3)
) -> DataFrame:
    """Gopher-style within-doc repetition signals (Rae et al. 2021
    appendix A quality filters; the same rules RedPajama/Dolma apply):
    for each n in ``ns``,

    - ``dup_<n>gram_frac``: fraction of the doc's n-grams that repeat
      an earlier occurrence (1 - distinct/total)
    - ``top_<n>gram_frac``: fraction taken by the single most frequent
      n-gram

    Both rounded to 4dp; docs shorter than n tokens score 0.0.

    No shuffle of token data: per-(doc, gram) counting happens inside
    ONE vectorized Arrow stage (arrowtf.encode_gram_stats — gram
    identity via token dictionary-code tuples, lexsort + boundary
    runs), and only three ints per (doc, n) reach the JVM — exploding
    the n-grams into a groupBy would shuffle every token of a 100 TB
    corpus just to compute a per-doc ratio.

    r7: the former all-in-one-Project JVM expression version (windows
    via slice-in-lambda, array_distinct, a sort_array + fold for the
    top-gram run) evaluated INTERPRETED (lambdas disable whole-stage
    codegen, and interpreted projections do no subexpression
    elimination) — a 100x materialized probe did not finish one pass
    in 480 s; the Arrow stage reads 3.4 s warm / 9.6 s cold. The
    fraction arithmetic and HALF_UP rounding are the SAME Spark
    expressions over the same exact integers, so values are
    bit-identical (gate green).
    """
    from ..indexing.arrowtf import encode_gram_stats

    enc = encode_gram_stats(df, text_col, id_col, tuple(ns))
    cols = [F.col(id_col)]
    for n in ns:
        total = F.col(f"_tot{n}")
        dup = F.when(
            total > 0,
            F.lit(1.0) - F.col(f"_dist{n}") / total,
        ).otherwise(F.lit(0.0))
        top = F.when(total > 0, F.col(f"_top{n}") / total).otherwise(F.lit(0.0))
        cols.append(F.round(dup, 4).alias(f"dup_{n}gram_frac"))
        cols.append(F.round(top, 4).alias(f"top_{n}gram_frac"))
    return enc.select(*cols)


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct token set —
    order/whitespace-insensitive content identity. (<id>, fp)."""
    from ..indexing.arrowtf import ensure_scan_parallelism

    df = ensure_scan_parallelism(df)
    toks = F.array_sort(F.array_distinct(analyze_col(text_col)))
    return df.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", toks)).alias("fp"),
    )


# ---------------------------------------------------------------------------
# unigram LM quality scoring (CCNet-style perplexity filtering)
# ---------------------------------------------------------------------------


def unigram_lm(
    df: DataFrame, text_col: str = "text", k_smooth: float = 0.5
) -> DataFrame:
    """Train an add-k-smoothed unigram LM over the corpus: (term,
    count, logp) with logp = ln((count + k) / (total + k * (vocab+1)))
    — the +1 reserves one smoothing slot for OOV terms, so
    ln(k / (total + k * (vocab+1))) is the well-defined unseen-term
    log-probability (pass it as doc_nll's ``oov_logp`` when scoring
    text the LM wasn't trained on).

    One Arrow tf pass + groupBy(term) — the same shuffle as a
    dictionary build; the totals ride a broadcast one-row cross join,
    never a collect. Counts are exact longs (sum of exact per-doc tfs
    == the exploded token count); logp is a single double expression
    over them, so the LM is bit-reproducible across partitionings.

    r7: the token stream comes from arrowtf.encode_tf, not
    explode(analyze_col) — the corpus-wide term counts are identical,
    but the JVM regex analyzer (~4.5 MB/s/core, interpreted when a
    lambda rode along) is replaced by the RE2 batch kernels and the
    shuffle carries per-(doc, term) tf rows instead of every token."""
    from ..indexing.arrowtf import encode_tf

    toks = encode_tf(df, text_col).select(
        F.explode(F.arrays_zip("terms", "tfs")).alias("_z")
    )
    counts = toks.groupBy(F.col("_z.terms").alias("term")).agg(
        F.sum("_z.tfs").alias("count")
    )
    tot = counts.agg(
        F.sum("count").alias("_total"), F.count("*").alias("_vocab")
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "term",
        "count",
        F.log(
            (F.col("count").cast("double") + F.lit(float(k_smooth)))
            / (
                F.col("_total").cast("double")
                + F.lit(float(k_smooth)) * (F.col("_vocab").cast("double") + F.lit(1.0))
            )
        ).alias("logp"),
    )


def doc_nll(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_logp: float | None = None,
) -> DataFrame:
    """Per-document mean negative log-likelihood under a unigram LM —
    the CCNet/Wenzek-et-al. quality signal (high nll = far from the
    reference distribution; pipelines keep the head/middle buckets).
    (<id>, n_tok, nll_per_tok); empty docs are dropped (no tokens = no
    likelihood).

    Shape (r7): per-(doc, term) tf comes straight out of the Arrow
    encoder batch (arrowtf.encode_tf — ZERO shuffles: the former
    explode + groupBy(doc, term) aggregation pass and its shuffle are
    gone, and tf is exact because a doc's tokens never span batches,
    the same invariant the index build relies on) -> join the LM on
    term (AQE broadcasts a small LM; a 10^8-term LM shuffles on the
    term key like any posting join) -> per-doc term-sorted array fold
    of tf * -logp (the scored_terms float protocol: bit-stable across
    shuffle arrival orders). The division by n_tok is the only op
    after the fold.

    ``oov_logp``: log-prob for terms missing from the LM (use the
    reserved-slot value documented in unigram_lm). None = score only
    in-vocabulary tokens (n_tok still counts ALL tokens, so OOV-heavy
    docs read as artificially likely — pass oov_logp when the LM and
    the corpus differ)."""
    from ..indexing.arrowtf import encode_tf

    tf = encode_tf(df, text_col, keep=[id_col]).select(
        F.col(id_col), F.explode(F.arrays_zip("terms", "tfs")).alias("_z")
    ).select(
        id_col,
        F.col("_z.terms").alias("term"),
        F.col("_z.tfs").cast("long").alias("tf"),
    )
    j = tf.join(lm.select("term", "logp"), "term", "left")
    if oov_logp is None:
        # unseen terms contribute 0 likelihood mass but STILL count in
        # n_tok (the denominator is the document's length, not its
        # in-vocabulary length)
        c = F.when(
            F.col("logp").isNotNull(),
            F.col("tf").cast("double") * -F.col("logp"),
        ).otherwise(F.lit(0.0))
    else:
        c = F.col("tf").cast("double") * -F.coalesce(
            F.col("logp"), F.lit(float(oov_logp))
        )
    contrib = j.withColumn("contrib", c)
    g = contrib.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("term", "contrib"))).alias("_cs"),
        F.sum("tf").alias("n_tok"),
    )
    total = F.aggregate("_cs", F.lit(0.0), lambda acc, x: acc + x["contrib"])
    return g.select(
        F.col(id_col),
        F.col("n_tok").cast("long").alias("n_tok"),
        (total / F.col("n_tok").cast("double")).alias("nll_per_tok"),
    )
