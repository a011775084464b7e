"""Deterministic synthetic source-code corpus (FIXTURES.md T1).

Shape is exactly the BASELINE.json input hint:
    (repo:string, path:string, commit:string, lang:string, content:string)

Pure function of (seed, n): every run — and every parallelism level —
sees identical bytes, which is what makes the rank-parity oracle and the
local[8]-vs-local[32] scaling benchmark meaningful.

Content is synthetic code text with a Zipf token distribution: head
tokens ("return", "self", "def", ...) appear in nearly every document
(exercising hot-term skew, the 10^12-file killer per SURVEY.md §7), and
each document carries a unique token ``uniq_{i}`` (exercising exact
long-tail top-k).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

LANGS = ["py", "js", "ts", "go", "java", "rs", "c", "md"]
LANG_WEIGHTS = np.array([0.25, 0.18, 0.14, 0.12, 0.12, 0.08, 0.06, 0.05])
EXT_FOR_LANG = dict(zip(LANGS, ["py", "js", "ts", "go", "java", "rs", "c", "md"]))

# Head vocabulary: very frequent code tokens.
HEAD_TOKENS = [
    "return", "self", "def", "int", "if", "for", "import", "string",
    "value", "result", "data", "err", "func", "const", "let", "var",
]

_SYLLABLES = [
    "parse", "read", "write", "index", "query", "merge", "split", "batch",
    "token", "score", "rank", "shard", "slice", "fetch", "count", "range",
    "key", "date", "doc", "term", "post", "norm", "hash", "salt", "block",
    "max", "min", "sum", "avg", "util", "config", "client", "server",
    "stream", "window", "state", "cache", "bulk", "route", "retry", "hole",
]


def _vocab(size: int, rng: np.random.Generator) -> list[str]:
    """Deterministic ~`size` mixed camelCase/snake_case identifiers."""
    out: list[str] = []
    n_syll = len(_SYLLABLES)
    i = 0
    while len(out) < size:
        a = _SYLLABLES[i % n_syll]
        b = _SYLLABLES[(i * 7 + 3) % n_syll]
        c = _SYLLABLES[(i * 13 + 5) % n_syll]
        style = i % 4
        if style == 0:  # camelCase
            out.append(a + b.capitalize())
        elif style == 1:  # snake_case
            out.append(f"{a}_{b}")
        elif style == 2:  # three-part camel
            out.append(a + b.capitalize() + c.capitalize())
        else:  # plain
            out.append(a + str(i % 97))
        i += 1
    return out[:size]


def generate_corpus_pandas(n: int, seed: int = 42) -> pd.DataFrame:
    """Generate the corpus as a pandas DataFrame (driver-side; used for
    unit scales). Identical rows to :func:`generate_corpus` — both call
    :func:`_generate_rows`, which is a pure function of (row_index, seed).
    """
    return _generate_rows(0, n, seed)


def generate_corpus(spark, n: int, seed: int = 42, partitions: int | None = None):
    """Distributed deterministic corpus: each partition generates its own
    row range from (seed, row_index) only — no driver materialization, so
    this scales to bench sizes and is identical at any parallelism.
    """
    from pyspark.sql import types as T

    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism

    schema = T.StructType(
        [
            T.StructField("repo", T.StringType(), False),
            T.StructField("path", T.StringType(), False),
            T.StructField("commit", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
            T.StructField("content", T.StringType(), False),
        ]
    )

    def gen_range(it):
        for pdf in it:
            for _, r in pdf.iterrows():
                lo, hi = int(r["lo"]), int(r["hi"])
                sub = _generate_rows(lo, hi, seed)
                yield sub

    bounds = []
    step = max(1, n // partitions)
    lo = 0
    while lo < n:
        hi = min(n, lo + step)
        bounds.append((lo, hi))
        lo = hi
    bdf = spark.createDataFrame(pd.DataFrame(bounds, columns=["lo", "hi"]))
    return bdf.repartition(len(bounds)).mapInPandas(gen_range, schema=schema)


def _generate_rows(lo: int, hi: int, seed: int) -> pd.DataFrame:
    """Rows [lo, hi) — identical regardless of partitioning because each
    row i uses rng(seed + i)."""
    rng0 = np.random.default_rng(seed)
    vocab = HEAD_TOKENS + _vocab(5000, rng0)
    vocab_arr = np.array(vocab)
    v = len(vocab)
    ranks = np.arange(1, v + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.07
    cum = np.cumsum(probs / probs.sum())
    lang_cum = np.cumsum(LANG_WEIGHTS / LANG_WEIGHTS.sum())

    rows = []
    for i in range(lo, hi):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        lang = LANGS[int(np.searchsorted(lang_cum, rng.random()))]
        # file component includes i verbatim: (repo, path) must be unique
        # per row or doc_id = xxhash64(repo,path,commit) collides at
        # large n (periodic i%k pairs) and corrupts dl/tf merging
        path = (
            f"src/module_{i % 53}/util/file_{i}.{EXT_FOR_LANG[lang]}"
            if i % 3
            else f"lib/pkg_{i % 29}/core_{i}.{EXT_FOR_LANG[lang]}"
        )
        repo = f"org{i % 37}/proj{i % 211}"
        commit = hashlib.sha1(f"{seed}:{repo}:{path}".encode()).hexdigest()
        doc_len = int(rng.integers(30, 300))
        # inverse-CDF sampling (searchsorted) — O(log v) per token,
        # ~100x faster than rng.choice(p=...) at these sizes
        toks = vocab_arr[np.searchsorted(cum, rng.random(doc_len))]
        content = (
            f"import src.module_{i % 53}.util\n"
            + " ".join(toks.tolist())
            + f"\nuniq_{i} = loadConfig()"
        )
        rows.append((repo, path, commit, lang, content))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
