"""Sequence chunking and shard packing for LLM training pipelines.

Two operators a 100 TB pre-training corpus needs between "cleaned
documents" and "training shards":

- ``chunk_tokens``: split each document's token stream into fixed-size
  context windows (the per-document half of sequence packing — long
  docs become ceil(n/window) training examples). Pure higher-order
  array expressions over the analyzed token array: posexplode of a
  per-doc index sequence + slice — NARROW (no shuffle), linear in total
  tokens, and the output rows carry only window metadata + boundary
  tokens, never re-materialized text.

- ``pack_bins``: assign documents to fixed-token-budget training shards
  ("bins") deterministically. A single global greedy pack is inherently
  sequential, so the deterministic-and-parallel shape is: route each
  doc to one of ``n_buckets`` independent packing streams by content
  hash (the sampling.hash_bucket md5 protocol — partition-independent,
  engine-portable), order each stream by (hash, id), and next-fit pack
  with a per-stream cumulative token sum: bin = floor(cum_before /
  max_tokens). Each stream's window is independent — parallelism =
  n_buckets (set it to O(executors) at scale; the per-stream window
  sees corpus/n_buckets rows). The assignment is a pure function of
  (id, token_count, seed): stable under repartitioning and incremental
  re-runs, which is what makes shard manifests reproducible.

Both mirror bit-identically in DuckDB (list ops + window functions over
the same md5-derived ordering) for the driver's value gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.analyzer import analyze_col
from .sampling import hash_bucket


def chunk_tokens(
    df: DataFrame,
    window: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    stride: int | None = None,
) -> DataFrame:
    """One row per (doc, context-window): ``chunk_id`` (0-based),
    ``n_tok`` (window size, smaller for the tail chunk), ``first_tok``
    / ``last_tok`` (the window's boundary tokens — enough to pin the
    split points without shipping the window text). Empty docs produce
    zero chunks. Tokens come from the repo analyzer, so the chunking is
    the one the index/BM25 layer already agrees on with DuckDB.

    ``stride`` (default = window, i.e. disjoint windows) < window gives
    OVERLAPPING windows — the sliding-context shape LLM training uses
    so no next-token target is ever conditioned on a truncated prefix.
    Chunk c covers tokens [c*stride, c*stride + window); starts range
    over 0..floor((n-1)/stride) (every token is covered, no chunk
    starts past the end)."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if stride is None:
        stride = window
    if not 1 <= stride <= window:
        raise ValueError(f"stride must be in [1, window], got {stride}")
    from ..indexing.arrowtf import ensure_scan_parallelism

    # zero-KEY-shuffle stays the contract; the only exchange ever added
    # is the adaptive round-robin when the input scan has fewer splits
    # than cores (single-row-group files serialize the analyzer pass —
    # r7, same guard as build_index; no-op on well-split input)
    base = ensure_scan_parallelism(df.select(F.col(id_col), F.col(text_col)))
    toks = base.select(F.col(id_col), analyze_col(text_col).alias("_toks")).withColumn(
        "_n", F.size("_toks")
    )
    # F.sequence(0, x) DESCENDS for x < 0 (CLAUDE.md) — empty docs must
    # not reach the chunk-index sequence. r7: the guard is a NULL
    # sequence + explode_outer + a filter on the GENERATOR OUTPUT, not
    # a `where(_n > 0)` on the input rows. The row-filter version let
    # PushPredicateThroughProject + InferFiltersFromGenerate re-inline
    # the full analyzer chain THREE more times into an interpreted
    # pre-Generate Filter node (measured 24.3 s -> 11.6 s at the 100x
    # probe from this fix alone, -> 2.1 s with the scan-parallelism
    # guard below; plan: 12 regexp_replace -> 3, all whole-stage
    # codegen); a filter on chunk_id cannot be pushed below the
    # Generate that produces it, and explode_outer infers no generator
    # filters, so the analyzer runs once per row.
    idx = toks.withColumn(
        "_idx",
        F.when(
            F.col("_n") > 0,
            F.sequence(
                F.lit(0), ((F.col("_n") - 1) / F.lit(stride)).cast("int")
            ),
        ),
    )
    c = idx.select(
        id_col, "_toks", "_n", F.explode_outer("_idx").alias("chunk_id")
    ).where(F.col("chunk_id").isNotNull())
    start = F.col("chunk_id") * F.lit(stride)
    n_tok = F.least(F.lit(window), F.col("_n") - start)
    return c.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        n_tok.cast("long").alias("n_tok"),
        F.element_at("_toks", (start + 1).cast("int")).alias("first_tok"),
        F.element_at("_toks", (start + n_tok).cast("int")).alias("last_tok"),
    )


def pack_bins(
    df: DataFrame,
    max_tokens: int,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "pack",
) -> DataFrame:
    """Deterministic next-fit shard assignment: each doc gets
    (``bucket``, ``bin``, ``n_tok``) where bin = floor(cumulative
    tokens BEFORE this doc / max_tokens) within its hash bucket's
    (hash, id) order. Docs longer than max_tokens still land in exactly
    one bin (chunk_tokens is the splitter for those — compose them).

    The window partitions by bucket: per-stream state never crosses
    buckets, so the sort is n_buckets independent O((n/b) log(n/b))
    sorts, not one global order — the packing equivalent of bucketed
    layout. Raising n_buckets trades shard-fill smoothness for
    parallelism; both are deterministic."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    base = df.select(
        F.col(id_col),
        # null text -> 0 tokens (the dl discipline: size(NULL) is NULL
        # under ANSI and would poison the cumulative sum)
        F.coalesce(F.size(analyze_col(text_col)), F.lit(0)).alias("n_tok"),
        F.pmod(hash_bucket(id_col, seed), F.lit(n_buckets)).alias("bucket"),
        hash_bucket(id_col, seed + ":order").alias("_ord"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.asc("_ord"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    return base.select(
        id_col,
        "bucket",
        F.floor(cum_before / F.lit(max_tokens)).cast("long").alias("bin"),
        F.col("n_tok").cast("long").alias("n_tok"),
    )
