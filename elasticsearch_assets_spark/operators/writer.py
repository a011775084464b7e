"""Bulk-writer semantics (SURVEY.md §2.2, K1) as DataFrame transforms.

The reference's ElasticsearchBulkSender translates records into bulk
actions evaluated by ES (ElasticsearchBulkSender.ts:49-171). Here each
action is a pure merge of (target, source) keyed by doc_id — the
DataFrame equivalent of Iceberg MERGE INTO. Persisted tables use
snapshot directories (plans/table.py) so writes are atomic and
resumable.

Action semantics (K1.a-K1.e):
- index   : source replaces matched target rows, inserts the rest
- create  : insert only where key absent (put-if-absent)
- update  : replace matched rows only (optionally a column subset)
- upsert  : update + insert
- delete  : remove matched keys
- dual-yield _delete_id: one pass that inserts the new key and deletes
  the old key (ElasticsearchBulkSender.ts:55-62)
- routing : `route` column → partitionBy on write (createRoute :37-47)

Deployment note (100 TB): these merges rewrite the whole target frame
per batch — correct and fine for the sandbox's snapshot tables, where
StateStorage amortizes it LSM-style (delta writes + periodic
compaction). On a production lakehouse, map each merge_* 1:1 onto the
transactional table format's keyed merge (Iceberg/Delta `MERGE INTO
target USING batch ON target.key = batch.key WHEN MATCHED ... WHEN NOT
MATCHED INSERT`), which applies the identical per-key semantics with
file-level rewrites only. The semantics contract tested here is
format-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dedup_last(source: DataFrame, key: str) -> DataFrame:
    """Bulk batches apply in order; for a keyed merge the LAST action
    per key wins (ES bulk semantics). Requires a `_seq` column; if
    absent, source is assumed already unique per key."""
    if "_seq" not in source.columns:
        return source
    w = source.groupBy(key).agg(F.max("_seq").alias("_seq"))
    return source.join(w, [key, "_seq"], "inner").drop("_seq")


def merge_index(target: DataFrame, source: DataFrame, key: str = "doc_id") -> DataFrame:
    """K1.a `index`: full-document replace-or-insert."""
    src = _dedup_last(source, key)
    kept = target.join(src.select(key), key, "left_anti")
    return kept.unionByName(src.select(target.columns))


def merge_create(target: DataFrame, source: DataFrame, key: str = "doc_id") -> DataFrame:
    """K1.b `create`: put-if-absent — existing keys are NOT replaced."""
    src = _dedup_last(source, key)
    new = src.join(target.select(key), key, "left_anti")
    return target.unionByName(new.select(target.columns))


def merge_update(
    target: DataFrame,
    source: DataFrame,
    key: str = "doc_id",
    update_fields: list[str] | None = None,
) -> DataFrame:
    """K1.c/K1.e `update`: replace matched rows; with update_fields,
    only that column subset changes (applyUpdateFields :129-137)."""
    src = _dedup_last(source, key)
    if update_fields is None:
        updated = src.join(target.select(key), key, "left_semi")
        untouched = target.join(src.select(key), key, "left_anti")
        return untouched.unionByName(updated.select(target.columns))
    # column-subset update: join and coalesce chosen columns
    renames = {c: f"_src_{c}" for c in update_fields}
    src2 = src.select(key, *[F.col(c).alias(renames[c]) for c in update_fields])
    joined = target.join(src2, key, "left")
    cols = []
    for c in target.columns:
        if c in renames:
            cols.append(F.coalesce(F.col(renames[c]), F.col(c)).alias(c))
        else:
            cols.append(F.col(c))
    return joined.select(*cols)


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str = "doc_id",
    update_fields: list[str] | None = None,
) -> DataFrame:
    """K1.c `upsert`: update matched + insert unmatched (:105-108)."""
    updated = merge_update(target, source, key, update_fields)
    src = _dedup_last(source, key)
    new = src.join(target.select(key), key, "left_anti")
    return updated.unionByName(new.select(target.columns))


def merge_script(
    target: DataFrame,
    source: DataFrame,
    set_exprs: dict,
    key: str = "doc_id",
    param_prefix: str = "param_",
) -> DataFrame:
    """K1.f scripted update: the reference's "very simple" painless
    scripts (`ctx._source.field = ... params.x ...`,
    ElasticsearchBulkSender.ts:139-151 applyScript + script_params)
    expressed as Column expressions.

    Matched target rows get each column in `set_exprs` recomputed from
    the expression; source columns are visible inside the expressions as
    `param_<col>` (the script_params binding). Unmatched rows pass
    through unchanged — ES update-with-script touches existing docs only.
    """
    src = _dedup_last(source, key)
    params = src.select(
        key,
        F.lit(True).alias("_matched"),
        *[
            F.col(c).alias(f"{param_prefix}{c}")
            for c in src.columns
            if c != key
        ],
    )
    joined = target.join(params, key, "left")
    matched = F.coalesce(F.col("_matched"), F.lit(False))
    cols = []
    for c in target.columns:
        if c in set_exprs:
            cols.append(F.when(matched, set_exprs[c]).otherwise(F.col(c)).alias(c))
        else:
            cols.append(F.col(c))
    return joined.select(*cols)


def merge_delete(target: DataFrame, deletes: DataFrame, key: str = "doc_id") -> DataFrame:
    """K1.d `delete`: anti-join removal."""
    return target.join(deletes.select(key), key, "left_anti")


def apply_dual_yield(
    target: DataFrame, source: DataFrame, key: str = "doc_id",
    delete_id_col: str = "_delete_id",
) -> DataFrame:
    """K1.d dual-yield: each source row upserts its new key AND deletes
    its old key (metadata `_delete_id`) in the same pass —
    ElasticsearchBulkSender.ts:55-62."""
    deletes = (
        source.where(F.col(delete_id_col).isNotNull())
        .select(F.col(delete_id_col).alias(key))
        .distinct()
    )
    upserts = source.drop(delete_id_col)
    merged = merge_index(target, upserts, key)
    return merge_delete(merged, deletes, key)


REJECTION_COL = "_bulk_sender_rejection"


def mark_rejections(
    source: DataFrame,
    rules: dict[str, Column],
    reason_col: str = REJECTION_COL,
) -> DataFrame:
    """Stamp the reference's `_bulk_sender_rejection` metadata
    (set per-item by the bulk client on unretryable errors; observed by
    asset/src/elasticsearch_bulk/processor.ts:39-45). In Spark the
    "unretryable error" is a validation predicate evaluated before the
    merge: `rules` maps reason text → boolean Column, first matching
    rule wins, non-matching rows get NULL (not rejected)."""
    expr = F.lit(None).cast("string")
    for reason, cond in reversed(list(rules.items())):
        expr = F.when(cond, F.lit(reason)).otherwise(expr)
    return source.withColumn(reason_col, expr)


def split_rejections(
    source: DataFrame,
    dead_letter_action: str = "kafka_dead_letter",
    reason_col: str = REJECTION_COL,
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter split (processor.ts:34-50 onBatch): records carrying
    a non-null rejection reason are routed to the dead-letter frame —
    but ONLY when `_dead_letter_action` is 'kafka_dead_letter'; under
    the default 'none' the reference never calls rejectRecord and the
    records stay in the batch, so both frames reflect that.

    Returns (accepted, rejected). `accepted` drops the metadata column
    (it was transport metadata, not document data); `rejected` keeps
    every source column plus the reason — the dead-letter queue payload
    is (doc, err), mirrored by the processor-spec golden
    (test/elasticsearch_bulk/processor-spec.ts:198-241). One plan each,
    no collect: at scale both sides are written as ordinary frames
    (accepted → the merge, rejected → the DLQ sink)."""
    if reason_col not in source.columns:
        source = source.withColumn(reason_col, F.lit(None).cast("string"))
    if dead_letter_action != "kafka_dead_letter":
        return source.drop(reason_col), source.where(F.lit(False)).limit(0)
    accepted = source.where(F.col(reason_col).isNull()).drop(reason_col)
    rejected = source.where(F.col(reason_col).isNotNull())
    return accepted, rejected


def write_routed(df: DataFrame, path: str, route_col: str = "route") -> None:
    """K1.h dynamic routing index-{route}: route becomes a partition
    directory — the Spark-native equivalent of suffix-routed indices."""
    df.write.mode("overwrite").partitionBy(route_col).parquet(path)
