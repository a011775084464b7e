"""Id-slicer parity: golden behavior shapes from
test/id_reader/slicer-spec.ts (emit-at-top-level, key_range subsets,
descend-on-oversize with zero-prefix pruning) on synthetic keyspaces."""

from __future__ import annotations

import numpy as np
import pytest

from elasticsearch_assets_spark.operators.id_slicer import (
    id_slicer_plan,
    spark_prefix_count_fn,
)


def counts_from_keys(keys):
    arr = np.array(sorted(keys))

    def count(prefix):
        lo = np.searchsorted(arr, prefix, "left")
        hi = np.searchsorted(arr, prefix + "￿", "left")
        return int(hi - lo)

    return count


@pytest.fixture(scope="module")
def hexkeys():
    # deterministic hex uuid-ish keys
    import hashlib

    return [hashlib.md5(str(i).encode()).hexdigest() for i in range(1000)]


def test_top_level_emit(hexkeys):
    # size big enough: one slice per first hex char, in alphabet order
    plan = id_slicer_plan(counts_from_keys(hexkeys), "hexadecimal", size=5000)
    assert [p for p, _ in plan] == list("0123456789abcdef")
    assert sum(c for _, c in plan) == 1000


def test_key_range_subset(hexkeys):
    # slicer-spec.ts 'can call on a subset of keys'
    cf = counts_from_keys(hexkeys)
    plan = id_slicer_plan(cf, "hexadecimal", key_set=["a", "b"], size=5000)
    assert [p for p, _ in plan] == ["a", "b"]
    assert plan[0][1] == cf("a") and plan[1][1] == cf("b")


def test_descend_on_oversize_prunes_zeros(hexkeys):
    # slicer-spec.ts 'can fit slices down to size': small size forces
    # depth-2 descent under oversized prefixes; zero prefixes vanish
    cf = counts_from_keys(hexkeys)
    plan = id_slicer_plan(cf, "hexadecimal", key_set=["a"], size=40)
    assert all(p.startswith("a") and len(p) == 2 for p, _ in plan)
    assert all(0 < c <= 40 for _, c in plan)
    assert sum(c for _, c in plan) == cf("a")
    # DFS order: a0, a1, ... (alphabet order), zeros skipped
    got = [p for p, _ in plan]
    assert got == sorted(got, key=lambda p: "0123456789abcdef".index(p[1]))


def test_starting_key_depth(hexkeys):
    cf = counts_from_keys(hexkeys)
    plan = id_slicer_plan(
        cf, "hexadecimal", key_set=["a"], size=5000, starting_key_depth=2
    )
    # never emits the depth-1 prefix even though it fits
    assert all(len(p) >= 2 for p, _ in plan)
    assert sum(c for _, c in plan) == cf("a")


def test_conservation_total(hexkeys):
    cf = counts_from_keys(hexkeys)
    plan = id_slicer_plan(cf, "hexadecimal", size=37)
    assert sum(c for _, c in plan) == 1000
    assert all(c <= 37 for _, c in plan)


def test_spark_prefix_count_fn(spark):
    from pyspark.sql import functions as F

    df = spark.range(500).select(F.md5(F.col("id").cast("string")).alias("k"))
    cf = spark_prefix_count_fn(df, "k")
    total = sum(cf(c) for c in "0123456789abcdef")
    assert total == 500
    plan = id_slicer_plan(cf, "hexadecimal", size=25)
    assert sum(c for _, c in plan) == 500
