"""Parity-mode id slicer (SURVEY.md I2): prefix-tree descent over a
keyword keyspace, re-implemented from the reference's observable
behavior (algorithms/idSlicer.ts:7-175 generator protocol):

    count(prefix*) > size → descend one character deeper
    count == 0            → prune the subtree
    else                  → emit {keys: [prefix], count}

with `starting_key_depth` forcing descent before the first count
(recurseDepth), and `key_set` restricting the top level (key_range).

The declarative engine replaces this with hash/range repartition + AQE
(operators/reader.py id_slice_counts); this walk exists for slice-plan
parity, verified by the golden shapes in test/id_reader/slicer-spec.ts
(emit-at-top, subset key_range, descend-on-size, zero-prefix pruning).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from elasticsearch_assets_spark.operators.reader import ALPHABETS


def id_slicer_plan(
    count_fn: Callable[[str], int],
    key_type: str = "hexadecimal",
    key_set: Sequence[str] | None = None,
    size: int = 5000,
    starting_key_depth: int = 0,
    max_depth: int = 32,
) -> list[tuple[str, int]]:
    """DFS emit order identical to the reference's generators."""
    alphabet = ALPHABETS[key_type]
    keys = list(key_set) if key_set else list(alphabet)
    out: list[tuple[str, int]] = []

    def walk(prefix: str) -> None:
        if len(prefix) < starting_key_depth:
            for ch in alphabet:
                walk(prefix + ch)
            return
        c = count_fn(prefix)
        if c == 0:
            return
        if c > size and len(prefix) < max_depth:
            for ch in alphabet:
                walk(prefix + ch)
            return
        out.append((prefix, c))

    for k in keys:
        walk(k)
    return out


def spark_prefix_count_fn(df, key_col: str) -> Callable[[str], int]:
    """Driver-side prefix-count oracle: collect the sorted key list once,
    then each count is two searchsorted calls (the reference pays one ES
    wildcard count per tree node)."""
    import numpy as np

    keys = np.array(
        sorted(r[0] for r in df.select(key_col).collect() if r[0] is not None)
    )

    def count(prefix: str) -> int:
        lo = np.searchsorted(keys, prefix, "left")
        hi = np.searchsorted(keys, prefix + "￿", "left")
        return int(hi - lo)

    return count
