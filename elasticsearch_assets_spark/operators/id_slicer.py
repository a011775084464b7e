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
    retry_key: str | None = None,
    conserve_exact: bool = True,
) -> list[tuple[str, int]]:
    """DFS emit order identical to the reference's generators.
    retry_key resumes AFTER the given key (idSlicer-refactor.ts:77-98 —
    the I4 retry fast-forward), matching the 'can return to previous
    position' golden (test/id_reader/slicer-spec.ts:429-448).

    conserve_exact (engine extension, default on): docs whose key IS an
    over-`size` prefix match `prefix*` but no child `prefixX*` — the
    reference's wildcard descent silently loses them on variable-length
    keyspaces. They emit as a `prefix$` exact-key slice, derived from
    the subtree's emitted sum (zero extra count calls). No-op on
    fixed-length (uuid-style) keyspaces, so all reference goldens are
    unchanged; set False to pin the raw reference protocol against
    scripted (non-conservative) count sequences."""
    alphabet = ALPHABETS[key_type]
    keys = list(key_set) if key_set else list(alphabet)
    out: list[tuple[str, int]] = []
    skipping = retry_key is not None

    def walk(prefix: str) -> None:
        nonlocal skipping
        if skipping:
            if retry_key.startswith(prefix) and prefix != retry_key:
                for ch in alphabet:
                    walk(prefix + ch)
            elif prefix == retry_key:
                skipping = False
            return
        c = count_fn(prefix)
        if c == 0:
            return
        if c > size and len(prefix) < max_depth:
            before = len(out)
            for ch in alphabet:
                walk(prefix + ch)
            # exact-key remainder: docs whose key IS the prefix are
            # matched by `prefix*` but by NO child `prefixX*` — the
            # reference's wildcard descent silently loses them. Derived
            # from the subtree's emitted sum (ZERO extra count calls, so
            # the reference's scripted count-call sequence is
            # preserved); only possible on variable-length keyspaces —
            # uuid-style fixed-length keys always sum exactly, so golden
            # plans are unchanged. Emitted as `prefix$`, an exact-key
            # slice (engine extension for data conservation). Skipped
            # under retry resume: a partial subtree sum would inflate it.
            if conserve_exact and retry_key is None:
                sub = sum(cnt for _, cnt in out[before:])
                if sub < c:
                    out.append((prefix + "$", c - sub))
            return
        out.append((prefix, c))

    for k in keys:
        if starting_key_depth > 0:
            # generateKeyDepth/recurseDepth (idSlicer.ts:129-175): the
            # bare start key is NEVER counted; first-level children at
            # the depth are normal nodes, shallower ones hand their
            # children to the normal walk (no further depth checks)
            for ch in alphabet:
                child = k + ch
                if len(child) >= starting_key_depth:
                    walk(child)
                else:
                    for ch2 in alphabet:
                        walk(child + ch2)
        else:
            walk(k)
    return out


# ---------------------------------------------------------------------------
# I3 idSlicerOptimized: char-class range chunking
# (algorithms/idSlicer-refactor.ts:9-286 + id-utils/chunkers/
#  key-chunkers.ts:1-70 + key-manager.ts:9-80)
# ---------------------------------------------------------------------------

# chunker sections per key type (key-manager.ts:13-41): classes never
# span a section boundary (numerics vs letter chars vs specials)
_SECTIONS = {
    "hexadecimal": [list("0123456789"), list("abcdef")],
    "HEXADECIMAL": [list("0123456789"), list("ABCDEF")],
    "base64url": [
        [chr(c) for c in range(ord("A"), ord("Z") + 1)],
        [chr(c) for c in range(ord("a"), ord("z") + 1)],
        list("0123456789"),
        ["-", "_"],  # SpecialKeyChunker: chars joined, no '-' range
    ],
    "base64": [
        [chr(c) for c in range(ord("A"), ord("Z") + 1)],
        [chr(c) for c in range(ord("a"), ord("z") + 1)],
        list("0123456789"),
        ["-", "_", "+", "/"],
    ],
}
_SPECIAL_SECTION = {"base64url": 3, "base64": 3}


class _SplitKeyManager:
    """key-manager.ts SplitKeyManager: deal `num` chars across the
    section chunkers in order, as (display, chars) — display is the
    reference's printable char-class ('8-9a-b' → '[8-9a-b]')."""

    def __init__(self, key_type: str):
        self.sections = _SECTIONS[key_type]
        self.special = _SPECIAL_SECTION.get(key_type, -1)
        self.idx = [0] * len(self.sections)
        self.took: list[int] = []
        self.called: list[int] = []

    def split(self, num: int) -> tuple[str, list[str]]:
        self.called = []
        self.took = [0] * len(self.sections)
        left = num
        display = ""
        chars: list[str] = []
        for si, sec in enumerate(self.sections):
            if self.idx[si] >= len(sec):
                continue
            end = min(self.idx[si] + left, len(sec))
            take = sec[self.idx[si] : end]
            if si == self.special:
                # safeRegexChars (id-utils/utils.ts:3-7): escape - and +
                part = "".join("\\" + c if c in "-+" else c for c in take)
            elif len(take) == 1:
                part = take[0]
            else:
                part = f"{take[0]}-{take[-1]}"
            display += part
            chars.extend(take)
            self.took[si] = len(take)
            self.called.append(si)
            left -= len(take)
            if left <= 0:
                break
        if display:
            display = f"[{display}]"
        return display, chars

    def commit(self) -> None:
        for si in self.called:
            self.idx[si] += self.took[si]


def _create_ratio(size: int, alphabet_len: int):
    """idSlicer-refactor.ts:269-286 createRatioFN: False → plain
    per-char recursion; int → char-class chunk size."""

    def ratio(count: int):
        if count >= size * alphabet_len:
            return False
        r = (alphabet_len * size) // count
        if r <= 1:
            return False
        return r

    return ratio


def id_slicer_plan_optimized(
    class_count_fn: Callable[[str, Sequence[str] | None], int],
    key_type: str = "hexadecimal",
    key_set: Sequence[str] | None = None,
    size: int = 5000,
    starting_key_depth: int = 0,
    retry_key: str | None = None,
    conserve_exact: bool = True,
) -> list[tuple[str, int]]:
    """I3 idSlicerOptimized as a plan: emit (key_expr, count) where
    key_expr is the reference's printable slice key — a bare prefix or
    prefix + char-class like '0[8-9a-b]' (idSlicer-refactor.ts:149-211
    splitKeys + chunkers). Mirrors the reference generator protocol:

    - count > size → ratio = floor(alphabet·size/count); chunk the
      remaining alphabet into `ratio`-char classes
    - an over-counting class shrinks: new = floor(ratio·resp/alphabet)
      with resp = floor(alphabet·size/class_count); if not smaller than
      the current chunk, decrement by 1 instead (:190-204)
    - a single-char class that still over-counts recurses one char
      deeper (:183-188); count ≥ size·alphabet or ratio ≤ 1 → plain
      per-char recursion (:269-286)
    - zero-count prefixes/classes are pruned

    class_count_fn(prefix, chars): docs starting with `prefix` whose
    next char is in `chars` (chars=None → bare prefix count).
    """
    alphabet = ALPHABETS[key_type]
    keys = list(key_set) if key_set else list(alphabet)
    ratio_fn = _create_ratio(size, len(alphabet))
    out: list[tuple[str, int]] = []
    skipping = retry_key is not None

    def emit(expr: str, count: int) -> None:
        out.append((expr, count))

    def handle(prefix: str) -> None:
        """determineKeySlice for a bare prefix key."""
        nonlocal skipping
        if skipping:
            # keyGenerator retry fast-forward (:77-98): skip subtrees
            # that cannot contain retry_key; resume after it
            if retry_key.startswith(prefix) and prefix != retry_key:
                for ch in alphabet:
                    handle(prefix + ch)
                return
            if prefix == retry_key:
                skipping = False
            return
        c = class_count_fn(prefix, None)
        if c == 0:
            return
        if c > size:
            before = len(out)
            r = ratio_fn(c)
            if r is False:
                for ch in alphabet:
                    handle(prefix + ch)
            else:
                split_keys(prefix, r)
            # exact-key remainder from the subtree's emitted sum — same
            # data-conservation extension as id_slicer_plan.walk (zero
            # extra count calls, so the reference's scripted count-call
            # sequence stays exact; dangling == 0 on fixed-length
            # keyspaces so golden plans are unchanged)
            if conserve_exact and retry_key is None:
                sub = sum(cnt for _, cnt in out[before:])
                if sub < c:
                    emit(prefix + "$", c - sub)
            return
        emit(prefix, c)

    def split_keys(prefix: str, ratio: int) -> None:
        """splitKeys (:149-211) — iterative char-class walk."""
        tracker = _SplitKeyManager(key_type)
        chunk = ratio
        # NB: the reference does NOT reset these at loop top (:158-177);
        # mirrored for exactness
        limit_of_splitting = False
        next_key = ""
        while True:
            display, chars = tracker.split(chunk)
            if not display:
                return
            if len(display) == 3:
                limit_of_splitting = True
                next_key = display[1]
            elif len(display) == 4 and "\\" in display:
                limit_of_splitting = True
                next_key = display[2]
            c = class_count_fn(prefix, chars)
            if c > size:
                if limit_of_splitting:
                    # this descent skips the (prefix + next_key) node —
                    # its exact-key remainder must be accounted HERE or
                    # the outer node would mis-attribute those docs to
                    # its own `$` slice (see conserve_exact notes)
                    before = len(out)
                    for ch in alphabet:
                        handle(prefix + next_key + ch)
                    if conserve_exact and retry_key is None:
                        sub = sum(cnt for _, cnt in out[before:])
                        if sub < c:
                            emit(prefix + next_key + "$", c - sub)
                    tracker.commit()
                else:
                    resp = ratio_fn(c)
                    if resp is False:
                        # can't happen for a class ⊆ an in-ratio parent;
                        # mirror the reference (non-number → commit)
                        tracker.commit()
                        continue
                    new_chunk = max((ratio * resp) // len(alphabet), 1)
                    if chunk <= new_chunk:
                        chunk -= 1
                    else:
                        chunk = new_chunk
            elif c != 0:
                emit(f"{prefix}{display}", c)
                tracker.commit()
            else:
                tracker.commit()

    for k in keys:
        if starting_key_depth > 0:
            # generateKeyDepth/recurseDepth (:213-236,256-267): the bare
            # start key is NEVER counted; first-level children at the
            # depth are normal nodes, shallower ones hand their children
            # straight to the normal walk
            for ch in alphabet:
                child = k + ch
                if len(child) >= starting_key_depth:
                    handle(child)
                else:
                    for ch2 in alphabet:
                        handle(child + ch2)
        else:
            handle(k)
    return out


def class_count_fn_from_keys(all_keys: Sequence[str]):
    """Count oracle over an in-memory key list (tests/parity runs)."""
    keys = sorted(all_keys)

    def count(prefix: str, chars: Sequence[str] | None) -> int:
        import bisect

        if chars is None:
            lo = bisect.bisect_left(keys, prefix)
            hi = bisect.bisect_left(keys, prefix + "￿")
            return hi - lo
        total = 0
        for ch in chars:
            p = prefix + ch
            lo = bisect.bisect_left(keys, p)
            hi = bisect.bisect_left(keys, p + "￿")
            total += hi - lo
        return total

    return count


def spark_prefix_count_fn(
    df, key_col: str, max_rows: int | None = None
) -> Callable[[str], int]:
    """Driver-side prefix-count oracle: collect the sorted key list once,
    then each count is two searchsorted calls (the reference pays one ES
    wildcard count per tree node). Parity mode ONLY — refuses above
    `max_rows` (reader.id_slice_counts is the declarative path)."""
    import numpy as np

    from elasticsearch_assets_spark.operators.date_slicer import (
        PARITY_COLLECT_MAX_ROWS,
        _guard_parity_collect,
    )

    _guard_parity_collect(
        df, max_rows or PARITY_COLLECT_MAX_ROWS, "reader.id_slice_counts"
    )
    keys = np.array(
        sorted(r[0] for r in df.select(key_col).collect() if r[0] is not None)
    )

    def count(prefix: str) -> int:
        lo = np.searchsorted(keys, prefix, "left")
        hi = np.searchsorted(keys, prefix + "￿", "left")
        return int(hi - lo)

    return count


def spark_class_count_fn(df, key_col: str, max_rows: int | None = None):
    """Driver-side char-class count oracle for the I3 walk: same
    collect-once strategy as spark_prefix_count_fn (parity mode only —
    the declarative engine path is reader.id_slice_counts). Refuses
    above `max_rows` like spark_prefix_count_fn."""
    from elasticsearch_assets_spark.operators.date_slicer import (
        PARITY_COLLECT_MAX_ROWS,
        _guard_parity_collect,
    )

    _guard_parity_collect(
        df, max_rows or PARITY_COLLECT_MAX_ROWS, "reader.id_slice_counts"
    )
    keys = sorted(
        r[0] for r in df.select(key_col).collect() if r[0] is not None
    )
    return class_count_fn_from_keys(keys)
