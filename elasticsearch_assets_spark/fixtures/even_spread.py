"""The canonical 1,000-doc "even spread" fixture, reconstructed.

The reference's signature test asset is a 1,000-record dataset spanning
2019-04-26T15:00:23.201Z .. .393Z (193 ms) with lowercase-hex `uuid`s,
shipped inside @terascope/opensearch-client (ElasticsearchTestHelpers.
EvenDateData) and therefore NOT present in /root/reference. This module
re-derives an equivalent dataset from the reference's OWN golden plans,
which over-determine the distribution:

- per-ms `created` counts: solved from the 32-slice size-50 plan
  (test/elasticsearch_reader/slicer-spec.ts:402-627), the 7-slice
  size-200 plan (:270-320), the auto/start/end interval metadata
  (:175-248), plus the two bisection-probe inequalities the walks imply
  (counts in [263,268) ≥ 21 and [344,349) ≥ 22).
- per-first-hex-char `uuid` counts: the 16-slice golden
  (test/id_reader/slicer-spec.ts:101-118).
- per-second-char counts: exact for the 'a' subtree (:157-173), and for
  the rest solved from the 77 char-class sums of the full-index
  recurse-optimization golden (:227-303) plus the chunk-shrink
  inequalities its walk implies.
- third-char counts under 'a': exact from the starting_key_depth=3
  golden (:327-377).

Every quantity below is therefore pinned (or bounded) by a published
golden; free cells are filled deterministically. The golden tests in
tests/test_even_spread_goldens.py replay ALL of those reference specs
against this fixture and must match them exactly, slice for slice.

Schema mirrors test/fixtures/data/even-spread-extra1.ts:56-65:
(ip, userAgent, url, uuid, created, ipv6, location, bytes).
"""

from __future__ import annotations

import hashlib

BASE_ISO = "2019-04-26T15:00:23."
BASE_MS = 201  # offset of the first doc inside second 23
SPAN_MS = 193  # limit = max + 1ms → 23.394Z

# docs per millisecond offset (0 == 23.201Z), solved as described above;
# sums to 1000 and reproduces both golden date-slice walks exactly.
PER_MS_COUNTS = [
    2, 2, 2, 2, 2, 1, 1, 1, 1, 3, 3, 3, 2, 4, 4, 4, 4, 3, 3, 3,
    3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 2, 2, 2, 1, 3, 3,
    3, 2, 2, 2, 2, 4, 4, 4, 4, 6, 6, 6, 5, 5, 7, 7, 6, 7, 8, 8,
    7, 7, 5, 5, 5, 4, 4, 3, 3, 2, 2, 4, 4, 4, 3, 3, 3, 2, 2, 3,
    3, 3, 2, 2, 2, 2, 2, 2, 2, 5, 4, 4, 4, 4, 4, 4, 4, 4, 6, 6,
    5, 5, 5, 5, 5, 5, 5, 8, 8, 7, 7, 10, 9, 9, 7, 7, 7, 7, 6, 9,
    9, 9, 8, 7, 7, 7, 7, 8, 8, 7, 7, 11, 10, 5, 4, 6, 6, 5, 5, 8,
    7, 7, 7, 5, 5, 5, 4, 4, 3, 3, 3, 2, 3, 3, 3, 3, 3, 3, 3, 2,
    2, 5, 4, 4, 4, 10, 10, 10, 10, 12, 11, 13, 12, 10, 9, 9, 9, 10, 10, 10,
    9, 10, 8, 8, 8, 10, 10, 9, 9, 10, 10, 10, 10,
]
assert sum(PER_MS_COUNTS) == 1000 and len(PER_MS_COUNTS) == SPAN_MS

# uuid second-char counts per first char, hex order '0123456789abcdef'.
# 'a' row is exact (slicer-spec.ts:157-173); the rest satisfy the 77
# char-class sums + shrink inequalities of the full-index golden.
UUID_CHAR2_COUNTS = {
    "0": [4, 4, 4, 4, 4, 4, 4, 4, 5, 5, 5, 4, 5, 5, 5, 4],
    "1": [5, 5, 4, 4, 4, 2, 2, 2, 3, 3, 3, 2, 4, 4, 4, 4],
    "2": [4, 4, 4, 4, 4, 3, 3, 3, 3, 2, 4, 4, 3, 3, 3, 4],
    "3": [1, 1, 1, 1, 1, 5, 4, 4, 4, 4, 6, 6, 5, 4, 3, 4],
    "4": [4, 4, 3, 3, 5, 4, 4, 4, 6, 6, 8, 7, 3, 2, 3, 2],
    "5": [5, 5, 4, 4, 5, 4, 4, 4, 3, 3, 3, 2, 5, 5, 4, 4],
    "6": [3, 3, 2, 2, 2, 2, 4, 4, 4, 3, 3, 4, 4, 4, 4, 4],
    "7": [5, 4, 4, 4, 5, 5, 5, 5, 5, 5, 5, 6, 5, 5, 6, 6],
    "8": [5, 4, 4, 4, 7, 6, 6, 5, 8, 8, 3, 3, 2, 3, 3, 4],
    "9": [5, 4, 4, 8, 7, 1, 4, 4, 3, 4, 4, 4, 3, 3, 2, 4],
    "a": [5, 7, 0, 2, 3, 3, 3, 4, 5, 8, 3, 3, 3, 4, 4, 1],
    "b": [3, 2, 2, 5, 5, 5, 6, 6, 6, 6, 5, 5, 7, 7, 6, 6],
    "c": [5, 5, 4, 4, 6, 6, 9, 1, 3, 3, 4, 3, 2, 2, 4, 3],
    "d": [3, 3, 3, 3, 3, 2, 4, 3, 3, 3, 3, 3, 4, 3, 3, 3],
    "e": [5, 5, 4, 4, 5, 4, 3, 3, 4, 4, 3, 3, 3, 3, 3, 3],
    "f": [3, 3, 3, 2, 2, 2, 4, 4, 4, 3, 3, 4, 4, 4, 3, 3],
}
HEX = "0123456789abcdef"
# 16-slice golden totals (slicer-spec.ts:101-118)
UUID_CHAR1_COUNTS = {
    "a": 58, "b": 82, "c": 64, "d": 49, "e": 59, "f": 51,
    "0": 70, "1": 55, "2": 55, "3": 54, "4": 68, "5": 64,
    "6": 52, "7": 80, "8": 75, "9": 64,
}
for _c1, _row in UUID_CHAR2_COUNTS.items():
    assert sum(_row) == UUID_CHAR1_COUNTS[_c1], _c1

# exact third chars for the 'a' subtree (starting_key_depth=3 golden),
# {char2: {char3: count}}; chars beyond depth 3 are free filler.
UUID_A_CHAR3 = {
    "a": {"5": 1, "6": 1, "7": 1},
    "b": {"a": 1, "c": 1, "4": 1},
    "c": {"3": 1, "5": 1, "8": 1},
    "d": {"1": 1, "4": 1, "5": 1, "6": 1},
    "e": {"a": 1, "f": 1, "0": 1, "8": 1},
    "f": {"4": 1},
    "0": {"c": 1, "f": 2, "1": 1, "4": 1},
    "1": {"b": 1, "c": 1, "e": 1, "f": 1, "1": 2, "7": 1},
    "3": {"6": 2},
    "4": {"e": 1, "2": 1, "3": 1},
    "5": {"0": 1, "2": 1, "3": 1},
    "6": {"d": 1, "e": 1, "9": 1},
    "7": {"a": 1, "d": 2, "e": 1},
    "8": {"d": 1, "f": 2, "9": 2},
    "9": {"d": 1, "e": 2, "4": 2, "5": 1, "7": 2},
}
for _c2, _m in UUID_A_CHAR3.items():
    assert sum(_m.values()) == UUID_CHAR2_COUNTS["a"][HEX.index(_c2)], _c2


def _fill_uuid(prefix: str, i: int) -> str:
    """Deterministic uuid with the given hex prefix: remaining chars
    from md5, formatted 8-4-4-4-12."""
    h = hashlib.md5(f"even-spread:{prefix}:{i}".encode()).hexdigest()
    raw = (prefix + h)[:32]
    return f"{raw[:8]}-{raw[8:12]}-{raw[12:16]}-{raw[16:20]}-{raw[20:32]}"


def uuid_list() -> list[str]:
    """All 1000 uuids, grouped by prefix in hex DFS order."""
    out: list[str] = []
    for c1 in HEX:
        for idx2, n2 in enumerate(UUID_CHAR2_COUNTS[c1]):
            c2 = HEX[idx2]
            if c1 == "a":
                for c3, n3 in UUID_A_CHAR3.get(c2, {}).items():
                    out.extend(_fill_uuid(c1 + c2 + c3, i) for i in range(n3))
            else:
                out.extend(_fill_uuid(c1 + c2, i) for i in range(n2))
    assert len(out) == 1000
    return out


def created_offsets_ms() -> list[int]:
    """All 1000 created-timestamp offsets (ms past 23.201Z), ascending."""
    out: list[int] = []
    for off, n in enumerate(PER_MS_COUNTS):
        out.extend([off] * n)
    return out


def iso_created(offset_ms: int) -> str:
    return f"{BASE_ISO}{BASE_MS + offset_ms:03d}Z"


def even_spread_rows() -> list[dict]:
    """The 1000 fixture rows. uuid↔created pairing is deterministic but
    decorrelated (md5 shuffle) — no golden couples the two columns."""
    uuids = uuid_list()
    offs = created_offsets_ms()
    order = sorted(
        range(1000), key=lambda i: hashlib.md5(f"pair:{i}".encode()).hexdigest()
    )
    rows = []
    for i, (u, k) in enumerate(zip(uuids, order)):
        off = offs[k]
        h = hashlib.md5(f"even-spread-row:{i}".encode()).hexdigest()
        rows.append(
            {
                "ip": ".".join(str(int(h[j : j + 2], 16)) for j in (0, 2, 4, 6)),
                "userAgent": f"Mozilla/5.0 (TestAgent {h[:8]})",
                "url": f"https://{h[8:16]}.example.net",
                "uuid": u,
                "created": iso_created(off),
                "ipv6": ":".join(h[j : j + 4] for j in range(0, 32, 4)),
                "location": f"{int(h[:4], 16) % 180 - 90}.{int(h[4:6], 16):02d}, "
                f"{int(h[6:10], 16) % 360 - 180}.{int(h[10:12], 16):02d}",
                "bytes": int(h[12:17], 16),
            }
        )
    return rows


def even_spread_df(spark):
    """The fixture as a Spark DataFrame (created as TIMESTAMP)."""
    from pyspark.sql import functions as F

    rows = even_spread_rows()
    df = spark.createDataFrame(
        [tuple(r.values()) for r in rows],
        "ip string, userAgent string, url string, uuid string, "
        "created string, ipv6 string, location string, bytes long",
    )
    return df.withColumn(
        "created", F.to_timestamp("created", "yyyy-MM-dd'T'HH:mm:ss.SSSX")
    )
