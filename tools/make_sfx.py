"""Build a scale-multiplied copy of an sf dir for at-scale latency
probes (the driver's round-end bench may run a larger, generated SF —
optimizations must hold there too). Each table is unioned X times with
id columns offset per copy so keys stay unique; text/payloads repeat,
which preserves the size/shape of every scan, shuffle and index while
keeping generation instant. Timing-only data: oracle values are NOT
expected to match any recorded artifact.

Usage: python tools/make_sfx.py <src_sf_dir> <dst_dir> <X>
"""

from __future__ import annotations

import glob
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ID_COLS = {
    "documents": ["doc_id"],
    "events": ["event_id"],
    "embeddings": ["vec_id"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
OFFSET = 10_000_000_000


def main(src: str, dst: str, x: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for path in sorted(glob.glob(os.path.join(src, "*.parquet"))):
        name = os.path.basename(path)[: -len(".parquet")]
        t = pq.read_table(path)
        ids = [c for c in ID_COLS.get(name, []) if c in t.column_names]
        copies = []
        for i in range(x):
            c = t
            for col in ids:
                j = c.column_names.index(col)
                c = c.set_column(
                    j, col, pc.add(c.column(j), pa.scalar(i * OFFSET))
                )
            copies.append(c)
        out = pa.concat_tables(copies)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"))
        print(name, t.num_rows, "->", out.num_rows, flush=True)
    open(os.path.join(dst, "_DONE"), "w").close()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
