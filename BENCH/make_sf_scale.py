#!/usr/bin/env python
"""Scale up the read-only driver testdata (sf0.1) by an integer factor
for LOCAL measurement only (the driver's round-end bench escalated to
sf1.0 in round 5 — BENCH_r05.json `"sf": 1.0` — so optimizations must
be validated at that size, but only sf<=0.1 ships in /root/testdata).

Replicates every table K times with key columns shifted by a
copy-specific offset, preserving referential integrity (lineitem ->
orders/part/supplier, orders -> customer) and every per-key group-size
distribution (window/top-k/dup-count workloads see the same shape,
just K times more groups). Non-key payload columns are byte-identical
across copies. Usage:

    python BENCH/make_sf_scale.py /root/testdata/sf0.1 /root/sfgen/sf1.0 10
"""
from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key column -> shift stride (a round power of ten far above the max
# key at sf0.1 so copies never collide)
INT_KEYS = {
    "l_orderkey": 10_000_000,
    "l_partkey": 1_000_000,
    "l_suppkey": 100_000,
    "o_orderkey": 10_000_000,
    "o_custkey": 1_000_000,
    "c_custkey": 1_000_000,
    "c_nationkey": 0,          # dimension ref — keep
    "s_suppkey": 100_000,
    "s_nationkey": 0,
    "p_partkey": 1_000_000,
    "event_id": 100_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}


def scale_table(src: str, dst: str, k: int) -> None:
    t = pq.read_table(src)
    copies = []
    for i in range(k):
        cols = []
        for name in t.column_names:
            col = t.column(name)
            stride = INT_KEYS.get(name)
            if stride and i > 0 and pa.types.is_integer(col.type):
                col = pc.add(col, pa.scalar(i * stride, type=col.type))
            cols.append(col)
        copies.append(pa.table(dict(zip(t.column_names, cols))))
    out = pa.concat_tables(copies)
    pq.write_table(out, dst, row_group_size=200_000, compression="snappy")
    print(f"{os.path.basename(dst)}: {t.num_rows} -> {out.num_rows} rows")


def main() -> None:
    src_dir, dst_dir, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst_dir, exist_ok=True)
    for f in sorted(os.listdir(src_dir)):
        if f.endswith(".parquet"):
            scale_table(
                os.path.join(src_dir, f), os.path.join(dst_dir, f), k
            )


if __name__ == "__main__":
    main()
