"""Generate larger scale factors by referential-integrity-preserving
replication of the driver's read-only sf0.1 testdata.

Why replication, not synthesis: the driver's generator (seed=42) is
not available, and the scale sweep's purpose is to measure THIS
engine's scaling behavior and oracle exactness on a 10×/100× larger
input — both of which only require a valid instance of the same
schema, because the DuckDB oracle reads the SAME generated files.
Each copy ``i`` shifts every bigint entity key (custkey, orderkey,
partkey, suppkey, event_id, user_id, doc_id, vec_id) by
``i * STRIDE`` consistently across fact and dimension tables, so
copy-i facts join copy-i dimensions exactly as the originals do;
the nation/region dimensions stay fixed (as in TPC-H, their size is
scale-independent). Value columns are left untouched — fan-outs,
selectivities, and group cardinalities per key match the source
distribution.

Usage: python tools/gen_scale.py [--mult 10] [--src /root/testdata/sf0.1]
                                 [--out .data/sf1]
Writes one ``{table}.parquet`` per table (same layout the catalog
expects), via DuckDB — no Spark needed, runs in seconds.
"""

from __future__ import annotations

import argparse
import os

import duckdb

STRIDE = 10_000_000

# per-table list of key columns to shift by the copy offset
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]


def generate(src: str, out: str, mult: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in FIXED:
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet, COMPRESSION snappy)"
        )
    for t, keys in KEYED.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        proj = ", ".join(
            f"({c} + i.off) AS {c}" if c in keys else c for c in cols
        )
        con.sql(
            f"COPY (SELECT {proj} "
            f"FROM read_parquet('{src}/{t}.parquet'), "
            f"(SELECT range * {STRIDE} AS off FROM range({mult})) i "
            f"ORDER BY i.off) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet, COMPRESSION snappy)"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=".data/sf1")
    a = ap.parse_args()
    generate(a.src, a.out, a.mult)
