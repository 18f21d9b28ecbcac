"""Synthesize an sf1-equivalent dataset (10x sf0.1) in /tmp for scaling
measurements beyond the driver-provided scale factors: 1M events, 6M
lineitem, 50k documents.

Each replica r in 0..9 offsets every primary/foreign key by r * STRIDE so
joins stay referentially intact (replica r's lineitems join replica r's
orders/parts/suppliers; all replicas share the tiny region/nation dims,
which are copied once). Document texts get a per-replica suffix token so
near-dup workloads scale linearly instead of exploding quadratically on
10 artificial exact copies of every doc; event user_ids are offset so
per-user windows/sessions keep their per-key cardinality (more series,
not longer ones — the 100 TB growth axis).

Usage: python tools/make_sf1.py [out_dir]   (default /tmp/predictor_spark_sf1)
Writes <out_dir>/<table>.parquet via DuckDB (no Spark needed) and is a
no-op if the output already exists with the right row counts.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000
N_REP = 10

# key columns to offset per replica, per table
OFFSETS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONCE = ["region", "nation"]


def build(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_ONCE:
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{dst}' (FORMAT PARQUET)"
            )
    for t, keys in OFFSETS.items():
        dst = f"{out_dir}/{t}.parquet"
        src_n = con.execute(f"SELECT count(*) FROM '{SRC}/{t}.parquet'").fetchone()[0]
        if os.path.exists(dst):
            n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
            if n == src_n * N_REP:
                continue
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"{c} + r.r * {STRIDE} AS {c}")
            elif t == "documents" and c == "text":
                sel.append("text || ' r' || CAST(r.r AS VARCHAR) AS text")
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM '{SRC}/{t}.parquet', "
            f"(SELECT unnest(range({N_REP})) AS r) r) "
            f"TO '{dst}' (FORMAT PARQUET)"
        )
    for t in list(OFFSETS) + COPY_ONCE:
        n = con.execute(f"SELECT count(*) FROM '{out_dir}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/predictor_spark_sf1")
