#!/usr/bin/env python
"""Materialize a deterministic sf1 replica set (10x sf0.1) for scale
benchmarking (VERDICT r4 next-round #5).

The driver ships sf{0.001,0.01,0.1} read-only; the sf1 evidence run
needs 10x rows with the SAME schemas and value distributions. Each
table is the sf0.1 table unioned 10 times with key columns shifted by
copy*stride (join keys shift consistently across tables, so
orders↔lineitem↔customer joins keep their selectivity), and document
text perturbed per copy (' v<copy>' suffix) so content-hash dedup
doesn't collapse the copies into one giant duplicate class the sf0.1
run never sees.

Output: <repo>/.bench_sf1/sf1/*.parquet, written with multiple
partitions per big table (a single-row-group parquet scans as ONE
task — the r1 lesson). Idempotent: skips tables already present.

Usage:  python scripts/make_sf1.py [copies] [dst]
        (defaults: 10 copies -> <repo>/.bench_sf1/sf1; e.g.
         `python scripts/make_sf1.py 100 .bench_sf10/sf10` builds the
         100x set for the sf10 evidence run)
Then:   SPARK_GRAFT_SF_DIR=/root/repo/.bench_sf1/sf1 python bench.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
DST = (os.path.join(_REPO, sys.argv[2]) if len(sys.argv) > 2
       else os.path.join(_REPO, ".bench_sf1", "sf1"))

# (table, key shifts {col: stride}, text col or None)
SPECS = [
    ("region", {}, None),
    ("nation", {}, None),
    ("supplier", {}, None),
    ("part", {}, None),
    ("customer", {"c_custkey": 1_000_000}, None),
    ("orders", {"o_orderkey": 10_000_000, "o_custkey": 1_000_000}, None),
    ("lineitem", {"l_orderkey": 10_000_000}, None),
    ("events", {"event_id": 10_000_000, "user_id": 1_000_000}, None),
    ("documents", {"doc_id": 1_000_000}, "text"),
    ("embeddings", {"vec_id": 1_000_000}, None),
]


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for table, shifts, text_col in SPECS:
        out = os.path.join(DST, f"{table}.parquet")
        if os.path.exists(out):
            print(f"skip {table} (exists)")
            continue
        src = f"read_parquet('{SRC}/{table}.parquet')"
        if not shifts:  # small dims: copy verbatim
            con.execute(f"COPY (SELECT * FROM {src}) TO '{out}' (FORMAT PARQUET)")
            print(f"copied {table}")
            continue
        selects = []
        cols = list(con.execute(f"SELECT * FROM {src} LIMIT 0").df().columns)
        for c in range(COPIES):
            proj = []
            for col in cols:
                if col in shifts:
                    proj.append(f"{col} + {c * shifts[col]} AS {col}")
                elif col == text_col:
                    proj.append(f"{col} || ' v{c}' AS {col}")
                else:
                    proj.append(col)
            selects.append(f"SELECT {', '.join(proj)} FROM {src}")
        union = "\nUNION ALL\n".join(selects)
        # ROW_GROUP_SIZE keeps ~16+ row groups per big table so Spark
        # fans the scan out instead of serializing on one task
        nrows = con.execute(f"SELECT count(*) FROM {src}").fetchone()[0]
        rg = max(50_000, (nrows * COPIES) // 32)
        con.execute(
            f"COPY ({union}) TO '{out}' (FORMAT PARQUET, ROW_GROUP_SIZE {rg})"
        )
        print(f"wrote {table} x{COPIES} (row_group {rg})")
    con.close()
    print("done:", DST)


if __name__ == "__main__":
    main()
