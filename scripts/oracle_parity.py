#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run every
`__spark_entry__.queries()` entry on Spark and its `oracle_sql()` twin on
DuckDB over the same sf dir, compare row count, column names, and
order-insensitive values (columns sorted by name, rows sorted).

Usage: python scripts/oracle_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from horseman_article_parser_spark.session import get_spark  # noqa: E402


# Every oracle column must be one of these exact-comparable DuckDB types;
# floats/HUGEINT/DECIMAL hash differently driver-side (VERDICT r3 §wrong#1).
ALLOWED_ORACLE_TYPES = {"BIGINT", "INTEGER", "VARCHAR", "BOOLEAN"}


def normalize_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def df_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(normalize_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-parity")
    con = duckdb.connect()
    for t in entry.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            ok = len(s_rows) >= 0
            print(f"ok   {name}: rows-only ({len(s_rows)} rows, {dt:.1f}s)")
            n_pass += 1
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = [c.lower() for c in rel.columns]
            d_types = [str(t) for t in rel.types]
            d_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        # Type lint: the driver's value hash is dtype-sensitive (HUGEINT /
        # DECIMAL / DOUBLE serialize differently from Spark's BIGINT), so
        # every oracle column must land in the exact-comparable set.
        bad_types = [
            (c, t)
            for c, t in zip(d_cols, d_types)
            if t not in ALLOWED_ORACLE_TYPES
        ]
        if bad_types:
            print(f"FAIL {name}: TYPELINT non-exact oracle column types: {bad_types}")
            n_fail += 1
            continue
        sc, sr = df_rows([c.lower() for c in s_cols], s_rows)
        dc, dr = df_rows(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rowcount {len(sr)} vs {len(dr)}")
            print("  spark sample:", sr[:3])
            print("  duck  sample:", dr[:3])
            n_fail += 1
            continue
        mism = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
        if mism:
            i = mism[0]
            print(f"FAIL {name}: {len(mism)}/{len(sr)} rows differ; first @{i}:")
            print("  cols :", sc)
            print("  spark:", sr[i])
            print("  duck :", dr[i])
            n_fail += 1
            continue
        print(f"PASS {name} ({len(sr)} rows, {dt:.1f}s)")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
