#!/usr/bin/env python
"""Local mirror of the driver's correctness gate: run every query in
``__spark_entry__.queries()`` and its DuckDB oracle side-by-side, then
compare row count, column names, and an order-insensitive multiset of
normalized rows.  Usage:

    python scripts/check_oracle.py            # all queries at sf0.01
    python scripts/check_oracle.py q1 q2      # subset
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python scripts/check_oracle.py
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from openetlagent_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.replace(microsecond=(v.microsecond // 1000) * 1000).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize(x) for x in v) + "]"
    return str(v)


def rows_to_multiset(columns: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(normalize(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL  {name}: spark query raised: {str(exc)[:300]}")
            failures += 1
            continue

        sql = oracles.get(name)
        if sql is None:
            print(f"OK?   {name}: rows-only (no oracle), {len(s_rows)} rows "
                  f"[{time.time()-t0:.1f}s]")
            if not s_rows:
                print(f"WARN  {name}: rows-only query returned 0 rows")
            continue

        try:
            res = con.execute(sql)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as exc:
            print(f"FAIL  {name}: oracle raised: {str(exc)[:300]}")
            failures += 1
            continue

        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"row count {len(s_rows)} != {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns {sorted(s_cols)} != {sorted(d_cols)}")
        if not problems:
            sm = rows_to_multiset(s_cols, s_rows)
            dm = rows_to_multiset(d_cols, d_rows)
            if sm != dm:
                diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
                problems.append(f"value mismatch, first diffs: {diff}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"PASS  {name}: {len(s_rows)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
