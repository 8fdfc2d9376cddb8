#!/usr/bin/env python
"""Driver-strength exact compare on a DETERMINISTIC SLICE of a query's
output — for queries whose full result exceeds what a single driver can
collect for comparison (the sf10 regime: quantile_bins emits 60M rows,
ewma 100M).  The SAME slice predicate (a ``WHERE`` clause over the
query's OUTPUT columns) filters the Spark result and the DuckDB oracle,
and the surviving rows run through check_oracle's type-sensitive
full-precision multiset compare.  A slice hash-match is exactly the
driver hash restricted to the slice: any divergence among sliced rows
fails identically; rows outside the slice are unchecked (the full-suite
sf0.01/sf0.1/sf1 sweeps cover full results at collectable scales).

Usage:
    SPARK_GRAFT_SF_DIR=.scaledata/sf10 \
    python scripts/check_oracle_slice.py <query> "<output-predicate>"
e.g.
    python scripts/check_oracle_slice.py quantile_bins "l_orderkey % 199 = 0"
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from openetlagent_spark.session import get_spark  # noqa: E402
from scripts.check_oracle import TABLES, normalize_exact, pdf_to_multiset  # noqa: E402


def main() -> int:
    name, pred = sys.argv[1], sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("oracle-slice")
    t0 = time.time()
    sdf = entry_mod.queries()[name](spark, sf_dir).where(pred)
    spdf = sdf.toPandas()
    t1 = time.time()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    sql = entry_mod.oracle_sql()[name]
    opdf = con.sql(f"SELECT * FROM ({sql}) __q WHERE {pred}").df()
    t2 = time.time()
    rows_ok = len(spdf) == len(opdf)
    schema_ok = sorted(spdf.columns) == sorted(opdf.columns)
    hash_ok = rows_ok and schema_ok and (
        pdf_to_multiset(spdf, normalize_exact) == pdf_to_multiset(opdf, normalize_exact)
    )
    status = "PASS" if (rows_ok and schema_ok and hash_ok) else "FAIL"
    print(
        f"{status}  {name} [slice: {pred}]: spark={len(spdf)} oracle={len(opdf)} "
        f"rows_match={rows_ok} schema_match={schema_ok} hash_match={hash_ok} "
        f"[spark {t1-t0:.1f}s, oracle {t2-t1:.1f}s]"
    )
    return 0 if status == "PASS" else 1


if __name__ == "__main__":
    sys.exit(main())
