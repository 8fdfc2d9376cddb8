"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps
one name per implemented operator (SURVEY §2) to a (spark, sf_dir) ->
DataFrame callable; ``oracle_sql()`` gives the DuckDB-equivalent SQL for
each (omitted only for genuinely non-SQL-expressible ops, which get the
driver's rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from openetlagent_spark.plans import HARNESS_ORACLES, HARNESS_QUERIES, flagship  # noqa: E402


def _utc(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    """Pin the session timezone to UTC before building the plan.

    The driver owns the SparkSession; timestamp→date casts, timestamp
    collection, and string-literal date comparisons all resolve against
    the session timezone, while the DuckDB oracle reads parquet
    timestamps as naive UTC instants.  Pinning UTC makes the comparison
    timezone-independent of the host."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)

    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _utc(flagship)(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _utc(fn) for name, fn in HARNESS_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(HARNESS_ORACLES)
