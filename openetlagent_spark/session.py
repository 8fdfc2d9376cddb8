"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[N]``; the same settings translate to a
multi-executor cluster: AQE on (runtime re-planning, skew-join
splitting, shuffle-partition coalescing), reasonable shuffle
parallelism, Arrow enabled for the pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "openetlagent-spark", master: str | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Spark still DEFAULTS parquet timestamps to legacy INT96, which
        # carries no min/max statistics and no filter pushdown — every
        # time-range scan over an INT96-written table reads everything.
        # INT64 micros restores stats, row-group skipping, and pushdown
        # (see tests/test_sorted_layout.py for the measured difference).
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # console progress bars interleave \r-terminated fragments into
        # harness stdout and corrupt line-oriented log parsing
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()


def free_local_checkpoints(spark: SparkSession) -> int:
    """Deterministically release every ``localCheckpoint`` block held
    by the session; returns the number of RDDs unpersisted.

    Operators here materialize reused intermediates with EAGER
    ``localCheckpoint`` (never bare ``persist``) so blocks are not
    pinned for the session — but the JVM may keep a reference alive
    past the Python result's garbage collection, so long-running
    loops (bench sweeps, harness runs) should call this BETWEEN
    queries, after each result is fully consumed, alongside
    ``spark.catalog.clearCache()``.

    Only RDDs whose creation site is ``localCheckpoint`` are touched:
    a caller's own ``persist()``-ed frames are left alone (and a
    checkpointed RDD, once unpersisted, cannot be recomputed — its
    lineage is truncated — so only call this when no live DataFrame
    still depends on one)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    it = jmap.keySet().iterator()
    freed = 0
    rdds = []
    while it.hasNext():
        rdds.append(jmap.get(it.next()))
    for jrdd in rdds:
        if jrdd is not None and "localCheckpoint" in jrdd.toString():
            jrdd.unpersist(False)
            freed += 1
    return freed
