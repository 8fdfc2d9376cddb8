"""Bucketed-table co-located join: two tables bucketed on the join key
with the same bucket count must join WITHOUT a shuffle exchange — the
SCALE.md fact-to-fact join strategy, verified against the actual plan."""

from __future__ import annotations

from pyspark.sql import Row

from openetlagent_spark.sources import write_bucketed


def test_bucketed_join_has_no_shuffle(spark):
    # (warehouse dir is a static conf — tables land in ./spark-warehouse,
    # which is gitignored, and are dropped in the finally block)
    a = spark.createDataFrame([Row(k=i, va=float(i)) for i in range(100)])
    b = spark.createDataFrame([Row(k=i, vb=float(i * 2)) for i in range(100)])
    write_bucketed(a, "bucketed_a", ["k"], num_buckets=4)
    write_bucketed(b, "bucketed_b", ["k"], num_buckets=4)

    ta = spark.table("bucketed_a")
    tb = spark.table("bucketed_b")
    # Disable broadcast so the join strategy decision is about
    # partitioning, not size.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ta.join(tb, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        assert joined.count() == 100
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bucketed_a")
        spark.sql("DROP TABLE IF EXISTS bucketed_b")
