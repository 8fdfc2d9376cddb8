"""Deterministic HLL (functions/sketch.py): estimator-branch
semantics, accuracy floors in both regimes, and the bounded-state
plan shape.  Cross-engine exactness is covered by the oracle harness
(scripts/check_oracle.py hll_distinct)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from openetlagent_spark.functions.sketch import (
    _alpha_q20,
    _lc_table_q20,
    hll_distinct,
)


def test_hll_p_validation(spark):
    df = spark.createDataFrame([Row(g="a", k=1)])
    with pytest.raises(ValueError, match=r"p must be"):
        hll_distinct(df, "k", ["g"], p=3)


def test_lc_table_matches_formula():
    m = 256
    t = _lc_table_q20(m)
    assert len(t) == m
    assert t[m - 1] == 0  # V == m -> ln(1) == 0
    assert t[0] == round(m * math.log(m) * (1 << 20))


def test_hll_small_range_linear_counting(spark):
    """n << m: the linear-counting branch fires and lands within a few
    percent of truth (raw HLL alone is ~+80% biased here — the
    regression this pins)."""
    n = 150
    df = spark.createDataFrame([Row(g="a", k=f"user-{i}") for i in range(n)])
    row = hll_distinct(df, "k", ["g"], p=8).collect()[0]
    assert abs(row["hll_est"] - n) / n < 0.10
    assert row["n_buckets_used"] < 256


def test_hll_large_range_raw_estimator(spark):
    """n >> m: all buckets fill, the raw branch fires, and the error
    stays within ~3 standard errors (1.04/sqrt(m))."""
    n, m = 20000, 256
    df = spark.createDataFrame([Row(g="a", k=f"user-{i}") for i in range(n)])
    row = hll_distinct(df, "k", ["g"], p=8).collect()[0]
    assert row["n_buckets_used"] == m
    assert abs(row["hll_est"] - n) / n < 3 * 1.04 / math.sqrt(m)


def test_hll_null_keys_skipped_null_group_kept(spark):
    df = spark.createDataFrame(
        [Row(g="a", k="x"), Row(g="a", k=None), Row(g=None, k="y")]
    )
    rows = {r["g"]: r for r in hll_distinct(df, "k", ["g"], p=8).collect()}
    assert set(rows) == {"a", None}  # NULL key dropped, NULL group kept
    assert rows["a"]["n_buckets_used"] == 1


def test_hll_alpha_constants():
    assert _alpha_q20(256) == round(0.7213 / (1.0 + 1.079 / 256) * (1 << 20))
    assert _alpha_q20(64) == round(0.709 * (1 << 20))


def test_hll_plan_bounded_state(spark):
    """The distinct keys must never shuffle whole: first exchange
    carries (group, bucket) register rows with a partial MAX before
    it, second carries one row per group."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    plan = (
        hll_distinct(li, "l_orderkey", ["l_returnflag"], p=8)
        ._jdf.queryExecution()
        .toString()
    )
    physical = plan.split("== Physical Plan ==")[-1]
    assert "Exchange SinglePartition" not in physical
    assert physical.count("Exchange hashpartitioning") <= 2
    assert "partial_max" in physical or "HashAggregate" in physical


# --- count-min sketch (functions/cms.py) -----------------------------------


def test_cms_never_underestimates_and_collisions_overestimate(spark):
    """est >= true for every key (the one-sided guarantee); with a
    tiny w collisions are forced, so at least one key overestimates —
    pinning that the sketch is actually sketching, not counting."""
    from openetlagent_spark.functions.cms import cms_build, cms_estimate

    rows = [Row(k=f"key-{i % 40}") for i in range(400)]  # 40 keys x 10
    df = spark.createDataFrame(rows)
    counters = cms_build(df, "k", w=8, d=2)  # 16 counters for 40 keys
    probes = df.distinct()
    est = cms_estimate(probes, counters, "k", w=8, d=2)
    true = df.groupBy("k").agg(F.count(F.lit(1)).alias("t"))
    j = {r["k"]: (r["est_count"], r["t"]) for r in est.join(true, "k").collect()}
    assert len(j) == 40
    assert all(e >= t for e, t in j.values())
    assert any(e > t for e, t in j.values()), "w=8 must force collisions"


def test_cms_exact_when_wide(spark):
    from openetlagent_spark.functions.cms import cms_build, cms_estimate

    df = spark.createDataFrame([Row(k=f"u{i % 5}") for i in range(50)])
    counters = cms_build(df, "k", w=4096, d=3)
    est = cms_estimate(df.distinct(), counters, "k", w=4096, d=3)
    assert {r["k"]: r["est_count"] for r in est.collect()} == {
        f"u{i}": 10 for i in range(5)
    }


def test_cms_unseen_key_and_validation(spark):
    from openetlagent_spark.functions.cms import cms_build, cms_estimate

    df = spark.createDataFrame([Row(k="present")])
    counters = cms_build(df, "k", w=1024, d=3)
    probes = spark.createDataFrame([Row(k="absent-zzz")])
    [r] = cms_estimate(probes, counters, "k", w=1024, d=3).collect()
    assert r["est_count"] == 0  # empty buckets read as 0, not NULL
    with pytest.raises(ValueError, match="cms needs"):
        cms_build(df, "k", w=1, d=3)


def test_cms_plan_bounded_state(spark):
    """Counter relation <= d*w rows and the probe join must broadcast
    it — the full key set never shuffles at serve time."""
    from openetlagent_spark.functions.cms import cms_build, cms_estimate

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    counters = cms_build(ev.select("user_id"), "user_id", w=1024, d=3)
    assert counters.count() <= 3 * 1024
    est = cms_estimate(
        ev.select("user_id").distinct(), counters, "user_id", w=1024, d=3
    )
    physical = est._jdf.queryExecution().toString().split("== Physical Plan ==")[-1]
    assert "BroadcastHashJoin" in physical
    assert "SortMergeJoin" not in physical
