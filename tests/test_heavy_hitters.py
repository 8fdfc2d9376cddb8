"""Exact heavy hitters with the lossless CMS prefilter
(functions/cms.py cms_heavy_hitters): losslessness vs a plain
groupBy, threshold boundary, prefilter engagement, NULL policy, and
the argument guards.  Cross-engine exactness is covered by the oracle
harness (scripts/check_oracle.py heavy_hitters)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from openetlagent_spark.functions.cms import cms_heavy_hitters


def _skewed(spark):
    """3 heavy keys (40/25/20 rows), a 19-row near-miss, 150
    singletons."""
    rows = (
        [Row(k="heavy-a", g="x")] * 40
        + [Row(k="heavy-b", g="x")] * 25
        + [Row(k="heavy-c", g="y")] * 20
        + [Row(k="near-miss", g="y")] * 19
        + [Row(k=f"tail-{i}", g="x") for i in range(150)]
    )
    return spark.createDataFrame(rows)


def test_equals_plain_groupby_having(spark):
    """The prefiltered two-pass result == one-pass GROUP BY HAVING —
    losslessness on skewed data (the oracle row's claim, locally)."""
    df = _skewed(spark)
    got = {
        (r["k"], r["g"]): r["cnt"]
        for r in cms_heavy_hitters(df, ["k", "g"], threshold=20, w=64).collect()
    }
    want = {
        (r["k"], r["g"]): r["cnt"]
        for r in df.groupBy("k", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .where(F.col("cnt") >= 20)
        .collect()
    }
    assert got == want
    assert ("heavy-c", "y") in got and got[("heavy-a", "x")] == 40
    assert ("near-miss", "y") not in got  # boundary: 19 < 20


def test_threshold_boundary_inclusive(spark):
    df = _skewed(spark)
    got = {r["k"] for r in cms_heavy_hitters(df, ["k"], threshold=20).collect()}
    assert got == {"heavy-a", "heavy-b", "heavy-c"}  # ==20 kept, 19 dropped


def test_prefilter_actually_drops_rows(spark):
    """With w large enough that singletons rarely collide into heavy
    buckets, the map-side estimate filter must reject most tail rows
    BEFORE the exact pass — pinned by running the same filter
    standalone and counting survivors."""
    from openetlagent_spark.functions.bloom import long_array_lit
    from openetlagent_spark.functions.cms import cms_bucket, cms_build

    df = _skewed(spark).withColumn("__hh_key__", F.col("k"))
    w, d, thr = 1024, 3, 20
    counters = cms_build(df, "__hh_key__", w=w, d=d).collect()
    table = [[0] * w for _ in range(d)]
    for r in counters:
        table[r["hash_row"]][r["bucket"]] = r["cnt"]
    est = F.least(
        *[
            F.element_at(
                long_array_lit(table[i]),
                (cms_bucket(F.col("__hh_key__"), i, w) + 1).cast("int"),
            )
            for i in range(d)
        ]
    )
    survivors = df.where(est >= thr).count()
    # 85 heavy rows must survive (lossless); the 169 near-miss+tail
    # rows are dropped unless they collide into a heavy bucket in ALL
    # d rows — overwhelmingly unlikely at this load factor.
    assert survivors >= 85
    assert survivors < 120


def test_null_group_keys_dropped(spark):
    df = spark.createDataFrame(
        [Row(k="a", g="x")] * 25 + [Row(k=None, g="x")] * 30 + [Row(k="a", g=None)] * 30
    )
    got = cms_heavy_hitters(df, ["k", "g"], threshold=20).collect()
    assert [(r["k"], r["g"], r["cnt"]) for r in got] == [("a", "x", 25)]


def test_single_hash_row_path(spark):
    """d=1 exercises the no-LEAST branch."""
    df = _skewed(spark)
    got = {r["k"] for r in cms_heavy_hitters(df, ["k"], threshold=20, d=1).collect()}
    assert got == {"heavy-a", "heavy-b", "heavy-c"}


def test_guards(spark):
    df = _skewed(spark)
    with pytest.raises(ValueError, match="threshold"):
        cms_heavy_hitters(df, ["k"], threshold=0)
    with pytest.raises(ValueError, match="at least one"):
        cms_heavy_hitters(df, [], threshold=5)
    with pytest.raises(ValueError, match="collides"):
        cms_heavy_hitters(df, ["k"], threshold=5, count_col="k")
    with pytest.raises(ValueError, match="too large"):
        cms_heavy_hitters(df, ["k"], threshold=5, w=4096, d=3)
