"""Regression tests for the round-10 ADVICE findings — five low-severity
engine/oracle divergences on degenerate inputs:

1. seasonal_baseline oracle dow: DuckDB ``%`` is signed, Spark pmod is
   not — pre-1970 timestamps must produce the same 0..6 dow on both.
2. fk_orphans: null_keys must be 0 (not NULL) for an empty child table.
3. ks_two_sample oracle: empty cohorts must yield ONE all-NULL row on
   both engines (the oracle's old GROUP BY emitted zero rows).
4. gini_sources oracle: NULL source must rank NULLS FIRST like Spark.
5. target_encode_loo: singleton category + exactly one non-null target
   overall must encode NULL (not 0/0 = NaN) — mirrored in the oracle.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_seasonal_baseline_dow_pre_1970_matches_oracle(spark):
    """1969-12-25 (Thursday) and 1969-12-28 (Sunday): Spark pmod and the
    oracle's double-mod must both land in 0..6 and agree exactly."""
    from openetlagent_spark.functions.timeseries import (
        seasonal_baseline,
        seasonal_baseline_oracle_sql,
    )

    rows = [
        Row(k="m", ts="1969-12-25 10:00:00", value=10.0),  # Thu -> dow 4
        Row(k="m", ts="1969-12-28 10:00:00", value=20.0),  # Sun -> dow 0
        Row(k="m", ts="1970-01-01 10:00:00", value=30.0),  # Thu -> dow 4
        Row(k="m", ts="2024-06-02 10:00:00", value=40.0),  # Sun -> dow 0
    ]
    df = spark.createDataFrame(rows).select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    got = {
        (r["key"], r["dow"]): (r["n_events"], r["mean_value"], r["lift"])
        for r in seasonal_baseline(df, "k").collect()
    }
    assert set(got) == {("m", 0), ("m", 4)}
    con = duckdb.connect()
    con.register("t", df.toPandas())
    sql = seasonal_baseline_oracle_sql("t", "k")
    want = {
        (r.key, r.dow): (r.n_events, r.mean_value, r.lift)
        for r in con.sql(sql).df().itertuples()
    }
    assert set(want) == set(got)
    for k in got:
        assert got[k][0] == want[k][0]
        assert math.isclose(got[k][1], want[k][1], rel_tol=0, abs_tol=0)
        assert math.isclose(got[k][2], want[k][2], rel_tol=0, abs_tol=0)


def test_fk_orphans_empty_child_null_keys_is_zero(spark):
    """SUM over an empty child is NULL in Spark; the audit row must
    still report null_keys = 0 (the oracle's COUNT(*) convention)."""
    from openetlagent_spark.functions.integrity import fk_orphans

    child = spark.createDataFrame([], "ck bigint")
    parent = spark.createDataFrame([Row(pk=1), Row(pk=2)])
    [row] = fk_orphans(
        [
            {
                "name": "empty_child",
                "child": child,
                "child_key": "ck",
                "parent": parent,
                "parent_key": "pk",
            }
        ]
    ).collect()
    assert row["child_rows"] == 0
    assert row["null_keys"] == 0, "null_keys must be 0, not NULL, on empty child"
    assert row["orphan_rows"] == 0
    assert row["orphan_keys"] == 0


def test_ks_test_empty_cohorts_one_null_row_both_engines(spark):
    """No event matches either cohort: Spark's global aggregate emits
    one all-NULL row; the fixed oracle must too (not zero rows)."""
    from openetlagent_spark.functions.stats import ks_two_sample
    from openetlagent_spark.plans.analytics import KS_TEST_SQL

    ev = spark.createDataFrame(
        [Row(event_type="view", value=1.0), Row(event_type="view", value=2.0)]
    )
    got = ks_two_sample(ev, "event_type", "purchase", "click", "value").collect()
    assert len(got) == 1
    assert all(got[0][c] is None for c in ("n_a", "n_b", "ks_d", "ks_stat"))

    con = duckdb.connect()
    con.register("events", ev.toPandas())
    oracle = con.sql(KS_TEST_SQL).df()
    assert len(oracle) == 1, "oracle must emit one row on empty cohorts"
    assert oracle.iloc[0].isna().all()


def test_gini_sources_null_source_ranks_first_both_engines(spark, tmp_path):
    """A NULL source row must get rank 1 on both engines (Spark ASC is
    NULLS FIRST; the oracle now pins NULLS FIRST explicitly)."""
    from openetlagent_spark.plans.analytics import GINI_SOURCES_SQL, q_gini_sources

    pdf = pd.DataFrame(
        {
            "source": [None, "a", "a", "b"],
            "n_chars": [5, 10, 20, 100],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(sf / "documents.parquet"))
    got = {
        r["source"]: (r["weight"], r["rank"], r["lorenz_share"], r["gini"])
        for r in q_gini_sources(spark, str(sf)).collect()
    }
    con = duckdb.connect()
    con.register("documents", pdf)
    want = {}
    for _, r in con.sql(GINI_SOURCES_SQL).df().iterrows():
        key = None if pd.isna(r["source"]) else r["source"]
        want[key] = (int(r["weight"]), int(r["rank"]), r["lorenz_share"], r["gini"])
    assert set(got) == set(want) == {None, "a", "b"}
    assert got[None][1] == want[None][1] == 1, "NULL source must rank first"
    for k in got:
        assert got[k][0] == want[k][0]
        assert got[k][1] == want[k][1]
        assert math.isclose(got[k][2], want[k][2], rel_tol=0, abs_tol=0)
        assert math.isclose(got[k][3], want[k][3], rel_tol=0, abs_tol=0)


def test_target_encode_loo_single_target_encodes_null(spark):
    """Exactly one non-null target in the frame: the singleton-category
    row's global fallback is (gs − y)/(gn − 1) = 0/0 — it must encode
    NULL, identically in the oracle."""
    from openetlagent_spark.functions.mining import (
        target_encode_loo,
        target_encode_loo_oracle_sql,
    )

    df = spark.createDataFrame(
        [Row(id=1, cat="x", y=7.0), Row(id=2, cat="z", y=None)]
    )
    got = {r["id"]: r["te_loo"] for r in target_encode_loo(df, "cat", "y").collect()}
    assert got[1] is None, "0/0 fallback must be NULL, not NaN"
    assert got[2] is None

    con = duckdb.connect()
    con.register("base_t", df.toPandas())
    sql = target_encode_loo_oracle_sql(
        "SELECT * FROM base_t", "cat", "y", out_cols=["id"]
    )
    oracle = {
        int(r["id"]): (None if pd.isna(r["te_loo"]) else r["te_loo"])
        for _, r in con.sql(sql).df().iterrows()
    }
    assert oracle == {1: None, 2: None}


def test_target_encode_loo_normal_fallback_still_works(spark):
    """With gn > 1 the singleton-category row still gets the global
    leave-one-out mean — the guard must not over-trigger."""
    from openetlagent_spark.functions.mining import target_encode_loo

    df = spark.createDataFrame(
        [
            Row(id=1, cat="x", y=10.0),
            Row(id=2, cat="x", y=20.0),
            Row(id=3, cat="solo", y=60.0),
        ]
    )
    got = {r["id"]: r["te_loo"] for r in target_encode_loo(df, "cat", "y").collect()}
    assert math.isclose(got[1], 20.0)
    assert math.isclose(got[2], 10.0)
    assert math.isclose(got[3], (10.0 + 20.0) / 2)
