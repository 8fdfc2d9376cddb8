"""Column-profiling operator: exact statistics on a constructed frame,
the approx (HLL) mode's error floor, and the single-scan plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from openetlagent_spark.functions.profile import profile_columns


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            Row(k=1, name="a", v=10),
            Row(k=2, name="b", v=None),
            Row(k=3, name="a", v=30),
            Row(k=4, name=None, v=None),
        ]
    )


def test_profile_exact_stats(frame):
    got = {r.col: r for r in profile_columns(frame).collect()}
    assert set(got) == {"k", "name", "v"}
    assert all(r.n_rows == 4 for r in got.values())
    assert got["k"].n_nulls == 0 and got["k"].n_distinct == 4
    assert got["k"].min_value == "1" and got["k"].max_value == "4"
    assert got["name"].n_nulls == 1 and got["name"].n_distinct == 2
    assert got["name"].min_value == "a" and got["name"].max_value == "b"
    assert got["v"].n_nulls == 2 and got["v"].n_distinct == 2


def test_profile_subset_and_unknown_column(frame):
    assert profile_columns(frame, ["k"]).count() == 1
    with pytest.raises(ValueError):
        profile_columns(frame, ["nope"])


def test_profile_approx_close_to_exact(spark):
    df = spark.range(5000).selectExpr("id", "id % 100 AS mod100")
    got = {r.col: r for r in profile_columns(df, approx=True).collect()}
    # HLL++ default rsd 5%
    assert abs(got["id"].n_distinct - 5000) <= 5000 * 0.1
    assert abs(got["mod100"].n_distinct - 100) <= 10


def test_profile_single_scan(frame):
    plan = profile_columns(frame)._jdf.queryExecution().executedPlan().toString()
    # one aggregate pass over one source, not a per-column union of scans
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") <= 2
