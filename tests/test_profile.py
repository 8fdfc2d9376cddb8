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


def test_value_histogram_bins_and_edges(spark):
    from openetlagent_spark.functions.profile import value_histogram

    df = spark.createDataFrame(
        [Row(x=None if v is None else float(v)) for v in [0, 1, 2.5, 5, 9.99, 10, None]],
        "x double",
    )
    got = {r.bin: r for r in value_histogram(df, "x", bins=4, lo=0.0, hi=10.0).collect()}
    # width 2.5: [0,2.5) -> {0,1}, [2.5,5) -> {2.5}, [5,7.5) -> {5},
    # [7.5,10] -> {9.99, 10 (right-closed final bucket)}; NULL excluded
    assert {b: got[b].n for b in got} == {0: 2, 1: 1, 2: 1, 3: 2}
    assert got[0].lo_edge == 0.0 and got[3].hi_edge == 10.0


def test_value_histogram_derives_bounds_and_validates(spark):
    from openetlagent_spark.functions.profile import value_histogram

    df = spark.createDataFrame([Row(x=1.0), Row(x=3.0)], "x double")
    rows = value_histogram(df, "x", bins=2).collect()
    assert sum(r.n for r in rows) == 2
    with pytest.raises(ValueError):
        value_histogram(df, "x", bins=0)
    with pytest.raises(ValueError):
        value_histogram(df, "nope")
    with pytest.raises(ValueError):
        value_histogram(df, "x", bins=2, lo=5.0, hi=5.0)


def test_value_histogram_inf_nan_and_empty(spark):
    """Out-of-range values clamp instead of overflowing the int cast
    (job-killing under ANSI); NaN is excluded like NULL; an all-NULL
    column fails with a clear error in derived-bounds mode."""
    from openetlagent_spark.functions.profile import value_histogram

    df = spark.createDataFrame(
        [Row(x=v) for v in [0.5, float("inf"), float("-inf"), float("nan"), 4.29e9, None]],
        "x double",
    )
    got = {r.bin: r.n for r in value_histogram(df, "x", bins=4, lo=0.0, hi=10.0).collect()}
    # 0.5 -> bin 0; +inf and 4.29e9 clamp to bin 3; -inf clamps to 0;
    # NaN and NULL excluded
    assert got == {0: 2, 3: 2}

    nulls = spark.createDataFrame([Row(x=None)], "x double")
    with pytest.raises(ValueError, match="cannot derive bounds"):
        value_histogram(nulls, "x", bins=2)


def test_value_histogram_nan_matches_oracle(spark):
    """Spark result and generated DuckDB oracle agree on data
    containing NaN/inf (the divergence the review flagged)."""
    import duckdb

    from openetlagent_spark.functions.profile import histogram_oracle_sql, value_histogram

    rows = [0.5, 2.0, float("inf"), float("nan"), 9.0]
    df = spark.createDataFrame([Row(x=v) for v in rows], "x double")
    got = sorted(
        (r.bin, r.lo_edge, r.hi_edge, r.n)
        for r in value_histogram(df, "x", bins=4, lo=0.0, hi=10.0).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in rows])
    want = sorted(map(tuple, con.execute(
        histogram_oracle_sql("t", "x", bins=4, lo=0.0, hi=10.0)
    ).fetchall()))
    assert got == want


def test_outlier_flags_global_and_grouped(spark):
    from openetlagent_spark.functions.profile import outlier_flags

    rows = [Row(g="a", v=float(v)) for v in [10, 11, 9, 10, 10, 100]] + [
        Row(g="b", v=float(v)) for v in [1000, 1001, 999]
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    # global stats: the b-group values dwarf a's spike
    glob = {(r.g, r.v): r.is_outlier for r in outlier_flags(df, "v", z_threshold=2.0).collect()}
    assert not glob[("a", 100.0)]  # 100 is mid-range globally
    # per-group stats: the spike is an outlier within its stratum
    grp = {(r.g, r.v): r for r in outlier_flags(df, "v", z_threshold=2.0, group_cols=["g"]).collect()}
    assert grp[("a", 100.0)].is_outlier
    assert not grp[("a", 10.0)].is_outlier
    assert not grp[("b", 1000.0)].is_outlier


def test_outlier_flags_zero_variance_and_nulls(spark):
    from openetlagent_spark.functions.profile import outlier_flags

    df = spark.createDataFrame(
        [Row(v=5.0), Row(v=5.0), Row(v=None), Row(v=float("nan"))], "v double"
    )
    out = outlier_flags(df, "v").collect()
    # EVERY row survives (a quality screen must not eat rows): valid
    # rows of a constant column score z = 0; NULL/NaN rows carry a NULL
    # zscore and are never flagged
    assert len(out) == 4
    valid = [r for r in out if r.v == 5.0]
    invalid = [r for r in out if r.v is None or r.v != r.v]
    assert all(r.zscore == 0.0 and not r.is_outlier for r in valid)
    assert all(r.zscore is None and not r.is_outlier for r in invalid)


def test_outlier_flags_deterministic_under_repartition(spark):
    from openetlagent_spark.functions.profile import outlier_flags

    df = spark.range(500).selectExpr("CAST(id % 7 AS STRING) AS g", "id * 1.37 AS v")
    a = sorted(map(tuple, outlier_flags(df, "v", group_cols=["g"]).collect()))
    b = sorted(map(tuple, outlier_flags(df.repartition(13), "v", group_cols=["g"]).collect()))
    assert a == b


def test_outlier_flags_null_group_stratum(spark):
    """NULL group keys form their own stratum (null-safe join), and
    the generated oracle agrees row-for-row on such data."""
    import duckdb

    from openetlagent_spark.functions.profile import outlier_flags, outlier_oracle_sql

    rows = [("a", 10.0), ("a", 12.0), (None, 5.0), (None, 6.0), (None, 500.0)]
    df = spark.createDataFrame(rows, "g string, v double")

    def key(t):
        return (t[0] is None, t[0] or "", t[1])

    got = sorted(
        [
            (r.g, r.v, r.zscore, r.is_outlier)
            for r in outlier_flags(df, "v", z_threshold=1.2, group_cols=["g"]).collect()
        ],
        key=key,
    )
    # the NULL stratum's spike is flagged against ITS stats
    assert any(g is None and v == 500.0 and flag for g, v, z, flag in got)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(map(tuple, con.execute(
        outlier_oracle_sql("t", "v", "g, v", z_threshold=1.2, group_cols=["g"])
    ).fetchall()), key=key)
    assert got == want


def test_outlier_flags_overflow_guard_raises(spark):
    from openetlagent_spark.functions.profile import outlier_flags

    df = spark.createDataFrame([Row(v=1e13)], "v double")
    out = outlier_flags(df, "v")  # lazy — the guard fires at action time
    with pytest.raises(Exception, match="too large for the 10"):
        out.collect()


def test_key_skew_report_flags_planted_hot_key(spark):
    from pyspark.sql import Row

    from openetlagent_spark.functions.profile import key_skew_report

    rows = [Row(k="hot") for _ in range(90)] + [Row(k=f"cold{i}") for i in range(10)]
    df = spark.createDataFrame(rows)
    out = key_skew_report(df, "k", top_k=3).collect()
    assert len(out) == 3
    top = out[0] if out[0].cnt == 90 else max(out, key=lambda r: r.cnt)
    assert top.key == "hot" and top.cnt == 90
    assert top.share == 0.9 and top.n_keys == 11 and top.n_rows == 100
    assert top.max_cnt == 90 and top.p50_cnt == 1.0
    assert top.skew_ratio == 90.0

    # NULL keys count as a (hashable) key — the actual skew hazard
    withnull = df.union(spark.createDataFrame([(None,)] * 50, "k string"))
    out2 = key_skew_report(withnull, "k", top_k=2).collect()
    assert {r.key for r in out2} == {"hot", None}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        key_skew_report(df, "k", top_k=0)


def test_dataset_drift_hand_computed(spark):
    """Per-bin counts and the chi-square-style drift term over a
    hand-built two-sided sample; other sides and NULL values drop;
    identical distributions give zero drift in every bin."""
    from pyspark.sql import Row

    from openetlagent_spark.functions.profile import dataset_drift

    rows = (
        [Row(side="a", v=float(i)) for i in [10, 20, 300, 310]]
        + [Row(side="b", v=float(i)) for i in [15, 320, 330, 340]]
        + [Row(side="c", v=1.0), Row(side="a", v=None)]
    )
    df = spark.createDataFrame(rows)
    got = {r.bin: r for r in
           dataset_drift(df, "side", "v", "a", "b", bin_width=256.0, n_bins=4).collect()}
    # bin 0: a={10,20}, b={15}; bin 1: a={300,310}, b={320,330,340}
    assert got[0].n_a == 2 and got[0].n_b == 1
    assert got[1].n_a == 2 and got[1].n_b == 3
    na, nb = 4, 4
    for b_ in (0, 1):
        d = got[b_].n_a * nb - got[b_].n_b * na
        want = float(d * d) / (float(na) * float(nb) * float(got[b_].n_a + got[b_].n_b))
        assert got[b_].drift_term == want
    # identical distributions -> zero drift everywhere
    sym = spark.createDataFrame(
        [Row(side=s, v=float(i)) for s in ("a", "b") for i in (1, 600)]
    )
    terms = [r.drift_term for r in
             dataset_drift(sym, "side", "v", "a", "b", bin_width=256.0, n_bins=4).collect()]
    assert terms and all(t == 0.0 for t in terms)
    import pytest

    with pytest.raises(ValueError, match="n_bins"):
        dataset_drift(df, "side", "v", "a", "b", n_bins=1)


def test_range_layout_audit_slices_and_pruning(spark):
    """6 hourly points over [00:00, 05:00] split into 3 slices of 2h
    (integer width (5h DIV 3)+1); a probe over hour 2-4 prunes only
    the first slice; NULL ts drops; validation is loud."""
    import datetime

    import pytest as _pytest
    from pyspark.sql import Row

    from openetlagent_spark.functions.profile import range_layout_audit

    base = datetime.datetime(2024, 6, 1)
    rows = [Row(ts=base + datetime.timedelta(hours=h)) for h in range(6)]
    rows.append(Row(ts=None))
    out = range_layout_audit(
        spark.createDataFrame(rows), "ts", n_ranges=3,
        probe_lo="2024-06-01 02:00:00", probe_hi="2024-06-01 04:00:01",
    ).collect()
    assert [r.range_id for r in out] == [0, 1, 2]
    assert [r.n_rows for r in out] == [2, 2, 2]
    # slice 0 = hours 0-1 (entirely before the probe) -> pruned;
    # slices 1 (hours 2-3) and 2 (hours 4-5) overlap the probe
    assert [r.pruned for r in out] == [True, False, False]
    with _pytest.raises(ValueError, match="n_ranges"):
        range_layout_audit(spark.createDataFrame(rows), "ts", n_ranges=0,
                           probe_lo="2024-06-01", probe_hi="2024-06-02")
    with _pytest.raises(ValueError, match="probe"):
        range_layout_audit(spark.createDataFrame(rows), "ts")


# --- snapshot_diff (round 10) --------------------------------------------------


def test_snapshot_diff_labels_all_four_statuses(spark):
    from pyspark.sql import Row

    from openetlagent_spark.functions.profile import snapshot_diff

    old = spark.createDataFrame(
        [Row(k=1, v="a", w=1.0), Row(k=2, v="b", w=2.0), Row(k=3, v=None, w=3.0)]
    )
    new = spark.createDataFrame(
        [Row(k=1, v="a", w=1.0),      # unchanged
         Row(k=2, v="B", w=2.0),      # changed (v)
         Row(k=4, v="d", w=4.0)]      # added; k=3 removed
    )
    got = {r.k: r.diff_status for r in
           snapshot_diff(old, new, ["k"], ["v", "w"]).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_null_safe_compare(spark):
    from pyspark.sql import Row

    from openetlagent_spark.functions.profile import snapshot_diff

    old = spark.createDataFrame([(1, None), (2, "x")], "k long, v string")
    new = spark.createDataFrame([(1, None), (2, None)], "k long, v string")
    got = {r.k: r.diff_status for r in
           snapshot_diff(old, new, ["k"], ["v"]).collect()}
    # NULL == NULL -> unchanged; value -> NULL -> changed
    assert got == {1: "unchanged", 2: "changed"}


def test_snapshot_diff_requires_cols(spark):
    import pytest as _pytest

    from openetlagent_spark.functions.profile import snapshot_diff

    df = spark.range(1)
    with _pytest.raises(ValueError, match="requires"):
        snapshot_diff(df, df, [], ["id"])


def test_join_explosion_audit_products_and_share(spark):
    from pyspark.sql import Row

    from openetlagent_spark.functions.profile import join_explosion_audit

    left = spark.createDataFrame(
        [Row(k=1), Row(k=1), Row(k=1), Row(k=2), Row(k=None)]
    )
    right = spark.createDataFrame([Row(k=1), Row(k=1), Row(k=2), Row(k=3)])
    rows = join_explosion_audit(left, right, "k").collect()
    got = {r.k: (r.n_left, r.n_right, r.out_rows, r.share) for r in rows}
    # k=1: 3*2=6, k=2: 1*1=1, total 7; k=3 and NULL never join
    assert got[1][:3] == (3, 2, 6) and abs(got[1][3] - 6 / 7) < 1e-15
    assert got[2][:3] == (1, 1, 1)
    assert set(got) == {1, 2}
    # ranked by contribution
    assert [r.k for r in rows] == [1, 2]


def test_dataset_manifest_values(spark):
    from openetlagent_spark.functions.profile import dataset_manifest

    df = spark.createDataFrame(
        [(1, "two words", "a"), (2, None, "a"), (3, "   ", "b"), (4, "one", None)],
        "id long, text string, src string",
    )
    got = {r.metric: r.value for r in
           dataset_manifest(df, "text", source_col="src").collect()}
    assert got == {
        "n_docs": 4, "n_null_text": 1, "n_empty_text": 1,
        "total_chars": 9 + 3 + 3,     # 'two words' + '   ' + 'one'
        "total_ws_tokens": 3,          # 2 + 0 (blank) + 1; NULL skipped
        "max_chars": 9, "min_chars": 3, "n_sources": 2,
    }


def test_mad_outliers_known_values(spark):
    from pyspark.sql import Row
    from openetlagent_spark.functions.profile import mad_outliers

    # group g: values 1..9 plus a wild 1000; median 5.5, MAD median of
    # |x-5.5| over {4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5} = 2.5
    rows = [Row(g="g", v=float(x)) for x in range(1, 10)] + [
        Row(g="g", v=1000.0), Row(g="g", v=None),
        Row(g=None, v=7.0),           # NULL group forms its own stratum
        Row(g="z", v=3.0),            # singleton: MAD 0 -> score 0
    ]
    df = spark.createDataFrame(rows)
    got = mad_outliers(df, "v", ["g"], k=3.0).collect()
    by = {(r.g, r.v): r for r in got}
    import math
    scale = 1.4826022185056018 * 2.5
    assert by[("g", 1000.0)].is_outlier is True
    assert by[("g", 1000.0)].robust_z == (1000.0 - 5.5) / scale
    assert by[("g", 5.0)].is_outlier is False
    assert by[("g", None)].robust_z is None and by[("g", None)].is_outlier is False
    assert by[(None, 7.0)].robust_z == 0.0   # own stratum, MAD 0
    assert by[("z", 3.0)].robust_z == 0.0 and by[("z", 3.0)].is_outlier is False
    with pytest.raises(ValueError):
        mad_outliers(df, "nope", ["g"])
