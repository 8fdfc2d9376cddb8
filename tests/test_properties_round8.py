"""Property tests for the round-8 second-session operators: rollup
merge associativity under ARBITRARY partitions, time-weighted-average
vs a brute-force Python mirror, heavy-hitter losslessness on random
skew, and expectations-summary count consistency — random inputs the
fixed oracle tables never produce."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

T0 = dt.datetime(2024, 3, 1)

# (minute offset, group, value-or-None) event tuples
event = st.tuples(
    st.integers(min_value=0, max_value=5000),
    st.sampled_from(["a", "b"]),
    st.one_of(st.none(), st.floats(min_value=-50, max_value=50,
                                   allow_nan=False, allow_infinity=False)),
)
events_strategy = st.lists(event, min_size=1, max_size=40)
splitter = st.lists(st.integers(min_value=0, max_value=2), min_size=40, max_size=40)


def _events_df(spark, rows):
    # explicit schema: hypothesis happily generates an all-NULL value
    # column, which inference cannot type
    return spark.createDataFrame(
        [Row(i=i, ts=T0 + dt.timedelta(minutes=m), g=g,
             v=float(v) if v is not None else None)
         for i, (m, g, v) in enumerate(rows)],
        "i long, ts timestamp, g string, v double",
    )


@given(rows=events_strategy, split=splitter)
@SETTINGS
def test_rollup_any_partition_merges_to_single_pass(spark, rows, split):
    """ANY 3-way partition of the rows, built separately and merged,
    equals the one-shot rollup — associativity on random data,
    including all-NULL-value groups and negative values."""
    from openetlagent_spark.functions.rollup import rollup_build, rollup_merge

    df = _events_df(spark, rows)
    # the hypothesis-driven split list assigns each row index to one of
    # three parts — genuinely arbitrary (uneven and empty parts
    # included), unlike a fixed modulus
    from pyspark.sql import functions as F

    split_lit = F.expr("array(" + ",".join(str(v) for v in split) + ")")
    parts = [
        df.where(F.element_at(split_lit, (F.col("i") + 1).cast("int")) == k)
        for k in range(3)
    ]
    # build each partition separately, union the partials, merge
    built = None
    for p in parts:
        b = rollup_build(p, "ts", "v", ["g"])
        built = b if built is None else built.unionByName(b)
    merged = {(r["g"], r["bucket_idx"]): tuple(r)
              for r in rollup_merge(built, ["g"]).collect()}
    direct = {(r["g"], r["bucket_idx"]): tuple(r)
              for r in rollup_merge(rollup_build(df, "ts", "v", ["g"]), ["g"]).collect()}
    assert merged == direct


@given(rows=events_strategy)
@SETTINGS
def test_rollup_counts_match_python_mirror(spark, rows):
    """n_rows / n_vals / sum_q per (group, hour) equal a brute-force
    Python mirror of the same quantization."""
    from openetlagent_spark.functions.rollup import rollup_build

    df = _events_df(spark, rows)
    got = {(r["g"], r["bucket_idx"]): r for r in
           rollup_build(df, "ts", "v", ["g"]).collect()}
    mirror: dict = defaultdict(lambda: [0, 0, 0])
    for m, g, v in rows:
        ts = T0 + dt.timedelta(minutes=m)
        bucket = math.floor(ts.replace(tzinfo=dt.timezone.utc).timestamp() / 3600.0)
        e = mirror[(g, bucket)]
        e[0] += 1
        if v is not None:
            e[1] += 1
            e[2] += math.floor(v * 2**20)
    assert set(got) == set(mirror)
    for k, (n_rows, n_vals, sum_q) in mirror.items():
        assert got[k]["n_rows"] == n_rows
        assert got[k]["n_vals"] == n_vals
        assert got[k]["sum_q"] == (sum_q if n_vals else None)


@given(rows=events_strategy)
@SETTINGS
def test_twa_matches_python_mirror(spark, rows):
    """time_weighted_avg == a brute-force Python fold over the
    (ts, id)-sorted series: same segments, same integer q*dt sums,
    same final division."""
    from openetlagent_spark.functions.timeseries import time_weighted_avg

    df = _events_df(spark, rows)
    got = {r["g"]: r for r in
           time_weighted_avg(df, key="g", ts_col="ts", value_col="v",
                             id_col="i").collect()}
    series = defaultdict(list)
    for i, (m, g, v) in enumerate(rows):
        ts_ms = int((T0 + dt.timedelta(minutes=m))
                    .replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
        series[g].append((ts_ms, i, v))
    for g, pts in series.items():
        pts.sort()
        segs = [(pts[j], pts[j + 1][0] - pts[j][0]) for j in range(len(pts) - 1)]
        if not segs:
            assert g not in got
            continue
        total = sum(d for _, d in segs)
        qdt = sum(math.floor(p[2] * 2**16) * d for p, d in segs if p[2] is not None)
        any_val = any(p[2] is not None for p, _ in segs)
        r = got[g]
        assert r["n_segments"] == len(segs)
        assert r["total_ms"] == total
        if total > 0 and any_val:
            assert r["twa"] == (qdt / 2**16) / total
        else:
            assert r["twa"] is None


key_strategy = st.lists(
    st.sampled_from(["k1", "k2", "k3", "k4", "k5", "k6", "k7", "k8"]),
    min_size=1, max_size=120,
)


@given(keys=key_strategy, thr=st.integers(min_value=1, max_value=12))
@SETTINGS
def test_heavy_hitters_lossless_on_random_skew(spark, keys, thr):
    """cms_heavy_hitters == plain Counter-threshold on arbitrary key
    multisets and thresholds (the losslessness property, fuzzed)."""
    from openetlagent_spark.functions.cms import cms_heavy_hitters

    df = spark.createDataFrame([Row(k=k) for k in keys])
    got = {r["k"]: r["cnt"]
           for r in cms_heavy_hitters(df, ["k"], threshold=thr, w=16, d=2).collect()}
    want = {k: c for k, c in Counter(keys).items() if c >= thr}
    assert got == want


value_strategy = st.lists(
    st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
    min_size=0, max_size=60,
)


@given(vals=value_strategy, lo=st.integers(-50, 0), hi=st.integers(1, 50))
@SETTINGS
def test_expectations_summary_matches_counter(spark, vals, lo, hi):
    """Violation counts over random NULL-y integers equal the Python
    mirror for every rule shape at once; n_rows is constant across
    rules; unique counts the surplus duplicates."""
    from openetlagent_spark.functions.expectations import expectations_summary

    df = spark.createDataFrame([Row(v=v) for v in vals], "v int")
    rules = [
        {"column": "v", "check": "not_null"},
        {"column": "v", "check": "min", "value": lo},
        {"column": "v", "check": "max", "value": hi},
        {"column": "v", "check": "unique"},
    ]
    got = {r["rule"]: r for r in expectations_summary(df, rules).collect()}
    nn = [v for v in vals if v is not None]
    assert got["v:not_null"]["n_violations"] == sum(v is None for v in vals)
    assert got["v:min"]["n_violations"] == sum(v < lo for v in nn)
    assert got["v:max"]["n_violations"] == sum(v > hi for v in nn)
    assert got["v:unique"]["n_violations"] == len(nn) - len(set(nn))
    assert all(r["n_rows"] == len(vals) for r in got.values())
