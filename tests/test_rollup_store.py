"""Continuous-aggregate rollup store (functions/rollup.py): append-
merge == single-pass, coarsen composition, serve math, cold-start
empty stores, NULL policy, at-most-once double-count semantics, and
the argument guards.  Cross-engine exactness of both rollup queries is
covered by the oracle harness (scripts/check_oracle.py rollup_store
rollup_day)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from openetlagent_spark.functions.rollup import (
    build_rollup_store,
    rollup_build,
    rollup_coarsen,
    rollup_from_store,
    rollup_merge,
    rollup_oracle_sql,
    rollup_serve,
)

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _events(spark, n=500):
    # values include NULLs and negatives; timestamps span ~10 days so
    # the hour->day coarsen has real work to do
    rows = [
        Row(
            i=i,
            ts=T0 + dt.timedelta(minutes=29 * i),
            g="a" if i % 3 == 0 else "b",
            v=None if i % 11 == 0 else (i % 37) - 7.25,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def _by_key(df, group_cols=("g",)):
    return {
        tuple(r[c] for c in (*group_cols, "bucket_idx")): r for r in df.collect()
    }


def test_append_merge_equals_single_pass(spark, tmp_path):
    """Partials written batch-by-batch (append) and re-merged at read
    time equal the one-shot rollup bit-for-bit — the losslessness
    claim behind the rollup_store oracle row."""
    df = _events(spark)
    path = str(tmp_path / "rollup_store")
    build_rollup_store(df.where(F.col("i") % 3 == 0), path, "ts", "v", ["g"])
    build_rollup_store(
        df.where(F.col("i") % 3 != 0), path, "ts", "v", ["g"], mode="append"
    )
    merged = _by_key(rollup_from_store(spark, path, ["g"], group_schema="g string"))
    direct = _by_key(rollup_merge(rollup_build(df, "ts", "v", ["g"]), ["g"]))
    assert merged.keys() == direct.keys()
    for k in direct:
        for c in ("n_rows", "n_vals", "sum_q", "min_v", "max_v"):
            assert merged[k][c] == direct[k][c], (k, c)


def test_three_way_split_any_merge_tree(spark, tmp_path):
    """Associativity: three uneven appends merge to the same state as
    one pass (the property that makes ANY merge tree valid)."""
    df = _events(spark, n=300)
    path = str(tmp_path / "rollup3")
    build_rollup_store(df.where(F.col("i") % 5 == 0), path, "ts", "v", ["g"])
    for rem in (1, 2):
        build_rollup_store(
            df.where(F.col("i") % 5 == rem), path, "ts", "v", ["g"], mode="append"
        )
    build_rollup_store(
        df.where(F.col("i") % 5 >= 3), path, "ts", "v", ["g"], mode="append"
    )
    merged = _by_key(rollup_from_store(spark, path, ["g"], group_schema="g string"))
    direct = _by_key(rollup_merge(rollup_build(df, "ts", "v", ["g"]), ["g"]))
    assert merged == direct


def test_reappend_double_counts(spark, tmp_path):
    """SUM-merge is NOT idempotent: re-appending the same batch doubles
    n_rows/n_vals/sum_q (extrema are unchanged) — the documented
    at-most-once contract (module docstring), pinned so a future
    'dedup the store' change is a deliberate semantic decision."""
    df = _events(spark, n=120)
    path = str(tmp_path / "rollup_dup")
    build_rollup_store(df, path, "ts", "v", ["g"])
    build_rollup_store(df, path, "ts", "v", ["g"], mode="append")
    doubled = _by_key(rollup_from_store(spark, path, ["g"], group_schema="g string"))
    single = _by_key(rollup_merge(rollup_build(df, "ts", "v", ["g"]), ["g"]))
    assert doubled.keys() == single.keys()
    for k in single:
        assert doubled[k]["n_rows"] == 2 * single[k]["n_rows"]
        assert doubled[k]["n_vals"] == 2 * single[k]["n_vals"]
        sq = single[k]["sum_q"]
        assert doubled[k]["sum_q"] == (None if sq is None else 2 * sq)
        assert doubled[k]["min_v"] == single[k]["min_v"]
        assert doubled[k]["max_v"] == single[k]["max_v"]


def test_coarsen_equals_direct_day_build(spark):
    """FLOOR(hour_bucket/24) re-merge == building at day grain
    directly from raw data (floor-division composition)."""
    df = _events(spark)
    hourly = rollup_build(df, "ts", "v", ["g"], grain=3600)
    daily_served = _by_key(rollup_coarsen(hourly, ["g"], factor=24))
    daily_direct = _by_key(
        rollup_merge(rollup_build(df, "ts", "v", ["g"], grain=86400), ["g"])
    )
    assert daily_served == daily_direct


def test_coarsen_negative_buckets_floor_not_truncate(spark):
    """Pre-epoch timestamps produce NEGATIVE bucket indices; the
    coarsen must FLOOR (toward -inf), not truncate toward zero —
    floor(-25/24) is -2, and only floor keeps the composition equal to
    a direct coarse-grain build."""
    rows = [
        Row(i=i, ts=dt.datetime(1969, 12, 29, 3, 0, 0) + dt.timedelta(hours=i),
            g="x", v=1.0)
        for i in range(80)
    ]
    df = spark.createDataFrame(rows)
    hourly = rollup_build(df, "ts", "v", ["g"])
    served = _by_key(rollup_coarsen(hourly, ["g"], factor=24))
    direct = _by_key(rollup_merge(rollup_build(df, "ts", "v", ["g"], grain=86400), ["g"]))
    assert served == direct
    assert any(k[1] < 0 for k in served)  # the scenario actually engaged


def test_serve_math_and_null_bucket(spark):
    """sum_v = sum_q/2^20, avg_v = sum_v/n_vals; a bucket whose every
    value is NULL serves NULL sum/avg with n_vals=0 and n_rows
    counting the rows."""
    rows = [
        Row(ts=T0, g="a", v=1.5),
        Row(ts=T0 + dt.timedelta(minutes=1), g="a", v=2.25),
        Row(ts=T0, g="b", v=None),
        Row(ts=T0 + dt.timedelta(minutes=2), g="b", v=None),
    ]
    df = spark.createDataFrame(rows)
    out = {r["g"]: r for r in
           rollup_serve(rollup_merge(rollup_build(df, "ts", "v", ["g"]), ["g"]),
                        ["g"]).collect()}
    a = out["a"]
    assert a["n_rows"] == 2 and a["n_vals"] == 2
    assert a["sum_q"] == int(1.5 * 2**20) + int(2.25 * 2**20)
    assert a["sum_v"] == a["sum_q"] / 2**20
    assert a["avg_v"] == a["sum_v"] / 2
    b = out["b"]
    assert b["n_rows"] == 2 and b["n_vals"] == 0
    assert b["sum_q"] is None and b["sum_v"] is None and b["avg_v"] is None


def test_null_ts_and_null_group_dropped(spark):
    """NULL timestamps and NULL group keys are excluded on build —
    mirroring the oracle's WHERE so the NULL-group trap cannot open."""
    rows = [
        Row(ts=T0, g="a", v=1.0),
        Row(ts=None, g="a", v=99.0),
        Row(ts=T0, g=None, v=77.0),
    ]
    df = spark.createDataFrame(rows)
    out = rollup_build(df, "ts", "v", ["g"]).collect()
    assert len(out) == 1
    assert out[0]["g"] == "a" and out[0]["n_rows"] == 1


def test_cold_start_empty_store(spark, tmp_path):
    """Reading a store directory with zero part files yields an empty
    frame with the declared schema (no footer inference), and folding
    a batch at serve time equals building from the batch alone."""
    path = str(tmp_path / "rollup_cold")
    spark.createDataFrame([], "g string, bucket_idx long, n_rows long, "
                          "n_vals long, sum_q long, min_v double, max_v double"
                          ).write.mode("overwrite").parquet(path)
    empty = rollup_from_store(spark, path, ["g"], group_schema="g string")
    assert empty.count() == 0
    df = _events(spark, n=60)
    folded = _by_key(
        rollup_from_store(spark, path, ["g"], group_schema="g string",
                          batch=df, ts_col="ts", value_col="v")
    )
    direct = _by_key(rollup_merge(rollup_build(df, "ts", "v", ["g"]), ["g"]))
    assert folded == direct


def test_guards(spark):
    df = _events(spark, n=10)
    with pytest.raises(ValueError, match="collide"):
        rollup_build(df.withColumnRenamed("g", "sum_q"), "ts", "v", ["sum_q"])
    with pytest.raises(ValueError, match="q_bits"):
        rollup_build(df, "ts", "v", ["g"], q_bits=41)
    with pytest.raises(ValueError, match="factor"):
        rollup_coarsen(rollup_build(df, "ts", "v", ["g"]), ["g"], factor=0)
    with pytest.raises(ValueError, match="requires ts_col"):
        rollup_from_store(spark, "/nonexistent", ["g"], group_schema="g string",
                          batch=df)


def test_oracle_sql_matches_on_duckdb(spark):
    """The generated oracle, run on the SAME rows in DuckDB, equals the
    Spark build→merge→serve output value-for-value (a miniature of the
    harness check, kept here so the module's own test suite fails fast
    if either side's expression drifts)."""
    import duckdb
    import pandas as pd

    df = _events(spark, n=200)
    pdf = df.toPandas()[["ts", "g", "v"]]
    con = duckdb.connect()
    con.register("events_t", pdf)
    sql = rollup_oracle_sql(table="events_t", ts_col="ts", value_col="v",
                            group_cols=["g"])
    oracle = con.execute(sql).fetchdf()
    got = rollup_serve(
        rollup_merge(rollup_build(df, "ts", "v", ["g"]), ["g"]), ["g"]
    ).toPandas()
    key = ["g", "bucket_idx"]
    oracle = oracle.sort_values(key).reset_index(drop=True)[got.columns]
    got = got.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, oracle, check_dtype=False)


def test_sketch_refresh_stream_rollup_parity_and_replay(spark, tmp_path):
    """Streaming rollup leg (streaming/events.py sketch_refresh_stream
    kind='rollup'): the last per-batch snapshot equals the one-shot
    serve over all data, and replaying a generation (same content,
    OVERWRITE) leaves the serving read unchanged — the exactly-once
    property SUM-merged partials require."""
    import os
    import time

    from openetlagent_spark.streaming.events import sketch_refresh_stream

    df = _events(spark, n=400)
    src = str(tmp_path / "src")
    df.where("i < 200").coalesce(1).write.parquet(src)
    time.sleep(1.1)
    df.where("i >= 200").coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    q = sketch_refresh_stream(
        stream, store, out,
        checkpoint=str(tmp_path / "ckpt"),
        kind="rollup", group_cols=["g"], ts_col="ts", value_col="v",
    )
    assert q.awaitTermination(120)
    snaps = sorted(e for e in os.listdir(out) if e.startswith("batch_id="))
    gens = sorted(e for e in os.listdir(store) if e.startswith("gen="))
    assert len(gens) >= 2 and len(snaps) == len(gens)
    last = {(r["g"], r["bucket_idx"]): tuple(r)
            for r in spark.read.parquet(f"{out}/{snaps[-1]}").collect()}
    direct = {(r["g"], r["bucket_idx"]): tuple(r)
              for r in rollup_serve(
                  rollup_merge(rollup_build(df, "ts", "v", ["g"]), ["g"]), ["g"]
              ).collect()}
    assert last == direct
    # replay generation 0 with identical content: serving unchanged
    build_rollup_store(
        spark.read.parquet(src).where("i < 200"), f"{store}/gen=0", "ts", "v", ["g"]
    )
    replayed = {(r["g"], r["bucket_idx"]): tuple(r)
                for r in rollup_serve(
                    rollup_from_store(spark, store, ["g"], group_schema="g string"),
                    ["g"]).collect()}
    assert replayed == direct


def test_sketch_refresh_stream_rollup_validation(spark, tmp_path):
    import pytest

    from openetlagent_spark.streaming.events import sketch_refresh_stream

    df = _events(spark, n=10)
    src = str(tmp_path / "vsrc")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    with pytest.raises(ValueError, match="needs ts_col"):
        sketch_refresh_stream(
            stream, str(tmp_path / "s"), str(tmp_path / "o"),
            checkpoint=str(tmp_path / "c"),
            kind="rollup", group_cols=["g"], value_col="v",
        )
    with pytest.raises(ValueError, match="takes no key_col"):
        sketch_refresh_stream(
            stream, str(tmp_path / "s"), str(tmp_path / "o"),
            checkpoint=str(tmp_path / "c"),
            kind="rollup", group_cols=["g"], value_col="v", ts_col="ts",
            key_col="i",
        )
    with pytest.raises(ValueError, match="needs key_col"):
        sketch_refresh_stream(
            stream, str(tmp_path / "s"), str(tmp_path / "o"),
            checkpoint=str(tmp_path / "c"), kind="hll", group_cols=["g"],
        )


def test_spikes_hand_computed(spark):
    """Two groups with a known hot bucket each: the integer
    cross-multiplied flag and the ratio match hand arithmetic,
    including the >= boundary (exactly 2x mean is flagged)."""
    from openetlagent_spark.functions.rollup import rollup_build, rollup_merge, rollup_spikes

    rows = []
    # group a: buckets with 1,1,4 rows -> total 6, nb 3, mean 2;
    # the 4-row bucket has ratio 2.0 (boundary: flagged)
    for h, n in ((0, 1), (1, 1), (2, 4)):
        rows += [Row(ts=T0 + dt.timedelta(hours=h, minutes=m), g="a", v=1.0)
                 for m in range(n)]
    # group b: 2,2,2 -> nothing flagged
    for h in range(3):
        rows += [Row(ts=T0 + dt.timedelta(hours=h, minutes=m), g="b", v=1.0)
                 for m in range(2)]
    df = spark.createDataFrame(rows)
    merged = rollup_merge(rollup_build(df, "ts", "v", ["g"]), ["g"])
    got = rollup_spikes(merged, ["g"], factor_num=2).collect()
    assert len(got) == 1
    r = got[0]
    assert r["g"] == "a" and r["n_rows"] == 4 and r["spike_ratio"] == 2.0
    # 3x threshold: the boundary bucket is no longer flagged
    assert rollup_spikes(merged, ["g"], factor_num=3).count() == 0
    import pytest

    with pytest.raises(ValueError, match="factors"):
        rollup_spikes(merged, ["g"], factor_num=0)
