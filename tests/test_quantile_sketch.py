"""Deterministic KMV quantile sketch (functions/quantile.py): merge
losslessness, the empirical rank-error bound the module docstring
claims, the min_group_rows prefilter contract (both sides), cold-start
store reads, duplicate-id tiebreak determinism, collision guards, and
the quantile_sketch YAML flow op.  Cross-engine exactness is covered by
the oracle harness (scripts/check_oracle.py quantile_sketch
qsketch_store qsketch_prefilter)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from openetlagent_spark.functions.quantile import (
    _prefilter_threshold,
    build_qsketch_store,
    qsketch_build,
    qsketch_estimate,
    qsketch_from_store,
    qsketch_merge,
    quantile_sketch,
)

QS_COLD_SCHEMA = "g string, __qh__ long, __qv__ double"


def _vals(spark, n=600, groups=("a", "b")):
    # value = a deterministic permutation-ish spread so value order is
    # not id order; ids unique per row
    return spark.createDataFrame(
        [
            Row(i=g_i * n + i, g=g, v=float((i * 37) % n))
            for g_i, g in enumerate(groups)
            for i in range(n)
        ]
    )


def _sk_set(df):
    return sorted(map(tuple, df.collect()))


def test_merge_losslessness_over_splits(spark):
    """The KMV property the whole store design rests on:
    bottomk(A ∪ B) == merge(bottomk(A), bottomk(B)) EXACTLY, for every
    way of splitting the input (here: three deterministic disjoint
    splits including a skewed 1/10 one and an empty side)."""
    df = _vals(spark)
    direct = _sk_set(qsketch_build(df, "v", "i", ["g"], k=32))
    for pred in [F.col("i") % 2 == 0, F.col("i") % 10 == 0, F.lit(False)]:
        a, b = df.where(pred), df.where(~pred)
        merged = qsketch_merge(
            qsketch_build(a, "v", "i", ["g"], k=32).unionByName(
                qsketch_build(b, "v", "i", ["g"], k=32)
            ),
            ["g"],
            k=32,
        )
        assert _sk_set(merged) == direct


def test_merge_idempotent(spark):
    df = _vals(spark)
    sk = qsketch_build(df, "v", "i", ["g"], k=32)
    once = qsketch_merge(sk, ["g"], k=32)
    twice = qsketch_merge(once, ["g"], k=32)
    assert _sk_set(twice) == _sk_set(once) == _sk_set(sk)


def test_rank_error_bound_empirical(spark):
    """The docstring's accuracy claim: the sample q-quantile of a
    uniform k-sample has rank error O(sqrt(q(1-q)/k)).  Values are
    0..n-1 so the true rank of an estimate is the estimate itself;
    check |est/n - q| <= 4·sqrt(q(1-q)/k) + 1/k for each q (the 4σ
    Chernoff envelope; deterministic given the fixed md5 hashes)."""
    n, k = 4000, 256
    df = spark.createDataFrame([Row(i=i, g="x", v=float(i)) for i in range(n)])
    qs = [0.1, 0.25, 0.5, 0.75, 0.9]
    est = {
        r["q"]: r["est"]
        for r in quantile_sketch(df, "v", "i", ["g"], qs, k=k).collect()
    }
    assert set(est) == set(qs)
    for q in qs:
        bound = 4.0 * math.sqrt(q * (1 - q) / k) + 1.0 / k
        assert abs(est[q] / n - q) <= bound, (q, est[q] / n, bound)


def test_estimate_rank_math_small_sample(spark):
    """Rank = max(1, ceil(q·n)) over value order — pinned on a sample
    small enough to enumerate: values 10,20,30,40 (n=4 < k)."""
    df = spark.createDataFrame(
        [Row(i=i, g="x", v=float(10 * (i + 1))) for i in range(4)]
    )
    est = {
        r["q"]: r["est"]
        for r in quantile_sketch(
            df, "v", "i", ["g"], [0.01, 0.25, 0.26, 0.5, 0.75, 1.0], k=64
        ).collect()
    }
    # ceil(0.01·4)=1, ceil(0.25·4)=1, ceil(0.26·4)=2, ceil(0.5·4)=2,
    # ceil(0.75·4)=3, ceil(1.0·4)=4
    assert est == {0.01: 10.0, 0.25: 10.0, 0.26: 20.0, 0.5: 20.0, 0.75: 30.0, 1.0: 40.0}


def test_prefilter_equivalence_when_bound_holds(spark):
    """min_group_rows is a LOWER bound that holds here (every group has
    600 rows, bound asserted at exactly 600, k=64): the map-side
    prefilter must keep the bottom-k unchanged."""
    df = _vals(spark)
    plain = _sk_set(qsketch_build(df, "v", "i", ["g"], k=64))
    filtered = _sk_set(
        qsketch_build(df, "v", "i", ["g"], k=64, min_group_rows=600)
    )
    assert filtered == plain


def test_prefilter_violated_bound_loses_rows(spark):
    """The contract side (qsketch_build docstring): asserting a bound a
    group does not meet MAY drop rows the sketch should keep.  With a
    bound of 10^7 and only 200 actual rows the survival probability per
    row is 8k/10^7 ≈ 3e-6 — the sketch comes back short/empty, so the
    violation is observable, not silent."""
    df = _vals(spark, n=200, groups=("a",))
    plain = qsketch_build(df, "v", "i", ["g"], k=4)
    assert plain.count() == 4
    lossy = qsketch_build(df, "v", "i", ["g"], k=4, min_group_rows=10_000_000)
    assert lossy.count() < 4


def test_prefilter_threshold_math():
    """T = ceil(2^60·8k/R), capped at the full hash space."""
    space = 1 << 60
    assert _prefilter_threshold(1024, 8 * 1024) == space
    assert _prefilter_threshold(1024, 16 * 1024) == space // 2
    t = _prefilter_threshold(1024, 10**9)
    assert t == -(-space * 8192 // 10**9)
    # never exceeds the space even for degenerate bounds
    assert _prefilter_threshold(1024, 1025) == space


def test_store_append_merge_equals_single_pass(spark, tmp_path):
    """Generations appended batch-by-batch and re-selected at read time
    equal the one-shot sketch — the losslessness claim behind the
    qsketch_store oracle row."""
    df = _vals(spark)
    path = str(tmp_path / "qs_store")
    build_qsketch_store(df.where(F.col("i") % 3 == 0), path, "v", "i", ["g"], k=32)
    build_qsketch_store(
        df.where(F.col("i") % 3 != 0), path, "v", "i", ["g"], k=32, mode="append"
    )
    from_store = qsketch_from_store(spark, path, ["g"], k=32)
    direct = qsketch_build(df, "v", "i", ["g"], k=32)
    assert _sk_set(from_store) == _sk_set(direct)
    # and the estimates agree bit-for-bit
    e_s = _sk_set(qsketch_estimate(from_store, ["g"], [0.5, 0.9]))
    e_d = _sk_set(qsketch_estimate(direct, ["g"], [0.5, 0.9]))
    assert e_s == e_d


def test_store_cold_start_and_serve_before_append(spark, tmp_path):
    """An empty store reads back under the explicit schema (zero part
    files have no footers), and a new batch folds in at serve time
    without touching the store."""
    df = _vals(spark)
    path = str(tmp_path / "qs_store")
    build_qsketch_store(df.limit(0), path, "v", "i", ["g"], k=32)
    served = qsketch_from_store(
        spark, path, ["g"], k=32, schema=QS_COLD_SCHEMA,
        batch=df, value_col="v", id_col="i",
    )
    direct = qsketch_build(df, "v", "i", ["g"], k=32)
    assert _sk_set(served) == _sk_set(direct)


def test_store_batch_requires_cols(spark, tmp_path):
    df = _vals(spark)
    path = str(tmp_path / "qs_store")
    build_qsketch_store(df, path, "v", "i", ["g"], k=32)
    with pytest.raises(ValueError, match="value_col and id_col"):
        qsketch_from_store(spark, path, ["g"], k=32, batch=df)


def test_duplicate_id_tiebreak_deterministic(spark):
    """Duplicate ids share a hash; the (h, v) tiebreak makes the kept
    MULTISET arrival-order-insensitive (qsketch_build docstring), and
    the duplicate-biased sample is the documented behavior."""
    rows = [Row(i=i % 5, g="x", v=float(i)) for i in range(50)]
    fwd = spark.createDataFrame(rows)
    rev = spark.createDataFrame(list(reversed(rows))).repartition(7)
    a = _sk_set(qsketch_build(fwd, "v", "i", ["g"], k=8))
    b = _sk_set(qsketch_build(rev, "v", "i", ["g"], k=8))
    assert a == b and len(a) == 8
    # only 5 distinct hashes feed the bottom-8: the sample is biased
    # toward repeated ids (≤5 distinct hash values present)
    assert len({h for _, h, _ in a}) <= 5


def test_null_ids_and_values_skipped(spark):
    df = spark.createDataFrame(
        [Row(i=1, g="x", v=1.0), Row(i=None, g="x", v=2.0), Row(i=3, g="x", v=None)]
    )
    sk = qsketch_build(df, "v", "i", ["g"], k=8)
    assert [r["__qv__"] for r in sk.collect()] == [1.0]


def test_validation_errors(spark):
    df = _vals(spark, n=10)
    with pytest.raises(ValueError, match="k must be >= 1"):
        qsketch_build(df, "v", "i", ["g"], k=0)
    with pytest.raises(ValueError, match="at least one group column"):
        qsketch_build(df, "v", "i", [])
    with pytest.raises(ValueError, match="must be >= k"):
        qsketch_build(df, "v", "i", ["g"], k=64, min_group_rows=10)
    with pytest.raises(ValueError, match="quantile must be in"):
        quantile_sketch(df, "v", "i", ["g"], [0.0])
    with pytest.raises(ValueError, match="at least one quantile"):
        qsketch_estimate(qsketch_build(df, "v", "i", ["g"]), ["g"], [])


def test_collision_guards(spark):
    """Internal/output names are rejected up front for the whole family
    (ADVICE r07): a frame column named q or __vr__ fails at build, and
    estimate rejects clashing group/est names on raw store frames."""
    df_q = spark.createDataFrame([Row(i=1, q="a", v=1.0)])
    with pytest.raises(ValueError, match="collide"):
        qsketch_build(df_q, "v", "i", ["q"])
    df_vr = spark.createDataFrame([Row(i=1, g="a", __vr__=1, v=1.0)])
    with pytest.raises(ValueError, match="collide"):
        qsketch_build(df_vr, "v", "i", ["g"])
    sk = spark.createDataFrame([Row(q="a", __qh__=1, __qv__=1.0)])
    with pytest.raises(ValueError, match="collide"):
        qsketch_estimate(sk, ["q"], [0.5])
    sk2 = spark.createDataFrame([Row(g="a", __qh__=1, __qv__=1.0)])
    with pytest.raises(ValueError, match="reserved"):
        qsketch_estimate(sk2, ["g"], [0.5], est_col="q")


def test_yaml_flow_op(spark):
    """quantile_sketch as a YAML op end-to-end (model.py
    QuantileSketchOperation → operators/advanced.py
    apply_quantile_sketch): frame-replacing, one row per (group, q)."""
    from openetlagent_spark.model import SpecError, parse_operation
    from openetlagent_spark.runner import apply_operations

    df = _vals(spark, n=100)
    op = parse_operation({
        "operation_type": "quantile_sketch", "value_column": "v",
        "id_column": "i", "group_columns": ["g"], "qs": [0.5, 0.9], "k": 64,
    })
    out = apply_operations(df, [op], spark)
    assert set(out.columns) == {"g", "q", "est"}
    got = {(r["g"], r["q"]): r["est"] for r in out.collect()}
    lib = {
        (r["g"], r["q"]): r["est"]
        for r in quantile_sketch(df, "v", "i", ["g"], [0.5, 0.9], k=64).collect()
    }
    assert got == lib and len(got) == 4

    with pytest.raises(SpecError):
        parse_operation({"operation_type": "quantile_sketch", "value_column": "v"})
    with pytest.raises(SpecError):
        parse_operation({
            "operation_type": "quantile_sketch", "value_column": "v",
            "id_column": "i", "group_columns": ["g"], "qs": [1.5],
        })
    with pytest.raises(SpecError):
        parse_operation({
            "operation_type": "quantile_sketch", "value_column": "v",
            "id_column": "i", "group_columns": ["g"], "k": 64,
            "min_group_rows": 10,
        })
