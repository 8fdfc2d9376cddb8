"""KMV set-operation sketch (functions/kmv.py): bottom-k merge
losslessness, exact-vs-estimator branches, estimator accuracy,
known-overlap intersection sanity, partition independence, and
validation.  Cross-engine exactness is covered by the oracle harness
(scripts/check_oracle.py kmv_distinct kmv_set_overlap)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from openetlagent_spark.functions.kmv import (
    _check_k,
    kmv_cardinality,
    kmv_sample,
    kmv_set_ops,
)


def _sets(spark, na=500, nb=500, shared=250):
    # A = 0..na-1, B = (na-shared)..(na-shared+nb-1): |A∩B| = shared
    rows = [Row(s="A", key=f"k{i}") for i in range(na)]
    rows += [Row(s="B", key=f"k{na - shared + i}") for i in range(nb)]
    return spark.createDataFrame(rows)


def test_sample_merge_losslessness(spark):
    """bottomk over a union == bottomk of unioned bottomks — the KMV
    property both the pairwise union estimator and any persisted
    sample store rely on."""
    df = _sets(spark)
    full = kmv_sample(df, "key", "s", k=32)
    # split each set's rows arbitrarily, sample each half, re-sample
    import pyspark.sql.functions as F

    h1 = kmv_sample(df.where(F.length("key") % 2 == 0), "key", "s", k=32)
    h2 = kmv_sample(df.where(F.length("key") % 2 != 0), "key", "s", k=32)
    remerged = kmv_sample(
        h1.unionByName(h2).select(F.col("s"), F.col("__h__").alias("key")), "key", "s", k=32
    )
    # re-sampling hashes of hashes isn't the identity — instead verify
    # via the direct construction: bottom-k of the concatenated samples
    from pyspark.sql import Window

    w = Window.partitionBy("s").orderBy(F.col("__h__").asc())
    manual = (
        h1.unionByName(h2)
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 32)
        .drop("rn")
    )
    assert sorted(map(tuple, manual.collect())) == sorted(map(tuple, full.collect()))
    assert remerged.count() > 0  # (sanity only for the hashed re-read)


def test_exact_branch_small_sets(spark):
    """Sets smaller than k report their EXACT distinct count."""
    df = _sets(spark, na=20, nb=30, shared=10)
    card = {
        r["s"]: (r["n_sample"], r["kmv_est"])
        for r in kmv_cardinality(kmv_sample(df, "key", "s", k=64), "s", k=64).collect()
    }
    assert card == {"A": (20, 20), "B": (30, 30)}
    ops = kmv_set_ops(kmv_sample(df, "key", "s", k=64), "s", k=64).collect()[0]
    assert ops["union_est"] == 40 and ops["intersect_est"] == 10
    assert ops["jaccard"] == 10 / 40


def test_estimator_accuracy(spark):
    """KMV relative error is O(1/sqrt(k)) — at k=256 over 5000 keys,
    require within 4/sqrt(k) = 25% (deterministic given the fixed
    hashes; measured much closer)."""
    df = _sets(spark, na=5000, nb=5000, shared=2500)
    k = 256
    card = {
        r["s"]: r["kmv_est"]
        for r in kmv_cardinality(kmv_sample(df, "key", "s", k=k), "s", k=k).collect()
    }
    bound = 4.0 / math.sqrt(k)
    for s, true in (("A", 5000), ("B", 5000)):
        assert abs(card[s] - true) / true <= bound, (s, card[s])
    ops = kmv_set_ops(kmv_sample(df, "key", "s", k=k), "s", k=k).collect()[0]
    assert abs(ops["union_est"] - 7500) / 7500 <= bound
    # intersection compounds union + jaccard error — allow 2x
    assert abs(ops["intersect_est"] - 2500) / 2500 <= 2 * bound


def test_partition_independence(spark):
    df = _sets(spark)
    a = sorted(map(tuple, kmv_set_ops(
        kmv_sample(df, "key", "s", k=64), "s", k=64).collect()))
    b = sorted(map(tuple, kmv_set_ops(
        kmv_sample(df.repartition(17), "key", "s", k=64), "s", k=64).collect()))
    assert a == b


def test_disjoint_sets_zero_intersection(spark):
    df = _sets(spark, na=300, nb=300, shared=0)
    ops = kmv_set_ops(kmv_sample(df, "key", "s", k=64), "s", k=64).collect()[0]
    assert ops["n_match"] == 0 and ops["intersect_est"] == 0 and ops["jaccard"] == 0.0


def test_null_keys_and_sets_skipped(spark):
    df = spark.createDataFrame(
        [Row(s="A", key="x"), Row(s="A", key=None), Row(s=None, key="y")]
    )
    sample = kmv_sample(df, "key", "s", k=8)
    assert sample.count() == 1


def test_validation():
    with pytest.raises(ValueError, match="kmv k must be"):
        _check_k(0)
    with pytest.raises(ValueError, match="kmv k must be"):
        _check_k(2049)  # (2048)<<52 would overflow BIGINT
    # T literal stays in BIGINT at the cap
    assert _check_k(2048) == 2047 << 52
    assert (2047 << 52) < 2**63
