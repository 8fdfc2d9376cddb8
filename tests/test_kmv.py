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


def test_store_append_merge_equals_single_pass(spark, tmp_path):
    """Samples appended batch-by-batch and re-selected at read time
    equal the one-shot sample — the losslessness behind the kmv_store
    oracle row — and the cardinality estimates agree exactly."""
    import pyspark.sql.functions as F

    from openetlagent_spark.functions.kmv import build_kmv_store, kmv_from_store

    df = _sets(spark)
    path = str(tmp_path / "kmv_store")
    build_kmv_store(df.where(F.length("key") % 2 == 0), path, "key", "s", k=64)
    build_kmv_store(
        df.where(F.length("key") % 2 != 0), path, "key", "s", k=64, mode="append"
    )
    merged = kmv_from_store(spark, path, "s", k=64)
    direct = kmv_sample(df, "key", "s", k=64)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
    est_m = sorted(map(tuple, kmv_cardinality(merged, "s", k=64).collect()))
    est_d = sorted(map(tuple, kmv_cardinality(direct, "s", k=64).collect()))
    assert est_m == est_d


def test_store_reappend_idempotent(spark, tmp_path):
    """Duplicate (set, hash) rows collapse in the merge's DISTINCT —
    re-appending a batch cannot move any estimate (the at-least-once
    safety the quantile store does NOT have)."""
    from openetlagent_spark.functions.kmv import build_kmv_store, kmv_from_store

    df = _sets(spark)
    path = str(tmp_path / "kmv_store")
    build_kmv_store(df, path, "key", "s", k=64)
    build_kmv_store(df, path, "key", "s", k=64, mode="append")
    merged = kmv_from_store(spark, path, "s", k=64)
    direct = kmv_sample(df, "key", "s", k=64)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_store_cold_start_serve_with_batch(spark, tmp_path):
    from openetlagent_spark.functions.kmv import build_kmv_store, kmv_from_store

    df = _sets(spark)
    path = str(tmp_path / "kmv_store")
    build_kmv_store(df.limit(0), path, "key", "s", k=64)
    served = kmv_from_store(
        spark, path, "s", k=64, schema="s string, __h__ long",
        batch=df, key_col="key",
    )
    direct = kmv_sample(df, "key", "s", k=64)
    assert sorted(map(tuple, served.collect())) == sorted(map(tuple, direct.collect()))
    with pytest.raises(ValueError, match="key_col"):
        kmv_from_store(spark, path, "s", k=64, batch=df)


def test_sketch_refresh_stream_kmv_parity(spark, tmp_path):
    """Streaming leg: after the stream drains, the last snapshot's
    estimates equal the one-shot estimates over all data."""
    from openetlagent_spark.functions.kmv import kmv_cardinality as kc
    from openetlagent_spark.streaming.events import sketch_refresh_stream

    df = _sets(spark)
    src = str(tmp_path / "src")
    df.write.parquet(src)
    df.write.mode("append").parquet(src)  # second file batch (same rows — idempotent)
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
        kind="kmv", key_col="key", group_cols=["s"], k=64,
    )
    assert q.awaitTermination(120)
    import os

    snaps = sorted(e for e in os.listdir(out) if e.startswith("batch_id="))
    last = sorted(map(tuple, spark.read.parquet(f"{out}/{snaps[-1]}").collect()))
    direct = sorted(map(tuple, kc(
        kmv_sample(spark.read.parquet(src), "key", "s", k=64), "s", k=64
    ).collect()))
    assert last == direct
    with pytest.raises(ValueError, match="exactly one group column"):
        sketch_refresh_stream(
            df, "s", "o", checkpoint="c", kind="kmv", key_col="key",
            group_cols=["a", "b"],
        )
