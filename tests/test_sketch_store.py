"""Persisted mergeable sketch stores (functions/sketch.py
build_hll_store/hll_from_store, functions/cms.py
build_cms_store/cms_from_store): parquet round-trip losslessness,
append-merge == single-pass, cold-start empty stores, and idempotence/
at-most-once merge semantics.  Cross-engine exactness of both store
queries is covered by the oracle harness (scripts/check_oracle.py
hll_store cms_store)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from openetlagent_spark.functions.cms import (
    build_cms_store,
    cms_build,
    cms_estimate,
    cms_from_store,
)
from openetlagent_spark.functions.sketch import (
    build_hll_store,
    hll_distinct,
    hll_from_store,
    hll_registers,
)

HLL_COLD_SCHEMA = "g string, __b__ long, __r__ int"


def _docs(spark, n=400):
    return spark.createDataFrame(
        [Row(i=i, g="even" if i % 2 == 0 else "odd", k=f"user-{i % 97}")
         for i in range(n)]
    )


def test_hll_store_append_merge_equals_single_pass(spark, tmp_path):
    """Registers written batch-by-batch (append) and re-MAXed at read
    time finalize to the IDENTICAL estimate as the one-shot sketch —
    the losslessness claim behind the hll_store oracle row."""
    df = _docs(spark)
    path = str(tmp_path / "hll_store")
    build_hll_store(df.where(F.col("i") % 3 == 0), path, "k", ["g"], p=6)
    build_hll_store(
        df.where(F.col("i") % 3 != 0), path, "k", ["g"], p=6, mode="append"
    )
    from_store = {
        r["g"]: r for r in hll_from_store(spark, path, ["g"], p=6).collect()
    }
    direct = {r["g"]: r for r in hll_distinct(df, "k", ["g"], p=6).collect()}
    assert from_store.keys() == direct.keys()
    for g in direct:
        assert from_store[g]["n_buckets_used"] == direct[g]["n_buckets_used"]
        assert from_store[g]["hll_est"] == direct[g]["hll_est"]  # bit-equal


def test_hll_store_reappend_idempotent(spark, tmp_path):
    """MAX-merge is idempotent: appending the SAME batch twice cannot
    move the estimate (the property that makes HLL stores safe under
    at-least-once ingestion, unlike CMS counters)."""
    df = _docs(spark)
    path = str(tmp_path / "hll_store")
    build_hll_store(df, path, "k", ["g"], p=6)
    build_hll_store(df, path, "k", ["g"], p=6, mode="append")
    from_store = {
        r["g"]: r["hll_est"]
        for r in hll_from_store(spark, path, ["g"], p=6).collect()
    }
    direct = {
        r["g"]: r["hll_est"] for r in hll_distinct(df, "k", ["g"], p=6).collect()
    }
    assert from_store == direct


def test_hll_store_cold_start_and_serve_before_append(spark, tmp_path):
    """A store built from an EMPTY corpus (the valid cold-start of the
    append loop) reads back under the explicit schema, and a new batch
    folds in at serve time without touching the store."""
    df = _docs(spark)
    path = str(tmp_path / "hll_store")
    build_hll_store(df.limit(0), path, "k", ["g"], p=6)
    served = {
        r["g"]: r["hll_est"]
        for r in hll_from_store(
            spark, path, ["g"], p=6, schema=HLL_COLD_SCHEMA,
            batch=df, key_col="k",
        ).collect()
    }
    direct = {
        r["g"]: r["hll_est"] for r in hll_distinct(df, "k", ["g"], p=6).collect()
    }
    assert served == direct


def test_hll_from_store_batch_requires_key(spark, tmp_path):
    import pytest

    path = str(tmp_path / "hll_store")
    build_hll_store(_docs(spark), path, "k", ["g"], p=6)
    with pytest.raises(ValueError, match="key_col"):
        hll_from_store(spark, path, ["g"], p=6, batch=_docs(spark))


def test_cms_store_append_merge_equals_single_pass(spark, tmp_path):
    """Counter tables summed across appended batches equal the one-shot
    build row for row, so point estimates are identical."""
    df = _docs(spark)
    path = str(tmp_path / "cms_store")
    build_cms_store(df.where(F.col("i") % 3 == 0), path, "k", w=64, d=3)
    build_cms_store(
        df.where(F.col("i") % 3 != 0), path, "k", w=64, d=3, mode="append"
    )
    merged = cms_from_store(spark, path, w=64, d=3)
    direct = cms_build(df, "k", w=64, d=3)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    probes = df.select("k").distinct()
    est_m = {r["k"]: r["est_count"]
             for r in cms_estimate(probes, merged, "k", w=64, d=3).collect()}
    est_d = {r["k"]: r["est_count"]
             for r in cms_estimate(probes, direct, "k", w=64, d=3).collect()}
    assert est_m == est_d


def test_cms_store_cold_start_serve_with_batch(spark, tmp_path):
    df = _docs(spark)
    path = str(tmp_path / "cms_store")
    build_cms_store(df.limit(0), path, "k", w=64, d=3)
    served = cms_from_store(spark, path, batch=df, key_col="k", w=64, d=3)
    direct = cms_build(df, "k", w=64, d=3)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_cms_store_double_append_double_counts(spark, tmp_path):
    """SUM-merge is NOT idempotent — re-appending a batch doubles its
    counts.  Pinning the failure mode documents the store's
    exactly-once append contract (build_cms_store docstring)."""
    df = _docs(spark)
    path = str(tmp_path / "cms_store")
    build_cms_store(df, path, "k", w=64, d=3)
    build_cms_store(df, path, "k", w=64, d=3, mode="append")
    doubled = cms_from_store(spark, path, w=64, d=3)
    probes = df.select("k").distinct().limit(5)
    direct = cms_build(df, "k", w=64, d=3)
    est_2x = {r["k"]: r["est_count"]
              for r in cms_estimate(probes, doubled, "k", w=64, d=3).collect()}
    est_1x = {r["k"]: r["est_count"]
              for r in cms_estimate(probes, direct, "k", w=64, d=3).collect()}
    assert est_2x == {k: 2 * v for k, v in est_1x.items()}


def test_sketch_refresh_stream_hll_parity(spark, tmp_path):
    """Streaming per-batch refresh (streaming/events.py
    sketch_refresh_stream): after the stream drains, the LAST snapshot
    must equal the one-shot batch sketch over all data — cross-batch
    parity — and every generation lands under gen=<batch_id> so a
    replayed batch overwrites instead of double-appending."""
    import os

    from openetlagent_spark.functions.sketch import hll_distinct
    from openetlagent_spark.streaming.events import sketch_refresh_stream

    df = _docs(spark)
    src = str(tmp_path / "src")
    df.where("i < 200").write.parquet(src)
    df.where("i >= 200").write.mode("append").parquet(src)
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
        kind="hll", key_col="k", group_cols=["g"], p=6,
    )
    assert q.awaitTermination(120)
    gens = sorted(e for e in os.listdir(store) if e.startswith("gen="))
    snaps = sorted(e for e in os.listdir(out) if e.startswith("batch_id="))
    assert len(gens) >= 2 and len(snaps) == len(gens)
    last = {
        r["g"]: (r["n_buckets_used"], r["hll_est"])
        for r in spark.read.parquet(f"{out}/{snaps[-1]}").collect()
    }
    direct = {
        r["g"]: (r["n_buckets_used"], r["hll_est"])
        for r in hll_distinct(spark.read.parquet(src), "k", ["g"], p=6).collect()
    }
    assert last == direct


def test_sketch_refresh_stream_cms_parity_and_replay(spark, tmp_path):
    """CMS leg: final merged counters equal the single-pass build, and
    RE-RUNNING a generation (the replay case the gen= layout exists
    for) leaves the serving read unchanged — the exactly-once property
    blind append could not give a SUM-merged store."""
    from openetlagent_spark.functions.cms import (
        build_cms_store,
        cms_build,
        cms_estimate,
        cms_from_store,
    )
    from openetlagent_spark.streaming.events import sketch_refresh_stream

    df = _docs(spark)
    src = str(tmp_path / "src")
    # one FILE per half so file==micro-batch (maxFilesPerTrigger=1) and
    # the batch-0 content is known exactly for the replay below; the
    # sleep keeps the two modification times ordered for the source's
    # file discovery
    import time

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
        kind="cms", key_col="k", w=64, d=3,
    )
    assert q.awaitTermination(120)
    merged = cms_from_store(spark, store, w=64, d=3)
    direct = cms_build(spark.read.parquet(src), "k", w=64, d=3)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
    # replay batch 0: overwrite its generation with the same content
    build_cms_store(
        spark.read.parquet(src).where("i < 200"), f"{store}/gen=0", "k", w=64, d=3
    )
    replayed = cms_from_store(spark, store, w=64, d=3)
    assert sorted(map(tuple, replayed.collect())) == sorted(
        map(tuple, direct.collect())
    )
    probes = df.select("k").distinct().limit(5)
    est_r = {r["k"]: r["est_count"]
             for r in cms_estimate(probes, replayed, "k", w=64, d=3).collect()}
    est_d = {r["k"]: r["est_count"]
             for r in cms_estimate(probes, direct, "k", w=64, d=3).collect()}
    assert est_r == est_d


def test_sketch_refresh_stream_validation(spark):
    from openetlagent_spark.streaming.events import sketch_refresh_stream

    df = _docs(spark)
    with pytest.raises(ValueError, match="kind must be"):
        sketch_refresh_stream(df, "s", "o", checkpoint="c", kind="zzz", key_col="k")
    with pytest.raises(ValueError, match="needs group_cols"):
        sketch_refresh_stream(df, "s", "o", checkpoint="c", kind="hll", key_col="k")


def test_sketch_refresh_stream_qsketch_parity(spark, tmp_path):
    """Quantile leg: after the stream drains, the last snapshot's
    estimates equal the one-shot quantile_sketch over all data (the
    KMV merge property, served per micro-batch)."""
    from pyspark.sql import functions as F

    from openetlagent_spark.functions.quantile import quantile_sketch
    from openetlagent_spark.streaming.events import sketch_refresh_stream

    df = _docs(spark).withColumn("v", (F.col("i") * 37 % 400).cast("double"))
    src = str(tmp_path / "src")
    df.where("i < 200").write.parquet(src)
    df.where("i >= 200").write.mode("append").parquet(src)
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
        kind="qsketch", key_col="i", value_col="v", group_cols=["g"],
        k=32, qs=[0.5, 0.9],
    )
    assert q.awaitTermination(120)
    import os

    snaps = sorted(e for e in os.listdir(out) if e.startswith("batch_id="))
    last = {
        (r["g"], r["q"]): r["est"]
        for r in spark.read.parquet(f"{out}/{snaps[-1]}").collect()
    }
    direct = {
        (r["g"], r["q"]): r["est"]
        for r in quantile_sketch(
            spark.read.parquet(src), "v", "i", ["g"], [0.5, 0.9], k=32
        ).collect()
    }
    assert last == direct


def test_sketch_refresh_stream_qsketch_validation(spark):
    from openetlagent_spark.streaming.events import sketch_refresh_stream

    df = _docs(spark)
    with pytest.raises(ValueError, match="needs value_col"):
        sketch_refresh_stream(
            df, "s", "o", checkpoint="c", kind="qsketch", key_col="i",
            group_cols=["g"],
        )
