"""Dataset mixture weighting (functions/curation.py weighted_mixture):
deterministic per-group up/down-sampling with exact replica counts,
stable under repartitioning, reachable from YAML flows, and
hash-identical to the generated DuckDB oracle."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from openetlagent_spark.functions.curation import (
    MIX_BUCKETS,
    _mix_weight_parts,
    mixture_oracle_sql,
    weighted_mixture,
)
from openetlagent_spark.model import SpecError, parse_operation
from openetlagent_spark.runner import apply_operations

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", "source"
    )


def _key(rows):
    return sorted((r.doc_id, r.lang, r.copy) for r in rows)


# --- weight arithmetic ------------------------------------------------------


def test_weight_parts_integer_split():
    assert _mix_weight_parts(0.0) == (0, 0)
    assert _mix_weight_parts(1.0) == (1, 0)
    assert _mix_weight_parts(2.5) == (2, MIX_BUCKETS // 2)
    assert _mix_weight_parts(0.25) == (0, MIX_BUCKETS // 4)
    # near-integer weights round up to the whole copy, never to 10000 bp
    assert _mix_weight_parts(1.99999) == (2, 0)
    with pytest.raises(ValueError):
        _mix_weight_parts(-0.1)


# --- semantics --------------------------------------------------------------


def test_weight_one_is_identity_and_zero_drops(spark):
    docs = _docs(spark)
    out = weighted_mixture(docs, "lang", {"fr": 0.0}, key_col="doc_id")
    counts = dict(out.groupBy("lang").count().collect())
    base = dict(docs.groupBy("lang").count().collect())
    assert "fr" not in counts
    for lang, n in base.items():
        if lang != "fr":
            assert counts[lang] == n  # default weight 1.0 → verbatim
    assert out.filter(F.col("copy") != 1).count() == 0


def test_integer_weight_replicates_exactly(spark):
    docs = _docs(spark)
    out = weighted_mixture(docs, "lang", {"zh": 3.0}, key_col="doc_id")
    zh_base = docs.filter(F.col("lang") == "zh").count()
    zh = out.filter(F.col("lang") == "zh")
    assert zh.count() == 3 * zh_base
    # replicas numbered 1..3 for every key
    per_key = zh.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.sort_array(F.collect_list("copy")).alias("copies")
    )
    assert all(r.n == 3 and r.copies == [1, 2, 3] for r in per_key.collect())


def test_fractional_weight_rate_and_monotone_subset(spark):
    docs = _docs(spark)
    half = weighted_mixture(docs, "lang", {"en": 0.5}, key_col="doc_id")
    en_base = docs.filter(F.col("lang") == "en").count()
    en_half = half.filter(F.col("lang") == "en").count()
    assert 0.3 * en_base < en_half < 0.7 * en_base  # ~basis-point-exact rate
    # the 0.25 subset is CONTAINED in the 0.5 subset (same hash order),
    # and the 1.25 run replicates exactly the 0.25 survivors twice
    quarter = weighted_mixture(docs, "lang", {"en": 0.25}, key_col="doc_id")
    ids_half = {r.doc_id for r in half.filter(F.col("lang") == "en").collect()}
    ids_quarter = {r.doc_id for r in quarter.filter(F.col("lang") == "en").collect()}
    assert ids_quarter <= ids_half
    upq = weighted_mixture(docs, "lang", {"en": 1.25}, key_col="doc_id")
    doubled = {
        r.doc_id
        for r in upq.filter((F.col("lang") == "en") & (F.col("copy") == 2)).collect()
    }
    assert doubled == ids_quarter


def test_null_group_gets_default_weight(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "a"), (3, None)], "id long, grp string"
    )
    out = weighted_mixture(df, "grp", {"a": 0.0}, key_col="id", default_weight=2.0)
    rows = sorted((r.id, r.copy) for r in out.collect())
    assert rows == [(1, 1), (1, 2), (3, 1), (3, 2)]


def test_deterministic_under_repartition(spark):
    docs = _docs(spark)
    w = {"en": 0.5, "zh": 2.5, "fr": 0.0}
    a = _key(weighted_mixture(docs, "lang", w, key_col="doc_id").collect())
    b = _key(
        weighted_mixture(docs.repartition(13), "lang", w, key_col="doc_id").collect()
    )
    assert a == b and len(a) > 0


# --- oracle parity ----------------------------------------------------------


def test_matches_generated_duckdb_oracle(spark):
    w = {"en": 0.5, "zh": 2.5, "fr": 0.0}
    out = weighted_mixture(_docs(spark), "lang", w, key_col="doc_id", seed=7)
    got = sorted(
        (r.doc_id, r.lang, r.source, r.copy) for r in out.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    sql = mixture_oracle_sql(
        "documents", "lang", w, key_col="doc_id", seed=7,
        select_cols=["doc_id", "lang", "source"],
    )
    want = sorted(tuple(t) for t in con.execute(sql).fetchall())
    assert got == want


# --- flow dispatch ----------------------------------------------------------


def test_mixture_from_yaml_flow(spark):
    op = parse_operation(
        {
            "operation_type": "mixture",
            "group_column": "lang",
            "key_column": "doc_id",
            "weights": {"zh": 2.0, "fr": 0.0},
        }
    )
    out = apply_operations(_docs(spark), [op], spark)
    counts = dict(out.groupBy("lang").count().collect())
    base = dict(_docs(spark).groupBy("lang").count().collect())
    assert counts["zh"] == 2 * base["zh"] and "fr" not in counts


def test_mixture_spec_validation():
    with pytest.raises(SpecError):
        parse_operation({"operation_type": "mixture", "group_column": "lang"})
    with pytest.raises(SpecError):
        parse_operation(
            {
                "operation_type": "mixture",
                "group_column": "lang",
                "key_column": "doc_id",
                "weights": {"en": -1.0},
            }
        )
