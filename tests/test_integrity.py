"""Integrity audits (functions/integrity.py): FK orphan detection with
real orphans and NULL keys, k-anonymity boundary behavior, and the
Benford audit's digit extraction / χ² arithmetic on a known
distribution."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from openetlagent_spark.functions.integrity import (
    _BENFORD_EXPECTED,
    benford_audit,
    fk_orphans,
    k_anonymity,
)


@pytest.fixture(scope="module")
def child(spark):
    # keys: 1,1,2 valid; 9,9 orphan (same key twice); one NULL
    return spark.createDataFrame(
        [Row(fk=1), Row(fk=1), Row(fk=2), Row(fk=9), Row(fk=9), Row(fk=None)]
    )


@pytest.fixture(scope="module")
def parent(spark):
    # duplicate + NULL parent keys must not distort the audit
    return spark.createDataFrame([Row(pk=1), Row(pk=1), Row(pk=2), Row(pk=None)])


def test_fk_orphans_counts(child, parent):
    [row] = fk_orphans(
        [{"name": "c->p", "child": child, "child_key": "fk",
          "parent": parent, "parent_key": "pk"}]
    ).collect()
    assert row.relationship == "c->p"
    assert row.child_rows == 6
    assert row.null_keys == 1
    assert row.orphan_rows == 2  # both fk=9 rows
    assert row.orphan_keys == 1  # one distinct violating value


def test_fk_orphans_clean_relationship(child, parent, spark):
    clean = spark.createDataFrame([Row(fk=1), Row(fk=2)])
    [row] = fk_orphans(
        [{"name": "ok", "child": clean, "child_key": "fk",
          "parent": parent, "parent_key": "pk"}]
    ).collect()
    assert (row.orphan_rows, row.orphan_keys, row.null_keys) == (0, 0, 0)


def test_fk_orphans_multiple_relationships_union(child, parent):
    rels = [
        {"name": "a", "child": child, "child_key": "fk",
         "parent": parent, "parent_key": "pk"},
        {"name": "b", "child": child, "child_key": "fk",
         "parent": parent, "parent_key": "pk"},
    ]
    got = {r.relationship for r in fk_orphans(rels).collect()}
    assert got == {"a", "b"}
    with pytest.raises(ValueError):
        fk_orphans([])


def test_k_anonymity_threshold(spark):
    df = spark.createDataFrame(
        [Row(zip="a", age=1)] * 5
        + [Row(zip="b", age=1)] * 2
        + [Row(zip=None, age=2)] * 1
    )
    got = {(r.zip, r.age): r.group_size
           for r in k_anonymity(df, ["zip", "age"], 5).collect()}
    # the 5-row group is NOT a violation (size >= k); NULL forms a group
    assert got == {("b", 1): 2, (None, 2): 1}
    with pytest.raises(ValueError):
        k_anonymity(df, [], 5)
    with pytest.raises(ValueError):
        k_anonymity(df, ["zip"], 0)


def test_benford_digit_extraction_and_chi2(spark):
    # 10 values with first digits 1,1,1,2,3,9; zero/negative/NULL excluded
    df = spark.createDataFrame(
        [Row(v=1), Row(v=15), Row(v=123), Row(v=2), Row(v=37), Row(v=900),
         Row(v=0), Row(v=-5), Row(v=None)]
    )
    got = {r.digit: r for r in benford_audit(df, "v").collect()}
    assert {d: got[d].obs for d in got} == {1: 3, 2: 1, 3: 1, 9: 1}
    n = 6.0
    r1 = got[1]
    assert r1.obs_frac == 3.0 / n
    assert r1.expected_frac == _BENFORD_EXPECTED[1] == math.log10(2.0)
    exp_cnt = n * _BENFORD_EXPECTED[1]
    assert r1.chi2_term == pytest.approx((3.0 - exp_cnt) ** 2 / exp_cnt, rel=1e-12)


def test_benford_expected_fractions_sum_to_one():
    assert sum(_BENFORD_EXPECTED.values()) == pytest.approx(1.0, abs=1e-12)


def test_reconcile_totals_matching_and_mismatched(spark):
    from openetlagent_spark.functions.integrity import reconcile_totals

    parents = spark.createDataFrame(
        [Row(k=1, d=300), Row(k=2, d=999), Row(k=3, d=None), Row(k=4, d=50)],
        "k bigint, d bigint",
    )
    children = spark.createDataFrame(
        [Row(k=1, a=100), Row(k=1, a=200),   # matches 300
         Row(k=2, a=500),                     # mismatch (999 vs 500)
         Row(k=3, a=10),                      # NULL declared -> mismatch
         Row(k=None, a=7)],                   # NULL child key excluded
        "k bigint, a bigint",
    )
    [r] = reconcile_totals(parents, "k", "d", children, "k", "a").collect()
    assert r.n_parents == 4
    assert r.n_with_children == 3     # parent 4 has no lines
    assert r.n_exact_match == 1
    assert r.n_mismatch == 2
    assert r.max_abs_diff == 999 - 500
    assert r.sum_declared == 300 + 999   # NULL declared excluded from sum
    assert r.sum_computed == 300 + 500 + 10
