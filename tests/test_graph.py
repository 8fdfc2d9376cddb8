"""Connected components + cluster dedup (functions/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from openetlagent_spark.functions.graph import (
    connected_components,
    dedup_by_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_transitive_chain_collapses(spark):
    # A-B, B-C, C-D: one component labeled by the minimum node
    comps = connected_components(_edges(spark, [(1, 2), (2, 3), (3, 4)]))
    got = {r["node"]: r["component"] for r in comps.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_separate_components_stay_separate(spark):
    comps = connected_components(_edges(spark, [(1, 2), (10, 11), (11, 12), (20, 21)]))
    got = {r["node"]: r["component"] for r in comps.collect()}
    assert got == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_deep_chain_converges(spark):
    # a 20-hop path needs many propagation rounds — exercises the
    # fixpoint loop, not just one-shot neighbor mins
    edges = [(i, i + 1) for i in range(100, 120)]
    comps = connected_components(_edges(spark, edges))
    got = {r["node"]: r["component"] for r in comps.collect()}
    assert set(got.values()) == {100}
    assert len(got) == 21


def test_components_partitioning_independent(spark):
    edges = _edges(spark, [(5, 3), (3, 9), (2, 7), (7, 1), (8, 8)])
    a = sorted(connected_components(edges).collect())
    b = sorted(connected_components(edges.repartition(7)).collect())
    assert a == b
    got = {r["node"]: r["component"] for r in a}
    assert got[9] == 3 and got[5] == 3 and got[1] == 1 and got[2] == 1


def test_dedup_by_components_keeps_cluster_minimum(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 8)], "doc_id long, text string"
    )
    # clusters {1,2,3} (via chain) and {5,6}; 4 and 7 untouched
    pairs = _edges(spark, [(1, 2), (2, 3), (5, 6)])
    kept = sorted(
        r["doc_id"] for r in dedup_by_components(df, pairs, "doc_id").collect()
    )
    assert kept == [1, 4, 5, 7]


def test_dedup_by_components_no_pairs_is_identity(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    pairs = _edges(spark, []).filter(F.lit(False))
    kept = sorted(r["doc_id"] for r in dedup_by_components(df, pairs, "doc_id").collect())
    assert kept == [1, 2]


def test_dedup_keep_best_keeps_highest_score(spark):
    from openetlagent_spark.functions.graph import dedup_keep_best

    df = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 50), (4, 7), (5, 20), (6, 20)],
        "doc_id long, quality long",
    )
    # clusters {1,2,3} and {5,6}; 4 untouched
    pairs = _edges(spark, [(1, 2), (2, 3), (5, 6)])
    kept = sorted(
        r["doc_id"]
        for r in dedup_keep_best(df, pairs, "doc_id", "quality").collect()
    )
    # cluster 1: doc 2 wins (score 99); cluster 2: tie 20/20 -> min id 5
    assert kept == [2, 4, 5]


def test_dedup_keep_best_no_pairs_is_identity(spark):
    from openetlagent_spark.functions.graph import dedup_keep_best

    df = spark.createDataFrame([(1, 5), (2, 9)], "doc_id long, quality long")
    pairs = _edges(spark, []).filter(F.lit(False))
    kept = sorted(
        r["doc_id"] for r in dedup_keep_best(df, pairs, "doc_id", "quality").collect()
    )
    assert kept == [1, 2]


def test_dedup_keep_best_flow_mode(spark):
    from openetlagent_spark.model import parse_operation
    from openetlagent_spark.operators import apply_dedup

    txt = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(1, txt, 10), (2, txt + " iota", 99), (3, "unrelated words only here now", 5)],
        "doc_id long, text string, quality long",
    )
    op = parse_operation({
        "operation_type": "dedup", "strategy": "ngram", "mode": "keep_best",
        "id_column": "doc_id", "text_column": "text",
        "threshold": 0.3, "score_column": "quality",
    })
    kept = sorted(r["doc_id"] for r in apply_dedup(df, op).collect())
    # docs 1,2 are near-dups: 2 wins on quality; 3 untouched
    assert kept == [2, 3]
