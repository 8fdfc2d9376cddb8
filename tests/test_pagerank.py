"""Integer PageRank (functions/graph.py pagerank) — hash parity runs
through the domain_rank oracle; these pin semantics on known graphs."""

from __future__ import annotations

import pytest

from openetlagent_spark.functions.graph import pagerank


def _ranks(spark, node_rows, edge_rows, **kw):
    nodes = spark.createDataFrame([(n,) for n in node_rows], "node string")
    edges = spark.createDataFrame(edge_rows, "src string, dst string")
    return {r.node: r for r in pagerank(nodes, edges, **kw).collect()}


def test_pagerank_matches_python_mirror(spark):
    """3 iterations on a small digraph equal the literal integer
    recurrence, value for value."""
    nodes = ["a", "b", "c", "d"]
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]
    got = _ranks(spark, nodes, edges, iters=3)

    S, dn, dd, N = 1 << 40, 17, 20, 4
    out = {"a": 2, "b": 1, "c": 1, "d": 1}
    base = (S * (dd - dn)) // (dd * N)
    r = {n: S // N for n in nodes}
    for _ in range(3):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += r[u] // out[u]
        r = {n: base + (s[n] * dn) // dd for n in nodes}
    for n in nodes:
        assert got[n].rank_int == r[n], n
        assert got[n].rank == r[n] / float(S)
    # c has the most in-links → highest authority
    assert max(nodes, key=lambda n: got[n].rank_int) == "c"


def test_pagerank_isolated_node_keeps_base_only(spark):
    got = _ranks(spark, ["a", "b", "z"], [("a", "b"), ("b", "a")], iters=2)
    S, dn, dd, N = 1 << 40, 17, 20, 3
    base = (S * (dd - dn)) // (dd * N)
    assert got["z"].rank_int == base  # teleport mass only
    assert got["a"].rank_int > got["z"].rank_int


def test_pagerank_partition_order_independent(spark):
    nodes = [f"n{i}" for i in range(30)]
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 30}") for i in range(30) if i != (i * 7 + 3) % 30]
    a = _ranks(spark, nodes, edges, iters=3)
    ndf = spark.createDataFrame([(n,) for n in nodes], "node string").repartition(11)
    edf = spark.createDataFrame(edges, "src string, dst string").repartition(5)
    b = {r.node: r for r in pagerank(ndf, edf, iters=3).collect()}
    assert {n: a[n].rank_int for n in nodes} == {n: b[n].rank_int for n in nodes}


def test_pagerank_validates_inputs(spark):
    nodes = spark.createDataFrame([("a",)], "node string")
    edges = spark.createDataFrame([], "src string, dst string")
    with pytest.raises(ValueError, match="damping"):
        pagerank(nodes, edges, damping=(20, 17))
    empty = spark.createDataFrame([], "node string")
    with pytest.raises(ValueError, match="empty"):
        pagerank(empty, edges)
