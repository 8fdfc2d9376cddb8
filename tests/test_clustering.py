"""Unit tests for deterministic quantized k-means: clustering quality on
a corpus with planted cluster structure, determinism under repartition,
and the Lloyd-improvement property."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row

from openetlagent_spark.functions.clustering import kmeans_assign

DIM = 8


def _planted(n_per: int, centers: list[list[float]], spread: float, seed: int):
    rng = random.Random(seed)
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for _ in range(n_per):
            rows.append(
                Row(
                    vec_id=vid,
                    truth=ci,
                    embedding=[c[d] + rng.uniform(-spread, spread) for d in range(DIM)],
                )
            )
            vid += 1
    return rows


@pytest.fixture(scope="module")
def planted(spark):
    centers = [[float(5 * (1 if d == i else 0)) for d in range(DIM)] for i in range(3)]
    return spark.createDataFrame(_planted(30, centers, 0.5, seed=13))


def test_kmeans_recovers_planted_clusters(planted):
    out = kmeans_assign(planted, "vec_id", "embedding", k=3, iters=4).collect()
    truth = {r.vec_id: r.truth for r in planted.select("vec_id", "truth").collect()}
    # every found cluster maps to exactly one planted cluster
    from collections import defaultdict

    members = defaultdict(set)
    for r in out:
        members[r.cluster].add(truth[r.vec_id])
    assert len(members) == 3
    assert all(len(tset) == 1 for tset in members.values())


def test_kmeans_deterministic_under_repartition(planted):
    a = sorted(
        (r.vec_id, r.cluster, r.dist)
        for r in kmeans_assign(planted, "vec_id", "embedding", k=3, iters=2).collect()
    )
    b = sorted(
        (r.vec_id, r.cluster, r.dist)
        for r in kmeans_assign(
            planted.repartition(7), "vec_id", "embedding", k=3, iters=2
        ).collect()
    )
    assert a == b


def test_kmeans_iterations_do_not_worsen_inertia(planted):
    def inertia(iters: int) -> float:
        rows = kmeans_assign(planted, "vec_id", "embedding", k=3, iters=iters).collect()
        return sum(r.dist for r in rows)

    i0, i2 = inertia(0), inertia(2)
    assert i2 <= i0


def test_kmeans_k_exceeds_rows_raises(spark):
    df = spark.createDataFrame([Row(vec_id=1, embedding=[1.0, 2.0])])
    with pytest.raises(ValueError):
        kmeans_assign(df, "vec_id", "embedding", k=4, iters=1)


def test_diversity_sample_quota_and_determinism(planted):
    from openetlagent_spark.functions.clustering import diversity_sample

    out = diversity_sample(planted, "vec_id", "embedding", k=3, iters=2, per_cluster=5)
    rows = out.collect()
    from collections import Counter

    per = Counter(r.cluster for r in rows)
    assert set(per) == {0, 1, 2} and all(v == 5 for v in per.values())
    again = diversity_sample(
        planted.repartition(5), "vec_id", "embedding", k=3, iters=2, per_cluster=5
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


@pytest.mark.parametrize("bad", [-1, -40, 41, 63, 64, 1000])
def test_kmeans_scale_bits_out_of_bounds_rejected(bad):
    # A negative value would otherwise surface later as a cryptic
    # 'negative shift count'; a huge one silently overflows the
    # quantized grid's usable int64 range.
    from openetlagent_spark.model import ClusteringOperation, SpecError

    with pytest.raises(SpecError, match="scale_bits"):
        ClusteringOperation(mode="assign", scale_bits=bad)


@pytest.mark.parametrize("ok", [0, 1, 20, 40])
def test_kmeans_scale_bits_in_bounds_accepted(ok):
    from openetlagent_spark.model import ClusteringOperation

    assert ClusteringOperation(mode="assign", scale_bits=ok).scale_bits == ok
